package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types._

/** Physical as-of join: per-partition streaming two-pointer merge over
  * children that EnsureRequirements has hash-co-partitioned on the key and
  * sorted by (key, time) — the same child contracts as SortMergeJoinExec,
  * reused wholesale so exchange reuse / AQE coalescing apply unchanged.
  *
  * Backward (default): latest right row with equal key and time <= probe
  * time. Forward: earliest right row with equal key and time >= probe time
  * (matched via the buffered head without consuming it, since the same
  * quote can serve several later probes). Nearest: the closer of the
  * backward candidate and the forward head, backward winning ties —
  * merge_asof's third direction, measured in the time column's native
  * units. An optional tolerance (micros for timestamps, raw units for
  * integral times) nulls out matches beyond the bound at emit time —
  * candidates are retained, because a nearer probe may still be within
  * bound.
  *
  * Per partition the merge keeps at most one buffered candidate row, so
  * memory is O(1) regardless of group size — the pathological
  * many-quotes-per-key corpus that would blow up a windowed composition
  * streams straight through. Interpreted eval (no codegen): row movement
  * dominates here and the operator sits behind two exchanges, so codegen
  * fusion has nothing upstream to fuse with; a doProduce implementation is
  * mechanical if ever profiled as hot.
  */
case class AsofJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    direction: String, toleranceMicros: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // one output row per left row, in the left child's (key, time) order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  /** Single-column time row -> long, for tolerance arithmetic. */
  private def timeToLong(dt: DataType): InternalRow => Long = dt match {
    case TimestampType | TimestampNTZType | LongType => _.getLong(0)
    case IntegerType | DateType => _.getInt(0).toLong
    case ShortType => _.getShort(0).toLong
    case ByteType => _.getByte(0).toLong
    case other => throw new IllegalArgumentException(
      s"asof tolerance requires a timestamp/integral time column, got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val (lks, rks, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val (dir, tol) = (direction, toleranceMicros)
    // tolerance and nearest both measure distances in the time's long form
    if (tol.isDefined || dir == "nearest") timeToLong(lt.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lks.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val asLong = timeToLong(lt.dataType)
      val lKeyProj = UnsafeProjection.create(lks, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rKeyProj = UnsafeProjection.create(rks, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // backward state: latest right row consumed with a matching time, and
      // its key/time — copies, because iterators and projections reuse buffers
      var candidate: InternalRow = null
      var candKey: InternalRow = null
      var candTime: Long = 0L

      val fwd = dir == "forward"
      val nearest = dir == "nearest"

      def withinTol(probeT: InternalRow, matchT: InternalRow): Boolean =
        tol.forall { t =>
          val d = if (fwd) asLong(matchT) - asLong(probeT)
                  else asLong(probeT) - asLong(matchT)
          d <= t
        }

      lIter.map { l =>
        val probeKey = lKeyProj(l)
        val probeTime = lTimeProj(l)
        var matched: InternalRow = null
        if (!probeKey.anyNull && !probeTime.isNullAt(0)) {
          var scan = true
          while (scan && rBuf.hasNext) {
            val rKeyRow = rKeyProj(rBuf.head)
            // any-null key never equals anything (SQL equality), so the row
            // is dead for every probe — consuming it out of order is safe
            val cmp = if (rKeyRow.anyNull) -1 else keyOrd.compare(rKeyRow, probeKey)
            if (cmp < 0) {
              rBuf.next() // smaller (or null) key: consume, never a candidate
            } else if (cmp == 0) {
              val rTimeRow = rTimeProj(rBuf.head)
              if (rTimeRow.isNullAt(0)) {
                rBuf.next() // null time sorts first and never matches
              } else if (!fwd) {
                // backward/nearest: consume everything at-or-before the
                // probe, remembering the latest as the candidate
                if (timeOrd.compare(rTimeRow, probeTime) <= 0) {
                  candKey = rKeyRow.copy()
                  candTime = asLong(rTimeRow)
                  candidate = rBuf.next().copy()
                } else scan = false // beyond the probe: later probes may want it
              } else {
                // forward: drop quotes strictly before the probe (useless for
                // this and every later probe of this key), then match the
                // head WITHOUT consuming — it may serve later probes too
                if (timeOrd.compare(rTimeRow, probeTime) < 0) rBuf.next()
                else {
                  if (withinTol(probeTime, rTimeRow)) matched = rBuf.head
                  scan = false
                }
              }
            } else scan = false // key ahead of the probe
          }
          if (!fwd) {
            val bwdOk = candidate != null && keyOrd.compare(candKey, probeKey) == 0
            if (!nearest) {
              if (bwdOk && tol.forall(t => asLong(probeTime) - candTime <= t))
                matched = candidate
            } else {
              // nearest: the un-consumed head is the earliest same-key quote
              // after the probe; pick the closer side, backward on ties
              val pT = asLong(probeTime)
              var fwdRow: InternalRow = null
              var fwdDist = Long.MaxValue
              if (rBuf.hasNext) {
                val hk = rKeyProj(rBuf.head)
                if (!hk.anyNull && keyOrd.compare(hk, probeKey) == 0) {
                  val ht = rTimeProj(rBuf.head)
                  if (!ht.isNullAt(0)) { fwdRow = rBuf.head; fwdDist = asLong(ht) - pT }
                }
              }
              val bwdDist = if (bwdOk) pT - candTime else Long.MaxValue
              val (row, dist) =
                if (bwdDist <= fwdDist) (candidate, bwdDist) else (fwdRow, fwdDist)
              if (row != null && dist != Long.MaxValue && tol.forall(dist <= _))
                matched = row
            }
          }
        }
        numOutputRows += 1
        if (matched != null) joined(l, matched) else joined(l, nullRight)
      }
    }
  }
}
