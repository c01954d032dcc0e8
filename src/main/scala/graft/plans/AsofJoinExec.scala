package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical backward as-of join: per-partition streaming two-pointer merge
  * over children that EnsureRequirements has hash-co-partitioned on the
  * key and sorted by (key, time) — the same child contracts as
  * SortMergeJoinExec, reused wholesale so exchange reuse / AQE coalescing
  * apply unchanged.
  *
  * Per partition the merge keeps exactly one buffered candidate row (the
  * latest right row at-or-before the current probe, same key), so memory
  * is O(1) regardless of group size — the pathological many-quotes-per-key
  * corpus that would blow up a windowed composition streams straight
  * through. Interpreted eval (no codegen): row movement dominates here and
  * the operator sits behind two exchanges, so codegen fusion has nothing
  * upstream to fuse with; a doProduce implementation is mechanical if ever
  * profiled as hot.
  */
case class AsofJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // one output row per left row, in the left child's (key, time) order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // latest right row consumed with a matching time, and its key —
      // copies, because child iterators and projections reuse buffers
      var candidate: InternalRow = null
      var candKey: InternalRow = null

      lIter.map { l =>
        val probeKey = lKeyProj(l)
        val probeTime = lTimeProj(l)
        if (!probeKey.isNullAt(0) && !probeTime.isNullAt(0)) {
          // advance the quote side through everything at-or-before the probe
          var scan = true
          while (scan && rBuf.hasNext) {
            val rKeyRow = rKeyProj(rBuf.head)
            val cmp = if (rKeyRow.isNullAt(0)) -1 else keyOrd.compare(rKeyRow, probeKey)
            if (cmp < 0) {
              rBuf.next() // smaller (or null) key: consume, never a candidate
            } else if (cmp == 0) {
              val rTimeRow = rTimeProj(rBuf.head)
              if (rTimeRow.isNullAt(0)) {
                rBuf.next() // null time sorts first and never matches
              } else if (timeOrd.compare(rTimeRow, probeTime) <= 0) {
                candKey = rKeyRow.copy()
                candidate = rBuf.next().copy()
              } else scan = false // beyond the probe: later probes may want it
            } else scan = false // key ahead of the probe
          }
        }
        numOutputRows += 1
        if (candidate != null && !probeKey.isNullAt(0) && !probeTime.isNullAt(0) &&
            keyOrd.compare(candKey, probeKey) == 0)
          joined(l, candidate)
        else
          joined(l, nullRight)
      }
    }
  }
}
