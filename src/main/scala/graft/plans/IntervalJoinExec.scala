package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types._

/** Physical point-in-interval / interval-overlap join: the interval side
  * arrives through a real BroadcastExchange (IdentityBroadcastMode —
  * plan-visible, AQE/reuse friendly), is sorted by interval start ONCE PER
  * EXECUTOR (a weak-keyed cache on the broadcast value — at 10k partitions
  * the O(m log m) build sort runs once per executor, not 10k times), and
  * each probe row binary-searches the starts and walks left bounded by a
  * prefix running max of the ends. See IntervalJoin for the cost argument. With `pointEnd` set the probe is an interval and the
  * predicate is overlap: the binary search bounds on `start vs pointEnd`,
  * the walk and emit test on `end vs point` — the identical index answers
  * both shapes because overlap is just a point probe with two different
  * endpoints on the two bound comparisons.
  *
  * Null semantics: a null probe bound never matches; intervals with a
  * null bound are dropped from the build (SQL comparison semantics — a
  * null bound can never satisfy the range predicate).
  */
case class IntervalJoinExec(
    point: Attribute, pointEnd: Option[Attribute],
    start: Attribute, end: Attribute,
    startInclusive: Boolean, endInclusive: Boolean,
    leftOuter: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // one-to-many expansion of the streamed side; its partitioning survives
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  /** Single-column time row -> long (shared orderable representation). */
  private def timeToLong(dt: DataType): InternalRow => Long = dt match {
    case TimestampType | TimestampNTZType | LongType => _.getLong(0)
    case IntegerType | DateType => _.getInt(0).toLong
    case ShortType => _.getShort(0).toLong
    case ByteType => _.getByte(0).toLong
    case other => throw new IllegalArgumentException(
      s"interval join requires integral/timestamp/date bounds, got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val (pAttr, peAttr, sAttr, eAttr) = (point, pointEnd, start, end)
    val (sInc, eInc) = (startInclusive, endInclusive)
    timeToLong(pAttr.dataType) // fail fast on unsupported types
    val broadcastRelation = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { probeIter =>
      val asLongP = timeToLong(pAttr.dataType)
      val asLongS = timeToLong(sAttr.dataType)
      val asLongE = timeToLong(eAttr.dataType)
      val pProj = UnsafeProjection.create(Seq(pAttr), lOut)
      // overlap probes project their end bound; point probes reuse the start
      val peProj = UnsafeProjection.create(Seq(peAttr.getOrElse(pAttr)), lOut)
      val sProj = UnsafeProjection.create(Seq(sAttr), rOut)
      val eProj = UnsafeProjection.create(Seq(eAttr), rOut)
      // build: drop null-bounded intervals, sort by start, prefix-max ends
      // — computed once per executor via the broadcast-keyed cache, reused
      // by every partition probing the same broadcast value.
      val raw = broadcastRelation.value
      val bIdx = IntervalJoinExec.buildIndex(raw, (sAttr.exprId.id, eAttr.exprId.id)) {
        val kept = raw.filter { r => !sProj(r).isNullAt(0) && !eProj(r).isNullAt(0) }
        val starts = kept.map(r => asLongS(sProj(r)))
        val order = starts.indices.sortBy(starts)(Ordering.Long).toArray
        val m = order.length
        val b = IntervalJoinExec.BuildIndex(new Array[Long](m),
          new Array[Long](m), new Array[InternalRow](m), new Array[Long](m))
        var i = 0
        while (i < m) {
          val j = order(i)
          b.sortedStart(i) = starts(j)
          b.sortedEnd(i) = asLongE(eProj(kept(j)))
          b.sortedRow(i) = kept(j)
          b.maxEnd(i) = if (i == 0) b.sortedEnd(0) else math.max(b.maxEnd(i - 1), b.sortedEnd(i))
          i += 1
        }
        b
      }
      val sortedStart = bIdx.sortedStart
      val sortedEnd = bIdx.sortedEnd
      val sortedRow = bIdx.sortedRow
      val maxEnd = bIdx.maxEnd
      val m = sortedStart.length
      val joined = new JoinedRow
      // left-outer: unmatched probes emit once against an all-null build row
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rOut.size)
      val emitUnmatched = leftOuter
      probeIter.flatMap { l =>
        val pRow = pProj(l)
        val peRow = peProj(l)
        if (pRow.isNullAt(0) || peRow.isNullAt(0) || m == 0) {
          if (emitUnmatched) { numOutputRows += 1; Iterator.single[InternalRow](joined(l, nullRight)) }
          else Iterator.empty
        } else {
          // point probe: p == pe; overlap probe: [p, pe] vs [start, end]
          val p = asLongP(pRow)
          val pe = asLongP(peRow)
          // rightmost index whose start can match the probe's upper bound
          var lo = 0; var hi = m - 1; var last = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val ok = if (sInc) sortedStart(mid) <= pe else sortedStart(mid) < pe
            if (ok) { last = mid; lo = mid + 1 } else hi = mid - 1
          }
          val matches: Iterator[InternalRow] = new Iterator[InternalRow] {
            private var idx = last
            private var ready = false
            private def endOk(e: Long): Boolean = if (eInc) e >= p else e > p
            private def advance(): Unit = {
              while (!ready && idx >= 0 && endOk(maxEnd(idx))) {
                if (endOk(sortedEnd(idx))) ready = true else idx -= 1
              }
            }
            override def hasNext: Boolean = { advance(); ready }
            override def next(): InternalRow = {
              advance()
              val r = joined(l, sortedRow(idx))
              ready = false; idx -= 1
              numOutputRows += 1
              r
            }
          }
          if (emitUnmatched && !matches.hasNext) {
            numOutputRows += 1
            Iterator.single[InternalRow](joined(l, nullRight))
          } else matches
        }
      }
    }
  }
}

object IntervalJoinExec {
  /** Start-sorted build arrays + prefix-max ends — the per-broadcast probe
    * index. */
  final case class BuildIndex(sortedStart: Array[Long], sortedEnd: Array[Long],
                              sortedRow: Array[InternalRow], maxEnd: Array[Long])

  /** Per-executor (per-JVM) index cache, weak-keyed on the broadcast VALUE:
    * when the broadcast is destroyed/unpersisted the value array becomes
    * unreachable and the entry self-clears — no lifecycle hooks needed.
    * Sub-keyed by the (start, end) expression ids, because a reused
    * broadcast exchange can feed two interval joins with different bound
    * columns. The global monitor covers only the cheap per-key map lookup
    * (WeakHashMap is not thread-safe); the O(m log m) build runs under a
    * per-(broadcast, bounds) holder lock, so concurrent tasks of UNRELATED
    * interval joins in the same JVM never serialize behind one build —
    * only same-index tasks wait, which is the intended dedup. */
  private final class Holder { var built: BuildIndex = _ }
  private val indexCache = new java.util.WeakHashMap[
    AnyRef, java.util.concurrent.ConcurrentHashMap[(Long, Long), Holder]]()

  private[plans] def buildIndex(key: AnyRef, sub: (Long, Long))(
      build: => BuildIndex): BuildIndex = {
    val perKey = indexCache.synchronized {
      var m = indexCache.get(key)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(Long, Long), Holder]()
        indexCache.put(key, m)
      }
      m
    }
    val holder = perKey.computeIfAbsent(sub, _ => new Holder)
    holder.synchronized {
      if (holder.built == null) holder.built = build
      holder.built
    }
  }
}
