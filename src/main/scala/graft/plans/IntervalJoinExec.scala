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
  * plan-visible, AQE/reuse friendly), is sorted by interval start once per
  * partition, and each probe row binary-searches the starts and walks left
  * bounded by a prefix running max of the ends. See IntervalJoin for the
  * cost argument. With `pointEnd` set the probe is an interval and the
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
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

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
      val raw = broadcastRelation.value
      val kept = raw.filter { r => !sProj(r).isNullAt(0) && !eProj(r).isNullAt(0) }
      val starts = kept.map(r => asLongS(sProj(r)))
      val order = starts.indices.sortBy(starts)(Ordering.Long).toArray
      val m = order.length
      val sortedStart = new Array[Long](m)
      val sortedEnd = new Array[Long](m)
      val sortedRow = new Array[InternalRow](m)
      val maxEnd = new Array[Long](m)
      var i = 0
      while (i < m) {
        val j = order(i)
        sortedStart(i) = starts(j)
        sortedEnd(i) = asLongE(eProj(kept(j)))
        sortedRow(i) = kept(j)
        maxEnd(i) = if (i == 0) sortedEnd(0) else math.max(maxEnd(i - 1), sortedEnd(i))
        i += 1
      }
      val joined = new JoinedRow
      probeIter.flatMap { l =>
        val pRow = pProj(l)
        val peRow = peProj(l)
        if (pRow.isNullAt(0) || peRow.isNullAt(0) || m == 0) Iterator.empty
        else {
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
          new Iterator[InternalRow] {
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
        }
      }
    }
  }
}
