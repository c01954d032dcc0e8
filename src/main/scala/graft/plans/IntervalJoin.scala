package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Native keyless point-in-interval join (inner): for each probe ("point")
  * row, every interval row with start ≤ point < end (inclusivity
  * configurable per bound). The whole-operator Catalyst path for the
  * reference's interval join (bodo/libs/_interval_join.cpp:30 — point vs
  * interval-start/end predicates without an equi key).
  *
  * Without an equi key Spark plans a range predicate as
  * BroadcastNestedLoopJoin: every probe row is tested against every
  * interval — O(n·m) comparisons. This operator broadcasts the interval
  * side once, sorts it by start with a prefix-running-max over the ends,
  * and answers each probe in O(log m + matches + overlap-depth): binary
  * search for the last start ≤ point, then walk left only while the
  * running max end can still reach the point. The probe side streams
  * unshuffled — at 100 TB the corpus is touched once with no exchange,
  * which is the same asymmetty (tiny interval dimension vs huge fact
  * stream) the reference's design exploits.
  *
  * When the interval side is itself huge, this operator is the wrong
  * shape by construction (it requires a broadcastable build side, like
  * any broadcast join) — the bin-equi rewrite (`join_interval_binned`)
  * is the shuffle-based fallback.
  */
case class IntervalJoin(
    left: LogicalPlan, right: LogicalPlan,
    point: Attribute, start: Attribute, end: Attribute,
    startInclusive: Boolean = true,
    endInclusive: Boolean = false,
    /** When set, the probe side is itself an interval [point, pointEnd]
      * and the join matches on OVERLAP (ref _interval_join.cpp's
      * interval-vs-interval case): start ≤ pointEnd && end ≥ point, with
      * the same per-bound strictness flags. None = point probe. */
    pointEnd: Option[Attribute] = None,
    /** LEFT OUTER: probes with no containing interval emit once with a
      * null interval side (the reference restricts this operator to
      * inner/left — _interval_join.cpp:252 "should only support Inner or
      * Left Joins"; right/full would need build-side match tracking
      * across all probe partitions, a global barrier). */
    leftOuter: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical IntervalJoin to its broadcast physical operator. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, p, s, e, si, ei, pe, lo) =>
      IntervalJoinExec(p, pe, s, e, si, ei, lo, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** User-facing builder: `Interval.join(points, intervals, "pt", "t0", "t1")`.
  * Column names must be disjoint across the two sides; the time columns
  * must share an orderable integral/timestamp/date type. */
object Interval {
  def join(points: DataFrame, intervals: DataFrame,
           point: String, start: String, end: String,
           startInclusive: Boolean = true,
           endInclusive: Boolean = false,
           joinType: String = "inner"): DataFrame = {
    val leftOuter = joinType match {
      case "inner" => false
      case "left" | "left_outer" => true
      case other => throw new IllegalArgumentException(
        s"interval join supports inner|left, got $other (reference parity: " +
          "_interval_join.cpp inner/left only)")
    }
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"interval join requires disjoint column names; alias these on one side: ${overlap.mkString(", ")}")
    val lp = points.queryExecution.analyzed
    val rp = intervals.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found among ${p.output.map(_.name).mkString(", ")}"))
    GraftSqlShim.ofRows(points.sparkSession,
      IntervalJoin(lp, rp, attr(lp, point), attr(rp, start), attr(rp, end),
        startInclusive, endInclusive, leftOuter = leftOuter))
  }

  /** Interval-overlap join: every (probe, interval) pair whose ranges
    * intersect — [pStart, pEnd] vs [start, end]. Bound strictness follows
    * the point form: startInclusive governs `start vs pEnd`, endInclusive
    * governs `end vs pStart`. */
  def joinOverlap(probes: DataFrame, intervals: DataFrame,
                  pStart: String, pEnd: String, start: String, end: String,
                  startInclusive: Boolean = true,
                  endInclusive: Boolean = true): DataFrame = {
    val overlap = probes.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"interval join requires disjoint column names; alias these on one side: ${overlap.mkString(", ")}")
    val lp = probes.queryExecution.analyzed
    val rp = intervals.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found among ${p.output.map(_.name).mkString(", ")}"))
    GraftSqlShim.ofRows(probes.sparkSession,
      IntervalJoin(lp, rp, attr(lp, pStart), attr(rp, start), attr(rp, end),
        startInclusive, endInclusive, Some(attr(lp, pEnd))))
  }
}
