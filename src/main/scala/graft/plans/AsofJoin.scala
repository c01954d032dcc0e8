package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator Catalyst path (SURVEY §7.3's one
  * "custom `SparkStrategy`" item): a logical node, a planner strategy, and
  * a physical sorted-merge operator, registered through
  * `GraftExtensions.injectPlannerStrategy`.
  *
  * Semantics match the reference's `pd.merge_asof` backward direction
  * (bodo/ir/join.py:154,183): for each left ("probe") row, the single
  * right ("quote") row with equal key and the greatest time <= the probe
  * time; probes with no such quote keep the left row with nulls (LEFT
  * semantics). SQL equality on the key — null keys/times never match.
  *
  * Scale shape (why a physical operator instead of the tag-union window
  * composition in AsofQueries): exactly one hash shuffle per side on the
  * key, an in-partition sort by (key, time), then a streaming two-pointer
  * merge that is O(left + right) time and O(1) memory per partition — no
  * union row inflation, no window-function state, and the right side's
  * columns never travel through a window buffer. At 100 TB both children
  * are plain exchanges AQE can coalesce or skew-split like any join.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    direction: String = "backward", // backward | forward | nearest
    toleranceMicros: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsofJoin to its physical operator. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lks, rks, lt, rt, dir, tol) =>
      AsofJoinExec(lks, rks, lt, rt, dir, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** User-facing builder: `Asof.join(probes, quotes, "user_id", "q_user",
  * "p_ts", "q_ts")` — or with by-group key LISTS, merge_asof's `by=`
  * (`Asof.joinBy(probes, quotes, Seq("user_id", "region"), Seq("q_user",
  * "q_region"), "p_ts", "q_ts")`). Column names must be disjoint across
  * the two sides (alias the quote side) — the join's output is simply
  * left ++ right.
  *
  * `direction` is "backward" (default: latest quote at-or-before the
  * probe), "forward" (earliest quote at-or-after), or "nearest" (the
  * closer of the two, backward winning ties) — all three directions of
  * the reference's merge_asof. `tolerance` (in the time column's native
  * sub-unit: microseconds for timestamps, raw units for integral times)
  * nulls out matches farther than the bound, exactly pandas'
  * tolerance= semantics; it (and "nearest", which measures distances)
  * requires a timestamp/integral time column. */
object Asof {
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame =
    joinBy(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      direction, tolerance)

  def joinBy(left: DataFrame, right: DataFrame,
             leftKeys: Seq[String], rightKeys: Seq[String],
             leftTime: String, rightTime: String,
             direction: String = "backward",
             tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"asof join needs matching non-empty key lists, got $leftKeys vs $rightKeys")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"asof join requires disjoint column names; alias these on one side: ${overlap.mkString(", ")}")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found among ${p.output.map(_.name).mkString(", ")}"))
    GraftSqlShim.ofRows(left.sparkSession,
      AsofJoin(lp, rp, leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
        attr(lp, leftTime), attr(rp, rightTime), direction, tolerance))
  }
}
