package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, Divide, EqualTo, Expression, If, Literal, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.operators.IncrementalMv

/** TRANSPARENT MATERIALIZED-VIEW REWRITE — the optimizer half of the
  * incremental-MV story (the maintenance half is
  * [[graft.operators.IncrementalMv]]): a query that re-states a
  * registered MV's defining aggregate over the base snapshot table is
  * rewritten to read the (tiny, incrementally-maintained) MV table
  * instead of re-aggregating the base — the BigQuery/Hive/Snowflake
  * "automatic query rewrite" surface, done the Catalyst-idiomatic way
  * as an injected `Rule[LogicalPlan]`.
  *
  * Served shapes, for GROUP BY exactly the MV's group columns and any
  * combination of its measure columns: `count(*)` (→ n), `sum(c)`
  * (→ IF(nv_c = 0, NULL, s_c) — SQL's ignore-nulls sum, reconstructed
  * from the maintained non-null count), `count(c)` (→ nv_c), and
  * `avg(c)` (→ s_c / nv_c, null when nv_c = 0). For integral c the MV's
  * sums are exact longs, so avg is bit-honest; for floating c both the
  * direct and the maintained sum are association-dependent anyway.
  *
  * A Filter between the aggregate and the scan is ALSO served when its
  * predicate references only GROUP columns: filtering group values
  * before or after aggregation is the same relation (each group's rows
  * all share the group value), and the MV carries the group columns
  * exactly — so `WHERE region = 'x' GROUP BY region` becomes the same
  * Filter over the MV scan (the first thing every real dashboard adds).
  * A predicate touching any NON-group column disqualifies the rewrite,
  * as it must: the MV has already aggregated those rows away.
  *
  * ROLLUP SERVING (r18): a query grouping by a PROPER SUBSET of the MV's
  * key set (including the empty set — a global aggregate) is served by
  * RE-AGGREGATING the MV, the textbook rollup property of count/sum
  * algebra: `count(*)` → `sum(n)`, `count(c)` → `sum(nv_c)`, `sum(c)` →
  * `sum(s_c)` masked NULL when `sum(nv_c) = 0`, `avg(c)` →
  * `sum(s_c) / sum(nv_c)` (the only composition of averages that is
  * correct under unequal group sizes). The re-aggregation runs over MV
  * rows — one per fine-grained group — instead of base rows, so a
  * 100-TB base answers its coarser dashboards from the same kilobytes.
  * Filter admissibility widens accordingly: a predicate may reference
  * ANY MV group column (queried or not), since filtering rows of a group
  * column commutes with grouping; it is applied to the MV rows below the
  * re-aggregation. The rollup path additionally serves
  * `count(DISTINCT g)` for an UNQUERIED MV group column g: the MV's rows
  * enumerate the live full-key groups exactly, so a distinct count of g
  * over MV ROWS equals the one over base rows — a COUNT DISTINCT
  * answered from kilobytes. Decimal measures are refused on the rollup
  * path (a re-sum widens the decimal type away from the query's) —
  * refusal, not wrongness.
  *
  * Correctness gate: the rewrite fires ONLY when the base relation's
  * pinned snapshot version equals the MV's durable applied-version
  * watermark (`mv.applied-base-version`). The DSv2 relation's table
  * name carries its pin (`snapshotlog:<root>@v<N>`), so freshness is an
  * exact version comparison — no races with concurrent writers (a base
  * commit after the read resolved its snapshot is invisible to that
  * read ANYWAY, by snapshot isolation), and a stale MV simply leaves
  * the plan untouched. Time-traveled reads only rewrite if their pinned
  * version happens to equal the watermark — same rule, for free.
  *
  * REFRESH-THEN-SERVE (opt-in): when the MV table carries
  * `mv.auto-refresh-on-stale=true` and the read is AHEAD of the
  * watermark by at most `mv.auto-refresh-max-versions` (default 16),
  * the rule runs one incremental maintain() and serves the refreshed
  * MV — a dashboard never reads a stale-but-refreshable MV. The budget
  * bounds optimizer-time work; past it the plan is left untouched. A
  * thread-local guard makes the maintenance's own inner queries ignore
  * the rule (no recursion), and the exact version-watermark check is
  * re-proved AFTER the refresh — a concurrent base commit can make the
  * refresh overshoot the pin, in which case we still refuse to serve.
  *
  * At 100 TB: the maintained MV answers the dashboard aggregate from
  * kilobytes; without the rewrite every consumer re-scans the base.
  * Disable with spark.graft.mv.autoRewrite=false (registration is
  * already per-MV opt-in). */
object MvRewriteRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.mv.autoRewrite", "true") == "true"
    catch { case scala.util.control.NonFatal(_) => true }

  /** True while THIS thread is inside an auto-refresh maintain() — the
    * maintenance's own changelog/MERGE queries must not re-enter. */
  private val refreshing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || refreshing.get()) return plan
    plan.transformUp {
      case agg @ Aggregate(groups, aggExprs, child, _)
          if groups.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(groups.map(_.asInstanceOf[AttributeReference]), aggExprs,
          child).getOrElse(agg)
    }
  }

  /** `snapshotlog:<root>@v<N>` → (root, N) for the base-relation pin. */
  private def parsePin(name: String): Option[(String, Int)] =
    if (!name.startsWith("snapshotlog:")) None
    else {
      val at = name.lastIndexOf("@v")
      if (at < 0) None
      else scala.util.Try(
        (name.substring("snapshotlog:".length, at).stripSuffix("/"),
          name.substring(at + 2).toInt)).toOption
    }

  /** The relation under the aggregate, tolerating the pure-attribute
    * Project that ColumnPruning inserts and AT MOST ONE deterministic
    * Filter (CombineFilters collapses stacks) in any order. Returns the
    * filter condition (if any) for the group-column admissibility check.
    * Any other operator in between disqualifies the rewrite. */
  private def decompose(child: LogicalPlan)
      : Option[(Option[Expression], DataSourceV2Relation)] = child match {
    case r: DataSourceV2Relation => Some((None, r))
    case Project(ps, inner) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      decompose(inner)
    case Filter(cond, inner) if cond.deterministic &&
        cond.find(_.isInstanceOf[PlanExpression[_]]).isEmpty =>
      decompose(inner).collect { case (None, r) => (Some(cond), r) }
    case _ => None
  }

  private def rewrite(groups: Seq[AttributeReference],
                      aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = {
    for {
      (cond, rel) <- decompose(child)
      (root, pinned) <- parsePin(rel.table.name())
      mv <- IncrementalMv.registered(root)
      // query groups must be a (possibly improper, possibly empty) subset
      // of the MV's key set; equal sets → direct serve, proper subset →
      // rollup re-aggregation over the MV
      if groups.map(_.name).distinct.size == groups.size &&
        groups.forall(g => mv.groupCols.contains(g.name))
      // filter-above admissibility: every referenced column is an MV
      // GROUP column (queried or not) — then filtering the MV's group
      // rows before (re-)aggregation is the same relation
      if cond.forall(_.references.forall(a => mv.groupCols.contains(a.name)))
      spark = SparkSession.active
      applied <- freshOrRefreshed(spark, mv, pinned)
      if applied == pinned
      binds <- bindOutputs(groups, mv.valueCols.toSet, mv.groupCols.toSet,
        aggExprs)
      plan <- materialize(spark, mv, binds, cond,
        rollup = groups.size != mv.groupCols.size, groups)
    } yield plan
  }

  /** The MV's applied watermark — after one bounded refresh-then-serve
    * maintain() if the MV opted in and the pin is within budget. */
  private def freshOrRefreshed(spark: SparkSession, mv: IncrementalMv.MvDef,
                               pinned: Int): Option[Int] = {
    val applied = IncrementalMv.appliedVersion(spark, mv.mvRoot)
    applied match {
      case Some(a) if a < pinned => // stale — refresh iff opted in + budget
        val props =
          try graft.sources.SnapshotLog.tableProps(spark, mv.mvRoot)
          catch { case scala.util.control.NonFatal(_) => return applied }
        val optIn = props.get(IncrementalMv.AutoRefreshProp).contains("true")
        val budget = props.get(IncrementalMv.AutoRefreshBudgetProp)
          .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(16)
        if (!optIn || pinned - a > budget) return applied
        refreshing.set(java.lang.Boolean.TRUE)
        try IncrementalMv.maintain(spark, mv.baseRoot,
          IncrementalMv.mvTableName(spark, mv.mvRoot), mv.groupCols,
          mv.valueCols)
        catch { case scala.util.control.NonFatal(_) => return applied }
        finally refreshing.set(java.lang.Boolean.FALSE)
        IncrementalMv.appliedVersion(spark, mv.mvRoot) // re-prove, no trust
      case other => other
    }
  }

  /** For each aggregate output, which MV-derived expression serves it. */
  private sealed trait Bind
  private case class GroupB(name: String) extends Bind
  private case object CountB extends Bind          // count(*)  → n
  private case class CountVB(c: String) extends Bind // count(c) → nv_c
  private case class SumB(c: String) extends Bind    // sum(c)   → if(nv_c=0,null,s_c)
  private case class AvgB(c: String) extends Bind    // avg(c)   → s_c / nv_c
  // count(DISTINCT g) for an MV GROUP column g: the MV's rows enumerate
  // the live (full-key) groups exactly, so distinct-counting g over MV
  // ROWS equals distinct-counting it over base rows — a COUNT DISTINCT
  // served from kilobytes. Rollup path only (on the exact path g is a
  // query group, so the "distinct count" is the degenerate 0/1).
  private case class DistinctGroupB(g: String) extends Bind

  private def bindOutputs(groups: Seq[AttributeReference],
      valueCols: Set[String], mvGroupCols: Set[String],
      aggExprs: Seq[NamedExpression]): Option[Seq[(NamedExpression, Bind)]] = {
    def groupOf(e: Expression): Option[String] = e match {
      case a: AttributeReference
          if groups.exists(g => g.semanticEquals(a)) => Some(a.name)
      case _ => None
    }
    val out = aggExprs.map {
      case a: AttributeReference => groupOf(a).map(n => a -> (GroupB(n): Bind))
      case al @ Alias(c, _) =>
        groupOf(c).map(n => al -> (GroupB(n): Bind))
          .orElse(bindAgg(valueCols, mvGroupCols,
            groups.map(_.name).toSet, c).map(al -> _))
      case _ => None
    }
    if (out.forall(_.isDefined)) Some(out.flatten) else None
  }

  private def bindAgg(valueCols: Set[String], mvGroupCols: Set[String],
      queryGroups: Set[String], e: Expression): Option[Bind] =
    e match {
      case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) =>
        Some(CountB)
      case AggregateExpression(Count(Seq(a: AttributeReference)), Complete, false, None, _)
          if valueCols(a.name) => Some(CountVB(a.name))
      case AggregateExpression(Sum(a: AttributeReference, _), Complete, false, None, _)
          if valueCols(a.name) => Some(SumB(a.name))
      case AggregateExpression(Average(a: AttributeReference, _), Complete, false, None, _)
          if valueCols(a.name) => Some(AvgB(a.name))
      case AggregateExpression(Count(Seq(a: AttributeReference)), Complete, true, None, _)
          if mvGroupCols(a.name) && !queryGroups(a.name) =>
        Some(DistinctGroupB(a.name))
      case _ => None
    }

  /** Project (exact group match) or re-aggregate (rollup: query groups ⊂
    * MV keys) the MV relation onto the aggregate's original output
    * attribute ids (so parents re-bind without a rewrite of their own),
    * under the group-column filter rebound to MV attributes (if any). */
  private def materialize(spark: SparkSession, mv: IncrementalMv.MvDef,
      binds: Seq[(NamedExpression, Bind)],
      cond: Option[Expression],
      rollup: Boolean,
      queryGroups: Seq[AttributeReference]): Option[LogicalPlan] = {
    val mvPlan = try
      spark.read.format("snapshotlog").load(mv.mvRoot)
        .queryExecution.analyzed
    catch { case scala.util.control.NonFatal(_) => return None }
    def attr(n: String): Option[AttributeReference] =
      mvPlan.output.collectFirst {
        case a: AttributeReference if a.name == n => a }
    def measure(c: String): Option[(AttributeReference, AttributeReference)] =
      for {
        nv <- attr(IncrementalMv.nvCol(c)) if nv.dataType == LongType
        s <- attr(IncrementalMv.sCol(c))
      } yield (nv, s)
    // the re-aggregated MV column serving each bind on the ROLLUP path;
    // Sum(s_c) is total-correct because maintenance pins s_c = 0 (never
    // NULL) for all-null fine groups, and Sum over the LongType n/nv_c
    // stays LongType so the query's count types are preserved
    def rollupSrc(b: Bind): Option[Expression] = b match {
      case GroupB(n) => attr(n)
      case CountB => attr("n").map(n =>
        Coalesce(Seq(Sum(n).toAggregateExpression(), Literal(0L))))
      case CountVB(c) => measure(c).map { case (nv, _) =>
        Coalesce(Seq(Sum(nv).toAggregateExpression(), Literal(0L))) }
      case SumB(c) => measure(c).map { case (nv, s) =>
        // NULL iff no fine group saw a non-null c (sum of an empty or
        // all-null input); a NULL comparison falls to the else branch,
        // where Sum(s) is itself NULL over empty input — still correct
        If(EqualTo(Sum(nv).toAggregateExpression(), Literal(0L)),
          Literal.create(null, Sum(s).toAggregateExpression().dataType),
          Sum(s).toAggregateExpression()) }
      case AvgB(c) => measure(c).map { case (nv, s) =>
        val sumNv = Sum(nv).toAggregateExpression()
        If(EqualTo(sumNv, Literal(0L)), Literal.create(null, DoubleType),
          Divide(Cast(Sum(s).toAggregateExpression(), DoubleType),
            Cast(sumNv, DoubleType))) }
      case DistinctGroupB(g) => attr(g).map(a =>
        // Count DISTINCT over MV rows: within any coarser grouping the
        // MV's (full-key) rows enumerate each live g value at least once
        // and distinct-count collapses the repetition exactly
        Count(a).toAggregateExpression(isDistinct = true, filter = None))
    }
    def directSrc(nCol: AttributeReference)(b: Bind): Option[Expression] =
      b match {
        case GroupB(n) => attr(n)
        case CountB => Some(nCol)
        case CountVB(c) => measure(c).map(_._1)
        case SumB(c) => measure(c).map { case (nv, s) =>
          // SQL sum ignores nulls and is NULL over an all-null group —
          // reconstruct that from the maintained non-null count
          If(EqualTo(nv, Literal(0L)), Literal.create(null, s.dataType), s) }
        case AvgB(c) => measure(c).map { case (nv, s) =>
          If(EqualTo(nv, Literal(0L)), Literal.create(null, DoubleType),
            Divide(Cast(s, DoubleType), Cast(nv, DoubleType))) }
        case DistinctGroupB(_) => None // rollup-only bind (see Bind doc)
      }
    for {
      nCol <- attr("n") if nCol.dataType == LongType
      srcOf = if (rollup) rollupSrc _ else directSrc(nCol) _
      projections <- Some(binds.map { case (orig, b) =>
        val src = srcOf(b).getOrElse(return None)
        if (src.dataType != orig.dataType) return None
        Alias(src, orig.name)(exprId = orig.exprId,
          qualifier = orig.qualifier)
      })
      filtered <- cond match {
        case None => Some(mvPlan)
        case Some(c) =>
          // rebind the base-relation group attributes to the MV's, by
          // name (types must agree exactly — the MV carries the group
          // columns verbatim, so a mismatch means schema drift: refuse)
          var ok = true
          val rebound = c.transform {
            case a: AttributeReference =>
              attr(a.name).filter(_.dataType == a.dataType) match {
                case Some(m) => m
                case None => ok = false; a
              }
          }
          if (ok) Some(Filter(rebound, mvPlan)) else None
      }
      plan <-
        if (!rollup) Some(Project(projections, filtered))
        else {
          // re-aggregate the MV by the query's (coarser) key set, rebound
          // to the MV's own attributes; types must agree exactly
          val groupAttrs = queryGroups.map(g =>
            attr(g.name).filter(_.dataType == g.dataType))
          if (groupAttrs.exists(_.isEmpty)) None
          else Some(Aggregate(groupAttrs.map(_.get), projections, filtered))
        }
    } yield plan
  }
}
