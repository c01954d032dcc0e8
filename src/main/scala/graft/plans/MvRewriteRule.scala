package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
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
  * At 100 TB: the maintained MV answers the dashboard aggregate from
  * kilobytes; without the rewrite every consumer re-scans the base.
  * Disable with spark.graft.mv.autoRewrite=false (registration is
  * already per-MV opt-in). */
object MvRewriteRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.mv.autoRewrite", "true") == "true"
    catch { case scala.util.control.NonFatal(_) => true }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
        rewrite(g, aggExprs, child).getOrElse(agg)
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
    * Project that ColumnPruning inserts. Any Filter/expression in
    * between disqualifies the rewrite (the MV aggregates ALL rows). */
  private def baseRelation(child: LogicalPlan): Option[DataSourceV2Relation] =
    child match {
      case r: DataSourceV2Relation => Some(r)
      case Project(ps, r: DataSourceV2Relation)
          if ps.forall(_.isInstanceOf[AttributeReference]) => Some(r)
      case _ => None
    }

  private def rewrite(g: AttributeReference, aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = {
    for {
      rel <- baseRelation(child)
      (root, pinned) <- parsePin(rel.table.name())
      mv <- IncrementalMv.registered(root)
      if g.name == mv.groupCol
      spark = SparkSession.active
      applied <- IncrementalMv.appliedVersion(spark, mv.mvRoot)
      if applied == pinned
      // every output must be the group column, COUNT(*)/COUNT(1), or
      // SUM(valueCol) — the MV's exact shape; anything else bails
      binds <- bindOutputs(g, mv.valueCol, aggExprs)
      plan <- materialize(spark, mv, g, binds)
    } yield plan
  }

  /** For each aggregate output, which MV column serves it. */
  private sealed trait Bind
  private case object GroupB extends Bind
  private case object CountB extends Bind
  private case object SumB extends Bind

  private def bindOutputs(g: AttributeReference, valueCol: String,
      aggExprs: Seq[NamedExpression]): Option[Seq[(NamedExpression, Bind)]] = {
    val out = aggExprs.map {
      case a: AttributeReference if a.semanticEquals(g) => Some(a -> (GroupB: Bind))
      case al @ Alias(c, _) => bindExpr(g, valueCol, c).map(al -> _)
      case _ => None
    }
    if (out.forall(_.isDefined)) Some(out.flatten) else None
  }

  private def bindExpr(g: AttributeReference, valueCol: String,
                       e: Expression): Option[Bind] = e match {
    case a: AttributeReference if a.semanticEquals(g) => Some(GroupB)
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) =>
      Some(CountB)
    case AggregateExpression(Sum(a: AttributeReference, _), Complete, false, None, _)
        if a.name == valueCol => Some(SumB)
    case _ => None
  }

  /** Project the MV relation onto the aggregate's original output
    * attribute ids, so parents re-bind without a rewrite of their own. */
  private def materialize(spark: SparkSession, mv: IncrementalMv.MvDef,
      g: AttributeReference,
      binds: Seq[(NamedExpression, Bind)]): Option[LogicalPlan] = {
    val mvPlan = try
      spark.read.format("snapshotlog").load(mv.mvRoot)
        .queryExecution.analyzed
    catch { case scala.util.control.NonFatal(_) => return None }
    def attr(n: String): Option[AttributeReference] =
      mvPlan.output.collectFirst {
        case a: AttributeReference if a.name == n => a }
    for {
      gCol <- attr(mv.groupCol); nCol <- attr("n"); sCol <- attr("s")
      // type identity — an evolved/retyped MV must never bind silently
      if gCol.dataType == g.dataType
      projections <- Some(binds.map { case (orig, b) =>
        val src = b match {
          case GroupB => gCol; case CountB => nCol; case SumB => sCol }
        if (src.dataType != orig.dataType) return None
        Alias(src, orig.name)(exprId = orig.exprId,
          qualifier = orig.qualifier)
      })
    } yield Project(projections, mvPlan)
  }
}
