package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Divide, EqualTo, Expression, If, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
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
  * Served shapes, for GROUP BY exactly the MV's group columns:
  * `count(*)` (→ n), `sum(v)` (→ IF(nv = 0, NULL, s) — SQL's
  * ignore-nulls sum, reconstructed from the maintained non-null count),
  * `count(v)` (→ nv), and `avg(v)` (→ s / nv, null when nv = 0).
  * For integral v the MV's sums are exact longs, so avg is bit-honest;
  * for floating v both the direct and the maintained sum are
  * association-dependent anyway.
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
      case agg @ Aggregate(groups, aggExprs, child, _)
          if groups.nonEmpty && groups.forall(_.isInstanceOf[AttributeReference]) =>
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
    * Project that ColumnPruning inserts. Any Filter/expression in
    * between disqualifies the rewrite (the MV aggregates ALL rows). */
  private def baseRelation(child: LogicalPlan): Option[DataSourceV2Relation] =
    child match {
      case r: DataSourceV2Relation => Some(r)
      case Project(ps, r: DataSourceV2Relation)
          if ps.forall(_.isInstanceOf[AttributeReference]) => Some(r)
      case _ => None
    }

  private def rewrite(groups: Seq[AttributeReference],
                      aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = {
    for {
      rel <- baseRelation(child)
      (root, pinned) <- parsePin(rel.table.name())
      mv <- IncrementalMv.registered(root)
      if groups.map(_.name).toSet == mv.groupCols.toSet &&
        groups.size == mv.groupCols.size
      spark = SparkSession.active
      applied <- IncrementalMv.appliedVersion(spark, mv.mvRoot)
      if applied == pinned
      binds <- bindOutputs(groups, mv.valueCol, aggExprs)
      plan <- materialize(spark, mv, binds)
    } yield plan
  }

  /** For each aggregate output, which MV-derived expression serves it. */
  private sealed trait Bind
  private case class GroupB(name: String) extends Bind
  private case object CountB extends Bind  // count(*)       → n
  private case object CountVB extends Bind // count(v)       → nv
  private case object SumB extends Bind    // sum(v)         → if(nv=0,null,s)
  private case object AvgB extends Bind    // avg(v)         → s / nv

  private def bindOutputs(groups: Seq[AttributeReference], valueCol: String,
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
          .orElse(bindAgg(valueCol, c).map(al -> _))
      case _ => None
    }
    if (out.forall(_.isDefined)) Some(out.flatten) else None
  }

  private def bindAgg(valueCol: String, e: Expression): Option[Bind] = e match {
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) =>
      Some(CountB)
    case AggregateExpression(Count(Seq(a: AttributeReference)), Complete, false, None, _)
        if a.name == valueCol => Some(CountVB)
    case AggregateExpression(Sum(a: AttributeReference, _), Complete, false, None, _)
        if a.name == valueCol => Some(SumB)
    case AggregateExpression(Average(a: AttributeReference, _), Complete, false, None, _)
        if a.name == valueCol => Some(AvgB)
    case _ => None
  }

  /** Project the MV relation onto the aggregate's original output
    * attribute ids, so parents re-bind without a rewrite of their own. */
  private def materialize(spark: SparkSession, mv: IncrementalMv.MvDef,
      binds: Seq[(NamedExpression, Bind)]): Option[LogicalPlan] = {
    val mvPlan = try
      spark.read.format("snapshotlog").load(mv.mvRoot)
        .queryExecution.analyzed
    catch { case scala.util.control.NonFatal(_) => return None }
    def attr(n: String): Option[AttributeReference] =
      mvPlan.output.collectFirst {
        case a: AttributeReference if a.name == n => a }
    for {
      nCol <- attr("n"); nvCol <- attr("nv"); sCol <- attr("s")
      if nCol.dataType == LongType && nvCol.dataType == LongType
      projections <- Some(binds.map { case (orig, b) =>
        val src: Expression = b match {
          case GroupB(n) => attr(n).getOrElse(return None)
          case CountB => nCol
          case CountVB => nvCol
          case SumB =>
            // SQL sum ignores nulls and is NULL over an all-null group —
            // reconstruct that from the maintained non-null count
            If(EqualTo(nvCol, Literal(0L)),
              Literal.create(null, sCol.dataType), sCol)
          case AvgB =>
            If(EqualTo(nvCol, Literal(0L)), Literal.create(null, DoubleType),
              Divide(Cast(sCol, DoubleType), Cast(nvCol, DoubleType)))
        }
        if (src.dataType != orig.dataType) return None
        Alias(src, orig.name)(exprId = orig.exprId,
          qualifier = orig.qualifier)
      })
    } yield Project(projections, mvPlan)
  }
}
