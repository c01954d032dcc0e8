package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, Coalesce, Divide, EqualTo, ExprId, Expression, If, IsNotNull, Literal, NamedExpression, PlanExpression, TruncTimestamp}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.VirtualColumn
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, LogicalPlan, Project}
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
  * STAR-SCHEMA MVs (r19): an MV registered via
  * [[IncrementalMv.createJoin]] is defined over `fact JOIN dim ON
  * fact.k = dim.k` — the single most common real dashboard
  * materialization (fact measures grouped by dim attributes; the
  * reference ships Calcite's materialized-view substitution for exactly
  * this join-aggregate shape,
  * BodoSQL/calcite_sql/.../plan/RelOptMaterialization.java:55). The rule
  * matches `Aggregate(… , Join(fact, dim, Inner, fact.k = dim.k))` with
  * the same Project/Filter tolerance on every level (group-column
  * predicates commute with the join AND the grouping, wherever
  * PushDownPredicates parked them; IsNotNull(joinKey) conjuncts planted
  * by InferFiltersFromConstraints are implied by the inner equi-join and
  * ignored). Freshness is TWO exact version checks: the fact pin against
  * the MV's applied watermark, and the dim pin against the MV's
  * materialized dim version ([[IncrementalMv.AppliedDimProp]]) — a dim
  * that moved refuses the rewrite (refresh = re-run createJoin), never
  * guesses. Filter-above, rollup-to-subset, global aggregates, and
  * count(DISTINCT <mv-key>) all compose with the join shape unchanged —
  * they operate on the MV table, which is shape-agnostic. A single-table
  * MV never serves a join query and a join MV never serves a bare fact
  * scan (the two aggregate DIFFERENT row sets — inner joins drop
  * unmatched fact rows).
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
        val gs = groups.map(_.asInstanceOf[AttributeReference])
        rewrite(gs, aggExprs, child)
          .orElse(rewriteGsets(gs, aggExprs, child))
          .getOrElse(agg)
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

  /** Peel Projects and deterministic Filters off `p`, collecting every
    * filter condition for the group-column admissibility check PLUS a
    * SUBSTITUTION map for aliased projections (r20): `Alias(e, n)#id`
    * records id → e (with inner aliases recursively substituted), so a
    * grouping attribute that is really `date_trunc('day', ts)` — the
    * shape PullOutGroupingExpressions leaves as a computed
    * `_groupingexpression` column — can be matched against a registered
    * MV expression key. Pure-attribute projections pass through as
    * before. Returns (conditions, substitutions, leaf). */
  private def peel(p: LogicalPlan)
      : (Seq[Expression], Map[ExprId, Expression], LogicalPlan) = p match {
    case Project(ps, inner) if ps.forall {
        case _: AttributeReference => true
        case Alias(c, _) => c.deterministic &&
          c.find(_.isInstanceOf[PlanExpression[_]]).isEmpty
        case _ => false } =>
      val (cs, sub, leaf) = peel(inner)
      val here = ps.collect { case al @ Alias(c, _) =>
        al.exprId -> c.transform {
          case a: AttributeReference if sub.contains(a.exprId) => sub(a.exprId)
        }
      }
      (cs, sub ++ here, leaf)
    case Filter(cond, inner) if cond.deterministic &&
        cond.find(_.isInstanceOf[PlanExpression[_]]).isEmpty =>
      val (cs, sub, leaf) = peel(inner)
      (cond +: cs, sub, leaf)
    case other => (Nil, Map.empty, other)
  }

  /** The source shape under the aggregate: a tree of single-equality
    * INNER joins over DSv2 relations (a bare relation = the degenerate
    * 0-join tree) — the star/snowflake MV shape, flattened to
    * (relations, key-name pairs) regardless of how ReorderJoin
    * associated the tree. Filter conditions are collected from EVERY
    * level — above each join and pushed below onto any side
    * (PushDownPredicates moves group-column predicates there before this
    * rule sees the plan); filtering a group column commutes with the
    * joins AND with the grouping, so placement doesn't change
    * admissibility. Any other operator disqualifies the rewrite.
    * `subst` maps computed-projection attributes to their defining
    * expressions over leaf attributes (see [[peel]]). */
  private case class Srcs(conds: Seq[Expression],
      rels: Seq[DataSourceV2Relation], pairs: Seq[(String, String)],
      subst: Map[ExprId, Expression])

  private def decompose(child: LogicalPlan): Option[Srcs] =
    peel(child) match {
      case (conds, sub, r: DataSourceV2Relation) =>
        Some(Srcs(conds, Seq(r), Nil, sub))
      case (conds, sub, Join(l, r, Inner,
          Some(EqualTo(a: AttributeReference, b: AttributeReference)), _))
          // join keys must be PHYSICAL leaf columns, not computed aliases
          // (the MV's key pairs are name-keyed against leaf schemas)
          if !sub.contains(a.exprId) && !sub.contains(b.exprId) =>
        for {
          ls <- decompose(l)
          rs <- decompose(r)
          if !ls.subst.contains(a.exprId) && !ls.subst.contains(b.exprId) &&
            !rs.subst.contains(a.exprId) && !rs.subst.contains(b.exprId)
          // the equality must bridge the two subtrees (either order)
          if (ls.rels.exists(_.outputSet.contains(a)) &&
              rs.rels.exists(_.outputSet.contains(b))) ||
            (ls.rels.exists(_.outputSet.contains(b)) &&
              rs.rels.exists(_.outputSet.contains(a)))
        } yield Srcs(conds ++ ls.conds ++ rs.conds, ls.rels ++ rs.rels,
          (a.name, b.name) +: (ls.pairs ++ rs.pairs),
          sub ++ ls.subst ++ rs.subst)
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def rewrite(groups: Seq[AttributeReference],
                      aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] =
    decompose(child).flatMap(serve(_, groups, aggExprs))

  /** Does one relation of `srcs`, taken as the fact, make the query's
    * source shape BE `mv`'s? Every OTHER relation must match exactly one
    * of the MV's JoinDefs — by key-name pair (relation schemas are
    * column-disjoint at create, so the name pair identifies the step),
    * by dim root, and by the dim pin equalling that step's watermarked
    * version. Single-table MVs never serve joins (they aggregated only
    * base rows); join MVs never serve bare fact scans or a SUBSET of
    * their joins (inner joins drop unmatched rows — different row set). */
  private def joinsMatch(mv: IncrementalMv.MvDef,
      dims: Seq[DataSourceV2Relation],
      pairs: Seq[(String, String)]): Boolean = {
    if (mv.joins.size != dims.size || mv.joins.size != pairs.size)
      return false
    if (mv.joins.isEmpty) return true
    val dimVs = IncrementalMv.appliedDimVersions(
      SparkSession.active, mv.mvRoot).getOrElse(return false)
    if (dimVs.size != mv.joins.size) return false
    val pairSets = pairs.map { case (x, y) => Set(x, y) }
    mv.joins.zip(dimVs).forall { case (j, wantV) =>
      pairSets.contains(Set(j.factKey, j.dimKey)) &&
        dims.exists { r =>
          r.output.exists(_.name == j.dimKey) &&
            parsePin(r.table.name()).exists { case (dr, dp) =>
              // the dim read must resolve to the EXACT version this step
              // was materialized against — a changed dim refuses
              dr == j.dimRoot && dp == wantV
            }
        }
    }
  }

  /** Shape + filter + freshness admission, shared by the flat and the
    * grouping-sets paths: the source relations must BE the MV's (with
    * per-dim version watermark equality for join MVs), every filter
    * conjunct must — after substituting computed aliases and folding
    * registered-expression subtrees into their MV key columns — reference
    * only MV group columns, and the fact pin must equal the (possibly
    * just refreshed) applied watermark. Returns the MvDef, the conjuncts
    * REWRITTEN into the MV's name space (materialize rebinds them to MV
    * attributes by name), and the resolved expression keys. */
  private def admit(srcs: Srcs): Option[(IncrementalMv.MvDef,
      Seq[Expression], Map[String, Expression])] = {
    // which relation is the fact is the registration's call — try each
    srcs.rels.iterator.flatMap { factRel =>
      (for {
        (root, pinned) <- parsePin(factRel.table.name())
        mv <- IncrementalMv.registered(root)
        dimRels = srcs.rels.filterNot(_ eq factRel)
        if joinsMatch(mv, dimRels, srcs.pairs) ||
          dimRefreshedAndMatches(mv, dimRels, srcs.pairs)
        keyNames = mv.joins.flatMap(j => Seq(j.factKey, j.dimKey)).toSet
        resolved = resolveGroupExprs(mv, srcs.rels)
        // filter admissibility, per conjunct: every referenced column is
        // an MV GROUP column (queried or not) — then filtering the group
        // rows before (re-)aggregation is the same relation. A conjunct
        // over a registered EXPRESSION key (`WHERE date_trunc('day',ts) >=
        // x`) folds the matched subtree into the MV key column first —
        // filtering the computed group value commutes identically.
        // IsNotNull on a JOIN KEY is implied by the inner equi-joins
        // themselves (null keys never match) — InferFiltersFromConstraints
        // plants those below the joins; they are a no-op on the result
        // and dropped.
        cs0 = srcs.conds.flatMap(conjuncts).filterNot {
          case IsNotNull(a: AttributeReference) => keyNames.contains(a.name)
          case _ => false
        }
        csT = cs0.map(rebindCond(mv, resolved, srcs.subst, _))
        if csT.forall(_.isDefined)
        applied <- freshOrRefreshed(SparkSession.active, mv, pinned)
        if applied == pinned
      } yield (mv, csT.flatten, resolved)).iterator
    }.nextOption()
  }

  /** DIM-side refresh-then-serve (r20, the [[freshOrRefreshed]] analog
    * for join MVs): when the MV opted into auto-refresh and every dim
    * read is pinned AHEAD of its watermark by at most the version
    * budget, run one incremental [[IncrementalMv.maintainDims]] (dim
    * deltas against the pinned fact — cost ∝ Δdim) and re-prove the
    * watermark equality. A pin behind a watermark (time travel) or past
    * the budget leaves the plan untouched; the post-refresh re-check
    * never trusts the refresh (a concurrent dim commit can overshoot). */
  private def dimRefreshedAndMatches(mv: IncrementalMv.MvDef,
      dims: Seq[DataSourceV2Relation],
      pairs: Seq[(String, String)]): Boolean = {
    if (mv.joins.isEmpty || mv.joins.size != dims.size || refreshing.get())
      return false
    val spark = SparkSession.active
    val props =
      try graft.sources.SnapshotLog.tableProps(spark, mv.mvRoot)
      catch { case scala.util.control.NonFatal(_) => return false }
    if (!props.get(IncrementalMv.AutoRefreshProp).contains("true"))
      return false
    val budget = props.get(IncrementalMv.AutoRefreshBudgetProp)
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(16)
    val dimVs = IncrementalMv.appliedDimVersions(spark, mv.mvRoot)
      .getOrElse(return false)
    if (dimVs.size != mv.joins.size) return false
    // every step's dim read must be pinned in [watermark, watermark +
    // budget], and at least one strictly ahead (else the mismatch is
    // not dim staleness and a refresh can't help)
    val gaps = mv.joins.zip(dimVs).map { case (j, w) =>
      dims.flatMap(r => parsePin(r.table.name()).collect {
        case (dr, dp) if dr == j.dimRoot &&
          r.output.exists(_.name == j.dimKey) => dp - w
      }).headOption.getOrElse(return false)
    }
    if (!gaps.forall(g => g >= 0 && g <= budget) || !gaps.exists(_ > 0))
      return false
    refreshing.set(java.lang.Boolean.TRUE)
    try IncrementalMv.maintainDims(spark, mv.baseRoot,
      IncrementalMv.mvTableName(spark, mv.mvRoot), mv.groupCols,
      mv.valueCols)
    catch { case scala.util.control.NonFatal(_) => return false }
    finally refreshing.set(java.lang.Boolean.FALSE)
    joinsMatch(mv, dims, pairs) // re-prove, no trust
  }

  /** Rewrite a filter conjunct into the MV's column space: substitute
    * computed aliases, fold subtrees semantically equal to a registered
    * expression key into a placeholder attribute named after the MV
    * column (rebound to the real MV attribute by name in materialize),
    * then demand every remaining reference be an MV group column. */
  private def rebindCond(mv: IncrementalMv.MvDef,
      resolved: Map[String, Expression], subst: Map[ExprId, Expression],
      c: Expression): Option[Expression] = {
    val substituted = c.transform {
      case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
    }
    val replaced =
      if (resolved.isEmpty) substituted
      else substituted.transformUp {
        case e if resolved.exists(_._2.semanticEquals(e)) =>
          val (n, _) = resolved.find(_._2.semanticEquals(e)).get
          AttributeReference(n, e.dataType, e.nullable)()
      }
    if (replaced.references.forall(a => mv.groupCols.contains(a.name)))
      Some(replaced)
    else None
  }

  /** Resolve the MV's registered expression keys against the query's own
    * relation instances (same exprIds ⇒ semanticEquals works): each SQL
    * string is parsed and analyzed as a one-column Project over each
    * relation until one resolves. Cached per (sql, relation output ids) —
    * the fixpoint optimizer revisits the same plan repeatedly. */
  private val resolveCache = scala.collection.concurrent.TrieMap[
    (String, Seq[Long]), Option[Expression]]()

  private def resolveGroupExprs(mv: IncrementalMv.MvDef,
      rels: Seq[DataSourceV2Relation]): Map[String, Expression] =
    if (mv.groupExprs.isEmpty) Map.empty
    // tz-dependent key boundaries (date_trunc) were materialized under
    // the recorded session tz — under a DIFFERENT session tz the keys
    // are unmatchable (refuse, never serve shifted boundaries)
    else if (!mv.groupExprsTz.contains(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
      Map.empty
    else {
      val spark = SparkSession.active
      mv.groupExprs.flatMap { case (n, sql) =>
        rels.iterator.flatMap { rel =>
          val key = (sql, rel.output.map(_.exprId.id))
          resolveCache.getOrElseUpdate(key, {
            if (resolveCache.size > 4096) resolveCache.clear()
            try {
              val parsed = spark.sessionState.sqlParser.parseExpression(sql)
              val analyzed = spark.sessionState.analyzer.execute(
                Project(Seq(Alias(parsed, n)()), rel))
              analyzed.collectFirst {
                case Project(Seq(al: Alias), _) if al.child.resolved =>
                  al.child
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          })
        }.nextOption().map(n -> _)
      }.toMap
    }

  /** One matched query group: the MV key column serving it, plus — for a
    * COARSER time grain than the materialized one — the query-side
    * date_trunc to re-apply over the MV column (carries the query's
    * format AND time zone; forces the rollup path). */
  private case class GM(mvCol: String, coarse: Option[TruncTimestamp])

  /** date_trunc grain lattice: which query grains recompose from a
    * materialized finer grain. week only composes over ≤day grains (a
    * month/quarter boundary splits weeks); week as the FINE grain only
    * serves week itself (years/quarters/months don't align to weeks). */
  private val grainLevel = Map(
    "second" -> 1, "minute" -> 2, "hour" -> 3, "day" -> 4, "dd" -> 4,
    "month" -> 5, "mon" -> 5, "mm" -> 5, "quarter" -> 6,
    "year" -> 7, "yyyy" -> 7, "yy" -> 7, "week" -> 100)

  private def composes(fine: String, coarse: String): Boolean =
    (grainLevel.get(fine.toLowerCase(java.util.Locale.ROOT)),
      grainLevel.get(coarse.toLowerCase(java.util.Locale.ROOT))) match {
      case (Some(f), Some(c)) =>
        // equal grains under ANY spelling ('WEEK' vs 'week', 'mm' vs
        // 'month') compose: re-truncating an already-truncated value at
        // the same grain is the identity, so the rollup path serves it
        // (ADVICE r20 — the exact-literal semanticEquals path upstream is
        // case-sensitive and missed these serves)
        if (f == c) true
        else if (c == 100) f <= 4 // week over second..day
        else if (f == 100) false // week fine: exact only (handled above)
        else c >= f
      case _ => false
    }

  /** Match one query grouping attribute against the MV's key set: a
    * plain leaf column by name; a computed alias by semantic equality
    * with a registered expression key; or a COARSER date_trunc of a
    * materialized trunc key (re-truncating the MV's day column by month
    * equals truncating the raw timestamp by month — the grain lattice). */
  private def matchGroup(mv: IncrementalMv.MvDef,
      resolved: Map[String, Expression], subst: Map[ExprId, Expression],
      g: AttributeReference): Option[GM] = {
    subst.getOrElse(g.exprId, g) match {
      case a: AttributeReference
          if mv.groupCols.contains(a.name) &&
            !mv.groupExprs.exists(_._1 == a.name) =>
        Some(GM(a.name, None))
      case e =>
        resolved.collectFirst {
          case (n, re) if re.semanticEquals(e) => GM(n, None)
        }.orElse(e match {
          case qt @ TruncTimestamp(Literal(qf, _), qChild, _) =>
            resolved.collectFirst {
              case (n, TruncTimestamp(Literal(mf, _), mChild, _))
                  if mChild.semanticEquals(qChild) &&
                    composes(mf.toString, qf.toString) =>
                GM(n, Some(qt))
            }
          case _ => None
        })
    }
  }

  private def serve(srcs: Srcs, groups: Seq[AttributeReference],
                    aggExprs: Seq[NamedExpression]): Option[LogicalPlan] = {
    for {
      (mv, cs, resolved) <- admit(srcs)
      // every query group must match a DISTINCT MV key (by name, by
      // registered expression, or as a coarser grain); equal coverage
      // with no coarsening → direct serve, otherwise → rollup
      // re-aggregation over the MV
      gms0 = groups.map(matchGroup(mv, resolved, srcs.subst, _))
      if gms0.forall(_.isDefined)
      gms = groups.zip(gms0.flatten)
      if gms.map(_._2.mvCol).distinct.size == gms.size
      rollup = gms.exists(_._2.coarse.isDefined) ||
        gms.size != mv.groupCols.size
      binds <- bindOutputs(gms, srcs.subst, mv.valueCols.toSet,
        mv.groupCols.toSet, aggExprs, servableMinMax(mv, aggExprs))
      plan <- materialize(SparkSession.active, mv, binds, cs.reduceOption(And),
        rollup, gms)
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

  /** GROUPING SETS / ROLLUP / CUBE over the MV base (r19): Spark plans
    * grouping sets as `Aggregate(groupAttrs :+ spark_grouping_id, aggs,
    * Expand(projections, output, child))` — each Expand projection passes
    * the aggregation inputs through unchanged and null-masks the grouping
    * columns per set, with a gid literal tagging the set. When the child
    * decomposes to the MV's source shape and every grouping attribute is
    * an MV key, EVERY grouping set is a subset of the MV key set — each is
    * individually rollup-servable — so the rewrite keeps the
    * Aggregate+Expand STRUCTURE and substitutes the source: the Expand
    * re-expands MV ROWS instead of base rows (one row per fine-grained
    * group — kilobytes at 100 TB), pass-through measure positions become
    * the MV's n/nv_c/s_c columns, and each aggregate re-composes exactly
    * like the rollup path (count(*) → sum(n), sum(c) → nv-masked
    * sum(s_c), avg(c) → sum(s_c)/sum(nv_c), count(DISTINCT g) for an MV
    * key g → count(DISTINCT g) over MV rows — correct in every set, the
    * sets grouping ON g included, where it degenerates to 1 exactly as
    * the direct query does). The grouping attrs and spark_grouping_id
    * keep their exprIds, so grouping()/grouping_id() projections and
    * every parent re-bind unchanged; non-subset grouping attrs (any
    * non-MV-key column) fall back to the base scan.
    * Reference exercises subset grouping sets:
    * BodoSQL/bodosql/tests/test_groupby_grouping_sets.py:121. */
  private def rewriteGsets(groups: Seq[AttributeReference],
                           aggExprs: Seq[NamedExpression],
                           child: LogicalPlan): Option[LogicalPlan] =
    child match {
      case Expand(projections, output, eChild) =>
        val gid = groups.find(_.name == VirtualColumn.groupingIdName)
        val others = groups.filterNot(g => gid.exists(_.exprId == g.exprId))
        val src = decompose(eChild)
        for {
          g <- gid
          s <- src
          // the gsets substitution binds positions to PHYSICAL columns;
          // computed aliases below the Expand are out of scope (an
          // expression-keyed grouping set falls back to the base)
          if s.subst.isEmpty
          (mv, cs, _) <- admit(s)
          plan <- materializeGsets(SparkSession.active, mv, cs, projections,
            output, groups, g, others, aggExprs)
        } yield plan
      case _ => None
    }

  /** Build the substituted Expand + Aggregate (see [[rewriteGsets]]). */
  private def materializeGsets(spark: SparkSession, mv: IncrementalMv.MvDef,
      conds: Seq[Expression],
      projections: Seq[Seq[Expression]], output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      groups: Seq[AttributeReference], gid: AttributeReference,
      groupAttrs: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression]): Option[LogicalPlan] = {
    val mvPlan = mvRelation(spark, mv).getOrElse(return None)
    val attr = attrIn(mvPlan) _
    val groupIds = groupAttrs.map(_.exprId).toSet
    // classify each Expand output position: the gid column (all literals),
    // a grouping column (base attr or null per set), or a pass-through
    // (the SAME base attribute in every set)
    val gidPos = output.indexWhere(_.exprId == gid.exprId)
    if (gidPos < 0 ||
        !projections.forall(p => p(gidPos).isInstanceOf[Literal])) return None
    // per grouping attr: its position and the base attr behind it
    val groupInfo: Seq[(AttributeReference, Int, AttributeReference)] =
      groupAttrs.map { ga =>
        val pos = output.indexWhere(_.exprId == ga.exprId)
        if (pos < 0) return None
        val bases = projections.map(_(pos)).collect {
          case a: AttributeReference => a }
        // every non-null entry must be ONE base attr; nulls mask the rest
        if (bases.isEmpty || bases.map(_.exprId).distinct.size != 1 ||
            !projections.map(_(pos)).forall(e =>
              e.isInstanceOf[AttributeReference] ||
                (e match { case Literal(null, _) => true; case _ => false })))
          return None
        (ga, pos, bases.head)
      }
    // every grouping column must be an MV key of the same type, and no
    // two grouping attrs may ride the same name
    if (groupInfo.map(_._3.name).distinct.size != groupInfo.size) return None
    val mvGroupOf: Map[Int, AttributeReference] = groupInfo.map {
      case (_, pos, base) =>
        val m = attr(base.name)
          .filter(a => mv.groupCols.contains(base.name) &&
            a.dataType == base.dataType)
          .getOrElse(return None)
        pos -> m
    }.toMap
    // bind each aggregate output: pure group/gid computations pass
    // through; aggregate functions bind by the PASS-THROUGH base name
    // (queryGroups = empty — in Expand form the functions reference the
    // pass-through copies, so count(DISTINCT <any MV key>) is servable)
    val groupSide = org.apache.spark.sql.catalyst.expressions.AttributeSet(
      groups)
    val rollupSrc = rollupSrcOf(attr) _
    val mmCols = servableMinMax(mv, aggExprs)
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      // an aggregate output binds by shape FIRST: count(*) has no
      // attribute references at all, so a reference-based passthrough
      // test would wrongly keep it counting (substituted) MV rows
      case al @ Alias(c: AggregateExpression, _) =>
        val b = bindAgg(mv.valueCols.toSet, mv.groupCols.toSet,
          Set.empty, mmCols, Map.empty, c).getOrElse(return None)
        val srcE = rollupSrc(b).getOrElse(return None)
        if (srcE.dataType != al.dataType) return None
        Alias(srcE, al.name)(exprId = al.exprId, qualifier = al.qualifier)
      // pure group/gid computations (the group attrs themselves,
      // grouping()/grouping_id() projections) pass through unchanged
      case ne if ne.references.subsetOf(groupSide) &&
          !ne.exists(_.isInstanceOf[AggregateExpression]) => ne
      case _ => return None
    }
    // the MV attributes the new aggregates/projections consume
    val usedMv: Seq[AttributeReference] =
      newAggExprs.flatMap(_.references.toSeq).collect {
        case a: AttributeReference
            if mvPlan.outputSet.contains(a) => a
      }.distinct
    // rebuild the Expand over the MV relation: pass-throughs become the
    // used MV columns (identical in every set), grouping positions mirror
    // the original attr-or-null mask with the MV's group attrs, the gid
    // literal is copied verbatim
    val newOutput = usedMv ++ groupAttrs :+ gid
    val newProjections = projections.map { p =>
      (usedMv: Seq[Expression]) ++
        groupInfo.map { case (_, pos, _) =>
          p(pos) match {
            case _: AttributeReference => mvGroupOf(pos): Expression
            case lit => lit // Literal(null, _)
          }
        } :+ p(gidPos)
    }
    // the admissible filter applies to MV rows BELOW the Expand — the
    // same placement the original plan gave it relative to the expansion
    val filtered = conds.reduceOption(And) match {
      case None => mvPlan
      case Some(c) =>
        var ok = true
        val rebound = c.transform {
          case a: AttributeReference =>
            attr(a.name).filter(_.dataType == a.dataType) match {
              case Some(m) => m
              case None => ok = false; a
            }
        }
        if (!ok) return None
        Filter(rebound, mvPlan)
    }
    Some(Aggregate(groups, newAggExprs,
      Expand(newProjections, newOutput, filtered)))
  }

  /** For each aggregate output, which MV-derived expression serves it. */
  private sealed trait Bind
  private case class GroupB(gm: GM) extends Bind
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
  // min(c)/max(c) for a registered MINMAX measure (r19): served only
  // while the MV's durable validity flag holds (insert-only history) —
  // bound through the servable-minmax set the caller computes
  private case class MinB(c: String) extends Bind   // min(c) → mn_c
  private case class MaxB(c: String) extends Bind   // max(c) → mx_c
  // a FOLDABLE output (CollapseProject merges literal projections into
  // the Aggregate's output list) touches no base rows — emit verbatim.
  // Without this, `agg(...).withColumn("flag", lit(true))` silently
  // refuses the rewrite at its FINAL optimization even though the bare
  // aggregate serves.
  private case class FoldB(e: NamedExpression) extends Bind

  private def bindOutputs(gms: Seq[(AttributeReference, GM)],
      subst: Map[ExprId, Expression],
      valueCols: Set[String], mvGroupCols: Set[String],
      aggExprs: Seq[NamedExpression],
      mmCols: Set[String]): Option[Seq[(NamedExpression, Bind)]] = {
    def groupOf(e: Expression): Option[GM] = e match {
      case a: AttributeReference =>
        gms.collectFirst { case (g, gm) if g.exprId == a.exprId => gm }
      case _ => None
    }
    val queryMvCols = gms.map(_._2.mvCol).toSet
    val out = aggExprs.map {
      case a: AttributeReference => groupOf(a).map(gm => a -> (GroupB(gm): Bind))
      case al @ Alias(c, _) =>
        groupOf(c).map(gm => al -> (GroupB(gm): Bind))
          .orElse(bindAgg(valueCols, mvGroupCols,
            queryMvCols, mmCols, subst, c).map(al -> _))
          .orElse(if (c.foldable) Some(al -> (FoldB(al): Bind)) else None)
      case _ => None
    }
    if (out.forall(_.isDefined)) Some(out.flatten) else None
  }

  private def bindAgg(valueCols: Set[String], mvGroupCols: Set[String],
      queryGroups: Set[String], mmCols: Set[String],
      subst: Map[ExprId, Expression],
      e: Expression): Option[Bind] = {
    // a measure must be a PHYSICAL leaf column: an attribute that is
    // really a computed alias (`v + 1 AS v`) must not bind by its name
    def leaf(a: AttributeReference): Option[String] = subst.get(a.exprId) match {
      case None => Some(a.name)
      case Some(ar: AttributeReference) => Some(ar.name)
      case _ => None
    }
    e match {
      case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) =>
        Some(CountB)
      case AggregateExpression(Count(Seq(a: AttributeReference)), Complete, false, None, _) =>
        leaf(a).filter(valueCols).map(CountVB.apply)
      case AggregateExpression(Sum(a: AttributeReference, _), Complete, false, None, _) =>
        leaf(a).filter(valueCols).map(SumB.apply)
      case AggregateExpression(Average(a: AttributeReference, _), Complete, false, None, _) =>
        leaf(a).filter(valueCols).map(AvgB.apply)
      case AggregateExpression(Min(a: AttributeReference), Complete, false, None, _) =>
        leaf(a).filter(mmCols).map(MinB.apply)
      case AggregateExpression(Max(a: AttributeReference), Complete, false, None, _) =>
        leaf(a).filter(mmCols).map(MaxB.apply)
      case AggregateExpression(Count(Seq(a: AttributeReference)), Complete, true, None, _) =>
        leaf(a).filter(n => mvGroupCols(n) && !queryGroups(n))
          .map(DistinctGroupB.apply)
      case _ => None
    }
  }

  /** The servable minmax-column set for this query: empty unless the
    * query actually asks for a min/max (the durable validity flag costs a
    * props read — pay it only when needed) AND the MV's flag is TRUE. */
  private def servableMinMax(mv: IncrementalMv.MvDef,
      aggExprs: Seq[NamedExpression]): Set[String] = {
    val wants = mv.minMaxCols.nonEmpty && aggExprs.exists(_.exists {
      case AggregateExpression(_: Min | _: Max, _, _, _, _) => true
      case _ => false
    })
    if (wants && IncrementalMv.minMaxValid(SparkSession.active, mv.mvRoot))
      mv.minMaxCols.toSet
    else Set.empty
  }

  /** Name → attribute lookup over a plan's output. */
  private def attrIn(plan: LogicalPlan)(n: String): Option[AttributeReference] =
    plan.output.collectFirst {
      case a: AttributeReference if a.name == n => a }

  private def measureIn(attr: String => Option[AttributeReference],
      c: String): Option[(AttributeReference, AttributeReference)] =
    for {
      nv <- attr(IncrementalMv.nvCol(c)) if nv.dataType == LongType
      s <- attr(IncrementalMv.sCol(c))
    } yield (nv, s)

  /** The re-aggregated MV column serving each bind on the ROLLUP path
    * (shared with the grouping-sets path, whose per-set aggregation is
    * the same re-composition); Sum(s_c) is total-correct because
    * maintenance pins s_c = 0 (never NULL) for all-null fine groups, and
    * Sum over the LongType n/nv_c stays LongType so the query's count
    * types are preserved. */
  /** The MV-side grouping expression for a matched group: the key column
    * itself, or — for a coarser grain — the query's date_trunc re-applied
    * over the MV column (withNewChildren keeps the query's format literal
    * AND time zone; `date_trunc('month', day)` == `date_trunc('month',
    * ts)` for every ts in the day group — the grain lattice). */
  private def groupSrcOf(attr: String => Option[AttributeReference])
      (gm: GM): Option[Expression] =
    attr(gm.mvCol).map { a =>
      gm.coarse match {
        case None => a
        case Some(qt) => qt.withNewChildren(Seq(qt.children.head, a))
      }
    }

  private def rollupSrcOf(attr: String => Option[AttributeReference])
      (b: Bind): Option[Expression] = {
    def measure(c: String) = measureIn(attr, c)
    b match {
      case GroupB(gm) => groupSrcOf(attr)(gm)
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
      // min of per-group minima IS the coarser min (distributive); Min/
      // Max ignore the NULL extrema of all-null fine groups, exactly as
      // the direct aggregate ignores their null inputs
      case MinB(c) => attr(IncrementalMv.mnCol(c)).map(a =>
        Min(a).toAggregateExpression())
      case MaxB(c) => attr(IncrementalMv.mxCol(c)).map(a =>
        Max(a).toAggregateExpression())
      case FoldB(_) => None // handled verbatim by the projections builder
    }
  }

  /** The MV relation's analyzed plan, or None when unreadable. */
  private def mvRelation(spark: SparkSession,
      mv: IncrementalMv.MvDef): Option[LogicalPlan] =
    try Some(spark.read.format("snapshotlog").load(mv.mvRoot)
      .queryExecution.analyzed)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Project (exact group match) or re-aggregate (rollup: query groups ⊂
    * MV keys) the MV relation onto the aggregate's original output
    * attribute ids (so parents re-bind without a rewrite of their own),
    * under the group-column filter rebound to MV attributes (if any). */
  private def materialize(spark: SparkSession, mv: IncrementalMv.MvDef,
      binds: Seq[(NamedExpression, Bind)],
      cond: Option[Expression],
      rollup: Boolean,
      gms: Seq[(AttributeReference, GM)]): Option[LogicalPlan] = {
    val mvPlan = mvRelation(spark, mv).getOrElse(return None)
    val attr = attrIn(mvPlan) _
    def measure(c: String): Option[(AttributeReference, AttributeReference)] =
      measureIn(attr, c)
    def rollupSrc(b: Bind): Option[Expression] = rollupSrcOf(attr)(b)
    def directSrc(nCol: AttributeReference)(b: Bind): Option[Expression] =
      b match {
        case GroupB(gm) if gm.coarse.isEmpty => attr(gm.mvCol)
        case GroupB(_) => None // coarse grains always take the rollup path
        case CountB => Some(nCol)
        case CountVB(c) => measure(c).map(_._1)
        case SumB(c) => measure(c).map { case (nv, s) =>
          // SQL sum ignores nulls and is NULL over an all-null group —
          // reconstruct that from the maintained non-null count
          If(EqualTo(nv, Literal(0L)), Literal.create(null, s.dataType), s) }
        case AvgB(c) => measure(c).map { case (nv, s) =>
          If(EqualTo(nv, Literal(0L)), Literal.create(null, DoubleType),
            Divide(Cast(s, DoubleType), Cast(nv, DoubleType))) }
        case MinB(c) => attr(IncrementalMv.mnCol(c))
        case MaxB(c) => attr(IncrementalMv.mxCol(c))
        case DistinctGroupB(_) => None // rollup-only bind (see Bind doc)
        case FoldB(_) => None // handled verbatim by the projections builder
      }
    for {
      nCol <- attr("n") if nCol.dataType == LongType
      srcOf = if (rollup) rollupSrc _ else directSrc(nCol) _
      projections <- Some(binds.map {
        case (_, FoldB(e)) => e // literal output: verbatim, same exprId
        case (orig, b) =>
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
          // re-aggregate the MV by the query's (coarser) key set — each
          // matched group's MV-side expression (key column, or re-trunc
          // of a finer grain); types must agree exactly
          val groupExprs = gms.map { case (g, gm) =>
            groupSrcOf(attr)(gm).filter(_.dataType == g.dataType)
          }
          if (groupExprs.exists(_.isEmpty)) None
          else Some(Aggregate(groupExprs.map(_.get), projections, filtered))
        }
    } yield plan
  }
}
