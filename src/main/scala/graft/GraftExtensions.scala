package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{GraftBitmapAgg, GraftBitmapOrAgg, JaroWinkler, KmvNdv, MisraGries, NfcNormalize, NfkcNormalize, SnowflakeAliases, StripAccents, Uuid5}

/** SparkSessionExtensions entry point — the idiomatic way to ship the
  * library's Catalyst extensions: a user adds
  * `spark.sql.extensions=graft.GraftExtensions` (or builds through
  * `Sessions`) and gets, on every session with no per-session calls:
  * the `jaro_winkler` / `uuid5` expressions in plain SQL, the
  * `BoundedLevenshteinRule` optimizer rewrite, and the `AsofJoinStrategy`
  * planner strategy backing the native as-of join operator.
  *
  * (ProductAgg and the wmean UDAF register per-session instead: typed
  * `Aggregator`-through-`udaf()` has no injectFunction builder form.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: levenshtein(a,b) <= k  ->  banded levenshtein(a,b,k)
    ext.injectOptimizerRule(_ => graft.plans.BoundedLevenshteinRule)
    // transparent materialized-view rewrite: a registered MV's defining
    // aggregate over its base snapshot table reads the maintained MV
    // instead (exact version-watermark freshness check)
    ext.injectOptimizerRule(_ => graft.plans.MvRewriteRule)
    // whole-operator path: logical AsofJoin -> AsofJoinExec sorted merge
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // keyless point-in-interval join -> broadcast binary-search operator
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => JaroWinkler(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("uuid5"),
      new ExpressionInfo(classOf[Uuid5].getName, "uuid5"),
      (args: Seq[Expression]) => Uuid5(args(0), args(1))))
    // kmv_ndv(hash60[, k]) — bounded distinct-count sketch (theta/KMV family)
    ext.injectFunction((
      FunctionIdentifier("kmv_ndv"),
      new ExpressionInfo(classOf[KmvNdv].getName, "kmv_ndv"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => KmvNdv(c)
        case Seq(c, k) => KmvNdv(c, k.eval().asInstanceOf[Int])
        case _ => throw new IllegalArgumentException("kmv_ndv(hash60[, k])")
      }))
    // mg_topk_candidates(expr[, capacity]) — Misra-Gries heavy-hitter
    // candidate set (bounded, mergeable; pair with an exact re-count)
    ext.injectFunction((
      FunctionIdentifier("mg_topk_candidates"),
      new ExpressionInfo(classOf[MisraGries].getName, "mg_topk_candidates"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => MisraGries(c)
        case Seq(c, k) => MisraGries(c, k.eval().asInstanceOf[Int])
        case _ => throw new IllegalArgumentException("mg_topk_candidates(expr[, capacity])")
      }))
    // fixed-width bitmap aggregates: byte-identical to the builtin
    // bitmap_construct_agg / bitmap_or_agg but TypedImperative over a
    // long-array buffer, so grouped bitmap NDV hash-aggregates instead
    // of falling to SortAggregate (r22)
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_agg"),
      new ExpressionInfo(classOf[GraftBitmapAgg].getName, "graft_bitmap_agg"),
      (args: Seq[Expression]) => GraftBitmapAgg(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_or_agg"),
      new ExpressionInfo(classOf[GraftBitmapOrAgg].getName, "graft_bitmap_or_agg"),
      (args: Seq[Expression]) => GraftBitmapOrAgg(args.head)))
    // unicode text-normalization kernels (NFC/NFKC/accent-strip) — Spark
    // has no builtin normalizer; these are the cleaning-pipeline folds
    for ((name, build) <- Seq[(String, Expression => Expression)](
        ("nfc_normalize", NfcNormalize.apply),
        ("nfkc_normalize", NfkcNormalize.apply),
        ("strip_accents", StripAccents.apply)))
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[NfcNormalize].getName, name),
        (args: Seq[Expression]) => build(args.head)))
    // Snowflake-dialect names Spark lacks (iff/div0/editdistance/…)
    SnowflakeAliases.install(ext)
  }
}
