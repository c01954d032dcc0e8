package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational core: every join kind, set operations, distinct/dedup,
  * sort/limit/offset/top-k, sampling — SURVEY.md §2.2/§2.3/§2.6/§2.7.
  *
  * Reference semantics: bodo-ai/Bodo streaming hash join
  * (bodo/libs/streaming/_join.h:671 JoinState — inner/left/right/full +
  * semi/anti/mark via DuckDB JoinType, bodo/pandas/plan_optimizer.pyx:263),
  * nested-loop join for non-equi (bodo/libs/_nested_loop_join.cpp), set ops
  * (bodo/libs/streaming/union.py:38, BodoPhysicalIntersect/Minus.kt),
  * distributed sort + limit/offset (bodo/libs/streaming/_sort.h:586).
  *
  * Scale notes: joins here are declared with the DataFrame API so Catalyst
  * picks broadcast-hash for dim tables and shuffled-hash/SMJ for fact-fact;
  * non-equi joins carry an equi component wherever possible so they plan as
  * hash joins with residual predicates rather than nested loops.
  */
object RelationalQueries extends QueryModule {

  override def queries: Map[String, QueryFn] = Map(
    // Plain scan: projection + filter, both pushed into the parquet reader.
    "scan_pushdown" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_quantity") > 45.0 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    "join_inner" -> ((s, d) => {
      lineitem(s, d).join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_totalprice") > 400000.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"), col("o_totalprice"))
    }),

    // Left join with genuinely unmatched rows (right side filtered).
    "join_left" -> ((s, d) => {
      val bigCust = customer(s, d).filter(col("c_acctbal") > 5000.0)
      orders(s, d).filter(col("o_orderkey") % 7 === 0)
        .join(bigCust, col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_acctbal"))
    }),

    "join_right" -> ((s, d) => {
      val o = orders(s, d).filter(col("o_totalprice") > 450000.0)
      o.join(customer(s, d), col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
    }),

    "join_full" -> ((s, d) => {
      val hi = orders(s, d).filter(col("o_totalprice") > 430000.0)
        .select(col("o_custkey").as("k"), col("o_orderkey"))
      val neg = customer(s, d).filter(col("c_acctbal") < 0.0)
        .select(col("c_custkey").as("k2"), col("c_acctbal"))
      hi.join(neg, col("k") === col("k2"), "full")
        .select(col("k"), col("o_orderkey"), col("k2"), col("c_acctbal"))
    }),

    // EXISTS → left-semi: customers that placed an urgent order.
    "join_semi" -> ((s, d) => {
      val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      customer(s, d).join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // NOT EXISTS → left-anti: customers with no orders at all.
    "join_anti" -> ((s, d) => {
      customer(s, d).join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    "join_cross" -> ((s, d) => {
      region(s, d).select(col("r_name"))
        .crossJoin(orders(s, d).select(col("o_orderpriority")).distinct())
    }),

    // Deliberately hot-keyed join — the AQE skew-join stress entry (the
    // join-side complement of agg_salted_twophase): 70% of events collapse
    // onto key 0, so at scale one shuffle partition dwarfs the rest and
    // AQE's OptimizeSkewedJoin must split it (plan-asserted under forced-
    // shuffle confs in PlanShapeSpec; at fixture scale the values are what
    // the oracle checks).
    "join_skew_aqe" -> ((s, d) => {
      val ev = events(s, d).withColumn("sk",
        when(col("user_id") % 10 < 7, 0L).otherwise(col("user_id") % 100))
      val dim = events(s, d)
        .groupBy((col("user_id") % 100).as("sk2"))
        .agg(avg(col("value")).as("dim_v"))
      ev.join(dim, col("sk") === col("sk2"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value") + col("dim_v")).as("sum_v"))
    }),

    // Non-equi join with an equi component → hash join + residual predicate.
    "join_non_equi" -> ((s, d) => {
      val s1 = supplier(s, d).select(col("s_suppkey").as("k1"),
        col("s_nationkey").as("nk1"), col("s_acctbal").as("b1"))
      val s2 = supplier(s, d).select(col("s_suppkey").as("k2"),
        col("s_nationkey").as("nk2"), col("s_acctbal").as("b2"))
      s1.join(s2, col("nk1") === col("nk2") && col("b1") < col("b2"))
        .groupBy(col("nk1").as("nationkey"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // Null-safe equality (<=>), pandas-NA-style key matching.
    "join_null_safe" -> ((s, d) => {
      val l = customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_nationkey")).as("lk"))
      val r = supplier(s, d).select(col("s_suppkey"),
        when(col("s_suppkey") % 10 === 0, lit(null)).otherwise(col("s_nationkey")).as("rk"))
      l.join(r, col("lk") <=> col("rk"))
        .groupBy(col("lk").as("key"))
        .agg(count(lit(1)).as("n"))
    }),

    "distinct_rows" -> ((s, d) =>
      orders(s, d).select(col("o_orderstatus"), col("o_orderpriority")).distinct()),

    // drop_duplicates keep-first semantics, made deterministic via min event.
    "dedup_keep_first" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      events(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
    }),

    "sort_multi_key" -> ((s, d) =>
      supplier(s, d).orderBy(asc_nulls_last("s_nationkey"), desc("s_acctbal"), asc("s_suppkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
        .limit(40)),

    "limit_offset" -> ((s, d) =>
      orders(s, d).orderBy(col("o_orderkey")).offset(50).limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // Top-k → TakeOrderedAndProject (no global sort at scale).
    "topk" -> ((s, d) =>
      orders(s, d).orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(15)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // TABLESAMPLE — nondeterministic across engines: rows-only check.
    "sample_fraction" -> ((s, d) =>
      orders(s, d).sample(withReplacement = false, 0.1, seed = 42)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // Deterministic twin of `sample_fraction`: the same 10%-of-orders
    // surface with membership decided by a 60-bit md5 hash of the row key
    // instead of rand(seed) — exactly reproducible across runs, engines,
    // and retries (the auditable-sample shape of sample_stratified at a
    // single rate), so the fraction-sampling surface ALSO has a
    // hash-matched oracle row while native .sample() stays rows-only
    // gated beside it. Pure narrow filter: no shuffle.
    "sample_fraction_hash" -> ((s, d) => {
      import graft.text.TextKernels.md5Long
      orders(s, d)
        .filter(md5Long(concat(lit("frac"),
          col("o_orderkey").cast("string"))) % 100 < 10)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // Stratified sampling with per-stratum rates (sampleBy / the data-
    // mixture knob of a pretraining pipeline: up-weight one language,
    // down-weight another). Membership is decided by a deterministic
    // 60-bit md5 hash of the row key, not rand(): the sample is exactly
    // reproducible across runs, engines, and retries — which is what a
    // 100-TB pipeline needs for auditable mixtures — and fully
    // oracle-replayable. Pure narrow filter: no shuffle before the
    // summary agg.
    "sample_stratified" -> ((s, d) => {
      import graft.text.TextKernels.md5Long
      val rate = when(col("lang") === "en", 80)
        .when(col("lang") === "de", 50)
        .when(col("lang") === "fr", 30)
        .otherwise(10)
      documents(s, d)
        .filter(md5Long(concat(lit("strat"), col("doc_id").cast("string"))) % 100 < rate)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }),

    "union_all" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val b = orders(s, d).filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 350000.0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      a.unionByName(b)
    }),

    "union_distinct" -> ((s, d) => {
      val a = customer(s, d).select(col("c_nationkey").as("nationkey"))
      val b = supplier(s, d).select(col("s_nationkey").as("nationkey"))
      a.unionByName(b).distinct()
    }),

    "intersect_distinct" -> ((s, d) => {
      val a = customer(s, d).filter(col("c_acctbal") > 9000.0).select(col("c_nationkey").as("nationkey"))
      val b = supplier(s, d).select(col("s_nationkey").as("nationkey"))
      a.intersect(b)
    }),

    "except_distinct" -> ((s, d) => {
      val a = customer(s, d).select(col("c_nationkey").as("nationkey"))
      val b = supplier(s, d).select(col("s_nationkey").as("nationkey"))
      a.except(b)
    }),

    "except_all" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_totalprice") > 420000.0).select(col("o_orderpriority"))
      val b = orders(s, d).filter(col("o_totalprice") > 450000.0).select(col("o_orderpriority"))
      a.exceptAll(b)
    }),

    "intersect_all" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_totalprice") > 420000.0).select(col("o_orderpriority"))
      val b = orders(s, d).filter(col("o_custkey") % 3 === 0).select(col("o_orderpriority"))
      a.intersectAll(b)
    })
  )

  override def oracle: Map[String, String] = Map(
    "sample_fraction_hash" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE ('0x' || substring(md5('frac' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 100 < 10""".stripMargin,

    "sample_stratified" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(doc_id) AS min_id
        |FROM documents
        |WHERE ('0x' || substring(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 <
        |  CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 50 WHEN 'fr' THEN 30 ELSE 10 END
        |GROUP BY lang""".stripMargin,

    "scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45.0 AND l_returnflag = 'R'""".stripMargin,

    "join_inner" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000.0""".stripMargin,

    "join_left" ->
      """SELECT o_orderkey, o_custkey, c_name, c_acctbal
        |FROM (SELECT * FROM orders WHERE o_orderkey % 7 = 0) o
        |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000.0) c
        |ON o_custkey = c_custkey""".stripMargin,

    "join_right" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
        |RIGHT JOIN customer c ON o_custkey = c_custkey""".stripMargin,

    "join_full" ->
      """SELECT k, o_orderkey, k2, c_acctbal
        |FROM (SELECT o_custkey AS k, o_orderkey FROM orders WHERE o_totalprice > 430000.0) a
        |FULL JOIN (SELECT c_custkey AS k2, c_acctbal FROM customer WHERE c_acctbal < 0.0) b
        |ON k = k2""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "join_cross" ->
      """SELECT r_name, o_orderpriority
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)""".stripMargin,

    "join_skew_aqe" ->
      """WITH ev AS (
        |  SELECT event_type, value,
        |    CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id % 100 END AS sk
        |  FROM events),
        |dim AS (SELECT user_id % 100 AS sk2, avg(value) AS dim_v
        |        FROM events GROUP BY 1)
        |SELECT event_type, count(*) AS n, sum(value + dim_v) AS sum_v
        |FROM ev JOIN dim ON sk = sk2
        |GROUP BY event_type""".stripMargin,

    "join_non_equi" ->
      """SELECT s1.s_nationkey AS nationkey, count(*) AS n_pairs
        |FROM supplier s1 JOIN supplier s2
        |  ON s1.s_nationkey = s2.s_nationkey AND s1.s_acctbal < s2.s_acctbal
        |GROUP BY 1""".stripMargin,

    "join_null_safe" ->
      """WITH l AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_nationkey END AS lk FROM customer),
        |  r AS (SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 10 = 0 THEN NULL ELSE s_nationkey END AS rk FROM supplier)
        |SELECT lk AS key, count(*) AS n
        |FROM l JOIN r ON lk IS NOT DISTINCT FROM rk GROUP BY 1""".stripMargin,

    "distinct_rows" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "dedup_keep_first" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "sort_multi_key" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey ASC NULLS LAST, s_acctbal DESC, s_suppkey ASC
        |LIMIT 40""".stripMargin,

    "limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 50""".stripMargin,

    "topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin,

    "union_all" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000.0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000.0""".stripMargin,

    "union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,

    "intersect_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
        |INTERSECT
        |SELECT s_nationkey FROM supplier""".stripMargin,

    "except_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier""".stripMargin,

    "except_all" ->
      """SELECT o_orderpriority FROM orders WHERE o_totalprice > 420000.0
        |EXCEPT ALL
        |SELECT o_orderpriority FROM orders WHERE o_totalprice > 450000.0""".stripMargin,

    "intersect_all" ->
      """SELECT o_orderpriority FROM orders WHERE o_totalprice > 420000.0
        |INTERSECT ALL
        |SELECT o_orderpriority FROM orders WHERE o_custkey % 3 = 0""".stripMargin
  )
}
