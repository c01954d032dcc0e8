package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Aggregation surface — SURVEY.md §2.4: the groupby ftype inventory
  * (bodo/libs/groupby/_groupby_ftypes.h:22, bodo/ir/aggregate.py:246
  * supported_agg_funcs), grouping sets/rollup/cube
  * (bodo/libs/streaming/_groupby.h:1542 GroupingSetsState), pivot/melt
  * (bodo/hiframes/dataframe_impl.py:4215), listagg (bodo/libs/_listagg.cpp),
  * scalar whole-frame reductions (bodo/pandas/physical/reduce.h:143).
  *
  * All are hash aggregations with map-side partial aggregation — the shape
  * that scales: one shuffle on the group keys, no driver-side state.
  */
object AggQueries extends QueryModule {

  override def queries: Map[String, QueryFn] = Map(
    // sum/count/min/max/avg/count-distinct battery per group.
    "agg_basic" -> ((s, d) => {
      events(s, d).groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value")).as("sum_v"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          avg(col("value")).as("avg_v"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // var/std sample+population.
    "agg_stats" -> ((s, d) => {
      events(s, d).groupBy(col("event_type"))
        .agg(
          var_samp(col("value")).as("var_s"),
          stddev_samp(col("value")).as("std_s"),
          var_pop(col("value")).as("var_p"),
          stddev_pop(col("value")).as("std_p"),
          covar_samp(col("value"), col("user_id").cast("double")).as("cov_s"),
          covar_pop(col("value"), col("user_id").cast("double")).as("cov_p"),
          corr(col("value"), col("user_id").cast("double")).as("corr_vu"))
    }),

    // skewness/kurtosis — Spark uses population (g1 / excess g2) formulas;
    // oracle recomputes the same moments explicitly.
    "agg_skew_kurt" -> ((s, d) => {
      events(s, d).groupBy(col("event_type"))
        .agg(skewness(col("value")).as("skew_v"), kurtosis(col("value")).as("kurt_v"))
    }),

    // idxmin/idxmax ≈ min_by/max_by with a unique ordering column.
    "agg_minmax_by" -> ((s, d) => {
      events(s, d).groupBy(col("event_type"))
        .agg(
          min_by(col("props"), col("event_id")).as("first_props"),
          max_by(col("props"), col("event_id")).as("last_props"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
    }),

    // count_if / boolor_agg / booland_agg / boolxor_agg.
    "agg_bool" -> ((s, d) => {
      events(s, d).groupBy(col("user_id"))
        .agg(
          sum(when(col("value") > 10.0, 1L).otherwise(0L)).as("n_big"),
          max(col("value") > 19.0).as("any_huge"),
          min(col("value") > 0.005).as("all_positive"),
          (sum(when(col("value") > 19.9, 1L).otherwise(0L)) === 1L).as("exactly_one_extreme"))
    }),

    // bitor/bitand/bitxor aggregates.
    "agg_bitops" -> ((s, d) => {
      events(s, d).groupBy(col("event_type"))
        .agg(
          expr("bit_or(event_id)").as("bor"),
          expr("bit_and(event_id)").as("band"),
          expr("bit_xor(event_id)").as("bxor"))
    }),

    // median / exact interpolated percentiles (distributed exact quantile,
    // bodo/libs/_quantile_alg.cpp → Spark `percentile`).
    "agg_percentiles" -> ((s, d) => {
      events(s, d).groupBy(col("event_type"))
        .agg(
          median(col("value")).as("med"),
          expr("percentile(value, 0.25)").as("p25"),
          expr("percentile(value, 0.9)").as("p90"))
    }),

    // mode with deterministic tie-break (smallest bucket wins), expressed as
    // count + window — the fused form of Bodo's `mode` ftype.
    "agg_mode" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counted = events(s, d)
        .groupBy(col("event_type"), round(col("value")).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(desc("cnt"), asc("bucket"))
      counted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_type"), col("bucket").as("mode_bucket"), col("cnt"))
    }),

    // nunique per day (multi-distinct in one aggregate).
    "agg_nunique" -> ((s, d) => {
      events(s, d).groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          count(lit(1)).as("n_events"))
    }),

    // listagg with ORDER BY (sorted, duplicates kept).
    "agg_listagg" -> ((s, d) => {
      events(s, d).filter(col("user_id") < 20)
        .groupBy(col("user_id"))
        .agg(concat_ws(",", sort_array(collect_list(col("event_type")))).as("types_cat"))
    }),

    // array_agg_distinct rendered stable (sorted, joined).
    "agg_array_distinct" -> ((s, d) => {
      events(s, d).groupBy(col("user_id"))
        .agg(concat_ws("|", sort_array(collect_set(col("event_type")))).as("distinct_types"))
    }),

    // ROLLUP with GROUPING() indicator.
    "agg_rollup" -> ((s, d) => {
      orders(s, d).rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("sum_price"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"))
    }),

    "agg_cube" -> ((s, d) => {
      lineitem(s, d).cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), avg(col("l_quantity")).as("avg_qty"))
    }),

    // Explicit GROUPING SETS through the SQL surface.
    "agg_grouping_sets" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("gs_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(1) AS n
          |FROM gs_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    }),

    // PIVOT: status → columns.
    "agg_pivot" -> ((s, d) => {
      orders(s, d).groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice")))
    }),

    // pandas pivot_table(margins=True, aggfunc=[sum, mean]) (ref
    // bodo/hiframes/dataframe_impl.py:4215-4537): multi-agg pivot with an
    // 'All' margin on BOTH axes — composed as one CUBE aggregation (the
    // four grouping sets (r,c),(r),(c),() in a single pass over lineitem,
    // Expand + one shuffle) followed by a first()-valued pivot of the
    // already-aggregated cells, so the fact table is scanned once and no
    // second aggregation pass runs. grouping() distinguishes the margin
    // rows from a genuine null key.
    "agg_pivot_margins" -> ((s, d) => {
      val cubed = lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          avg(col("l_extendedprice")).as("avg_price"),
          grouping(col("l_returnflag")).as("gr"),
          grouping(col("l_linestatus")).as("gc"))
        .select(
          when(col("gr") === 1, lit("All")).otherwise(col("l_returnflag")).as("rflag"),
          when(col("gc") === 1, lit("All")).otherwise(col("l_linestatus")).as("lstat"),
          col("sum_qty"), col("avg_price"))
      cubed.groupBy(col("rflag"))
        .pivot("lstat", Seq("F", "O", "All"))
        .agg(first(col("sum_qty")).as("sum_qty"), first(col("avg_price")).as("avg_price"))
    }),

    // pd.crosstab: the count-valued pivot (frequency table of two
    // categoricals) — same Expand-free pivot plan, count aggregate.
    "agg_crosstab" -> ((s, d) => {
      orders(s, d).groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // df.describe(): per-column count/mean/std/min/max, emitted LONG (one
    // row per metric-column pair) so the schema stays uniform-typed — the
    // same reshape summary() performs internally.
    "agg_describe" -> ((s, d) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val aggs = lineitem(s, d).agg(
        count(lit(1)).as("n"),
        cols.flatMap(c => Seq(
          avg(col(c)).as(s"mean_$c"), stddev_samp(col(c)).as(s"std_$c"),
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
      // reshape the single wide aggregate row by exploding an array of
      // per-column structs — lineitem is scanned and aggregated exactly
      // once (the union-of-selects form planned three full scans).
      val rows = cols.map { c =>
        struct(lit(c).as("column"), col("n"),
          col(s"mean_$c").as("mean"), col(s"std_$c").as("std"),
          col(s"min_$c").as("min"), col(s"max_$c").as("max"))
      }
      aggs.select(explode(array(rows: _*)).as("r")).select("r.*")
    }),

    // UNPIVOT / melt.
    "agg_unpivot" -> ((s, d) => {
      customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          (col("c_acctbal") * 0.5).as("half_bal"))
        .unpivot(Array(col("c_custkey")),
          Array(col("c_acctbal"), col("half_bal")), "metric", "val")
    }),

    // Whole-frame scalar reduction (describe-style).
    "agg_scalar_reduce" -> ((s, d) => {
      lineitem(s, d).agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        stddev_samp(col("l_extendedprice")).as("std_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        countDistinct(col("l_partkey")).as("n_parts"))
    }),

    // value_counts.
    "agg_value_counts" -> ((s, d) => {
      events(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("event_type"))
    }),

    // HAVING on aggregate.
    "agg_having" -> ((s, d) => {
      orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 20)
    })
  )

  override def oracle: Map[String, String] = Map(
    "agg_basic" ->
      """SELECT event_type, count(*) AS n, sum(value) AS sum_v, min(value) AS min_v,
        | max(value) AS max_v, avg(value) AS avg_v,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_stats" ->
      """SELECT event_type, var_samp(value) AS var_s, stddev_samp(value) AS std_s,
        | var_pop(value) AS var_p, stddev_pop(value) AS std_p,
        | covar_samp(value, CAST(user_id AS DOUBLE)) AS cov_s,
        | covar_pop(value, CAST(user_id AS DOUBLE)) AS cov_p,
        | corr(value, CAST(user_id AS DOUBLE)) AS corr_vu
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_skew_kurt" ->
      """WITH m AS (SELECT event_type, avg(value) AS mu, count(*) AS n FROM events GROUP BY event_type),
        | c AS (SELECT e.event_type,
        |   sum(pow(value - mu, 2)) AS m2, sum(pow(value - mu, 3)) AS m3,
        |   sum(pow(value - mu, 4)) AS m4, max(m.n) AS n
        |  FROM events e JOIN m ON e.event_type = m.event_type GROUP BY e.event_type)
        |SELECT event_type,
        |  (m3 / n) / pow(m2 / n, 1.5) AS skew_v,
        |  (m4 / n) / pow(m2 / n, 2.0) - 3.0 AS kurt_v
        |FROM c""".stripMargin,

    "agg_minmax_by" ->
      """SELECT event_type,
        | arg_min(props, event_id) AS first_props,
        | arg_max(props, event_id) AS last_props,
        | min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_bool" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN value > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        | bool_or(value > 19.0) AS any_huge,
        | bool_and(value > 0.005) AS all_positive,
        | (sum(CASE WHEN value > 19.9 THEN 1 ELSE 0 END) = 1) AS exactly_one_extreme
        |FROM events GROUP BY user_id""".stripMargin,

    "agg_bitops" ->
      """SELECT event_type, bit_or(event_id) AS bor, bit_and(event_id) AS band,
        | bit_xor(event_id) AS bxor
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_percentiles" ->
      """SELECT event_type, median(value) AS med,
        | quantile_cont(value, 0.25) AS p25, quantile_cont(value, 0.9) AS p90
        |FROM events GROUP BY event_type""".stripMargin,

    "agg_mode" ->
      """SELECT event_type, bucket AS mode_bucket, cnt FROM (
        | SELECT event_type, round(value) AS bucket, count(*) AS cnt,
        |   row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, round(value) ASC) AS rn
        | FROM events GROUP BY event_type, round(value))
        |WHERE rn = 1""".stripMargin,

    "agg_nunique" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(DISTINCT user_id) AS n_users,
        | count(DISTINCT event_type) AS n_types, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "agg_listagg" ->
      """SELECT user_id, string_agg(event_type, ',' ORDER BY event_type) AS types_cat
        |FROM events WHERE user_id < 20 GROUP BY user_id""".stripMargin,

    "agg_array_distinct" ->
      """SELECT user_id, string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS distinct_types
        |FROM events GROUP BY user_id""".stripMargin,

    "agg_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | sum(o_totalprice) AS sum_price,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, avg(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,

    "agg_pivot" ->
      """SELECT o_orderpriority,
        | sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS "F",
        | sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS "O",
        | sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "agg_pivot_margins" ->
      """WITH c AS (
        |  SELECT
        |    CASE WHEN GROUPING(l_returnflag) = 1 THEN 'All' ELSE l_returnflag END AS rflag,
        |    CASE WHEN GROUPING(l_linestatus) = 1 THEN 'All' ELSE l_linestatus END AS lstat,
        |    sum(l_quantity) AS sum_qty, avg(l_extendedprice) AS avg_price
        |  FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus))
        |SELECT rflag,
        |  max(CASE WHEN lstat = 'F' THEN sum_qty END) AS "F_sum_qty",
        |  max(CASE WHEN lstat = 'F' THEN avg_price END) AS "F_avg_price",
        |  max(CASE WHEN lstat = 'O' THEN sum_qty END) AS "O_sum_qty",
        |  max(CASE WHEN lstat = 'O' THEN avg_price END) AS "O_avg_price",
        |  max(CASE WHEN lstat = 'All' THEN sum_qty END) AS "All_sum_qty",
        |  max(CASE WHEN lstat = 'All' THEN avg_price END) AS "All_avg_price"
        |FROM c GROUP BY rflag""".stripMargin,

    "agg_crosstab" ->
      """SELECT o_orderpriority,
        | CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
        | CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
        | CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "agg_describe" ->
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    avg(l_quantity) AS mean_q, stddev_samp(l_quantity) AS std_q,
        |    min(l_quantity) AS min_q, max(l_quantity) AS max_q,
        |    avg(l_extendedprice) AS mean_p, stddev_samp(l_extendedprice) AS std_p,
        |    min(l_extendedprice) AS min_p, max(l_extendedprice) AS max_p,
        |    avg(l_discount) AS mean_d, stddev_samp(l_discount) AS std_d,
        |    min(l_discount) AS min_d, max(l_discount) AS max_d
        |  FROM lineitem)
        |SELECT 'l_quantity' AS "column", n, mean_q AS mean, std_q AS std, min_q AS min, max_q AS max FROM a
        |UNION ALL
        |SELECT 'l_extendedprice', n, mean_p, std_p, min_p, max_p FROM a
        |UNION ALL
        |SELECT 'l_discount', n, mean_d, std_d, min_d, max_d FROM a""".stripMargin,

    "agg_unpivot" ->
      """SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS val FROM customer
        |UNION ALL
        |SELECT c_custkey, 'half_bal' AS metric, c_acctbal * 0.5 AS val FROM customer""".stripMargin,

    "agg_scalar_reduce" ->
      """SELECT count(*) AS n, sum(l_quantity) AS sum_qty,
        | avg(l_extendedprice) AS avg_price, stddev_samp(l_extendedprice) AS std_price,
        | min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        | count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem""".stripMargin,

    "agg_value_counts" ->
      """SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
        |ORDER BY cnt DESC, event_type ASC""".stripMargin,

    "agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 20""".stripMargin
  )
}
