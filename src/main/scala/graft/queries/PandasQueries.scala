package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.GraftImplicits._

/** pandas-Series veneer exercised end-to-end (VERDICT r7 missing #6: the
  * semantics all existed as column functions, but a pandas user had no
  * Series-shaped spelling). Every method here is the GraftImplicits
  * `.str` / `.dt` / numeric accessor or an ordered DataFrame helper —
  * pure delegation to codegen'd builtins, so these entries pin BOTH the
  * veneer's translation of pandas conventions (0-based slices, Monday=0
  * weekdays, sign-aware zfill, NULL-propagating where/mask) AND the
  * underlying kernel, against DuckDB.
  *
  * Reference surface: bodo/hiframes/series_str_impl.py,
  * series_dt_impl.py, series_impl.py (shift/diff/pct_change/cumsum/rank).
  */
object PandasQueries extends QueryModule {

  override def queries: Map[String, QueryFn] = Map(
    // .str accessor + element-wise numeric methods over part.
    "pandas_series_ops" -> ((s, d) => {
      val n = col("p_name")
      val k = col("p_partkey")
      part(s, d).filter(k % 9 === 0).select(
        k,
        n.str.len.as("s_len"),
        n.str.slice(2, 7).as("s_slice"),
        n.str.get(3).as("s_get"),
        n.str.capitalize.as("s_cap"),
        n.str.title.as("s_title"),
        n.str.containsPat("ro.e", regex = true).as("s_re"),
        n.str.containsPat("rose", regex = false).as("s_lit"),
        n.str.startswith("b").as("s_sw"),
        n.str.find("an").as("s_find"),
        n.str.countPat("[aeiou]").as("s_cnt"),
        n.str.extract("^([a-z]+)", 1).as("s_ext"),
        n.str.replaceAll("[aeiou]", "_").as("s_repl"),
        n.str.pad(30, "both", ".").as("s_center"),
        (k - 5000).cast("string").str.zfill(8).as("s_zfill"),
        n.str.isalpha.as("s_alpha"),
        col("p_brand").str.isupper.as("s_upper"),
        col("p_retailprice").clip(500.0, 1500.0).as("n_clip"),
        (k / 7.0).roundS(6).as("n_round"),
        (k % 7).betweenInc(2, 4).as("n_betw"),
        col("p_size").astype("double").floordiv(3).as("n_fdiv"),
        col("p_retailprice").whereS(col("p_size") > 25).as("n_where"),
        col("p_retailprice").maskS(col("p_size") > 25).as("n_mask"),
        (k % 5).isinS(0, 2).as("n_isin"),
        col("p_retailprice").whereS(col("p_size") > 25).fillna(0.0).as("n_fill"),
        col("p_retailprice").whereS(col("p_size") > 25).isna.as("n_isna"))
    }),

    // Ordered helpers (shift/diff/pct_change/cum*/rank) + .dt accessor
    // over orders, partitioned by customer so the windows shuffle on a
    // real key (never a global single-partition window).
    "pandas_frame_ops" -> ((s, d) => {
      val o = orders(s, d).filter(col("o_orderkey") % 5 === 0)
      val ord = Seq(col("o_orderkey"))
      val byCust = Seq(col("o_custkey"))
      val dt = col("o_orderdate")
      val p = col("o_totalprice")
      o.select(
        col("o_orderkey"), col("o_custkey"),
        o.shiftCol(p, ord, 1, byCust).as("w_shift"),
        o.shiftCol(p, ord, -1, byCust).as("w_lead"),
        o.diffCol(p, ord, 1, byCust).as("w_diff"),
        o.pctChangeCol(p, ord, byCust).as("w_pct"),
        o.cumsumCol(p, ord, byCust).as("w_csum"),
        o.cummaxCol(p, ord, byCust).as("w_cmax"),
        o.rankCol(p, "min", byCust).as("w_rank"),
        o.rankCol(p, "dense", byCust).as("w_drank"),
        dt.dt.year.as("d_y"),
        dt.dt.dayofweek.as("d_dow"),
        dt.dt.dayofyear.as("d_doy"),
        dt.dt.quarter.as("d_q"),
        dt.dt.daysinmonth.as("d_dim"),
        dt.dt.isMonthStart.as("d_ms"),
        dt.dt.isMonthEnd.as("d_me"),
        dt.dt.strftime("yyyy/MM").as("d_fmt"),
        dt.dt.normalize.as("d_norm"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "pandas_series_ops" ->
      """WITH p AS (
        |  SELECT p_partkey AS k, p_name AS n, p_brand, p_size, p_retailprice
        |  FROM part WHERE p_partkey % 9 = 0)
        |SELECT k AS p_partkey,
        |  CAST(length(n) AS INTEGER) AS s_len,
        |  substr(n, 3, 5) AS s_slice,
        |  substr(n, 4, 1) AS s_get,
        |  upper(substr(n, 1, 1)) || lower(substr(n, 2)) AS s_cap,
        |  list_aggregate(list_transform(string_split(n, ' '),
        |    w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))),
        |    'string_agg', ' ') AS s_title,
        |  regexp_matches(n, 'ro.e') AS s_re,
        |  contains(n, 'rose') AS s_lit,
        |  n LIKE 'b%' AS s_sw,
        |  CAST(position('an' IN n) - 1 AS INTEGER) AS s_find,
        |  CAST(len(regexp_extract_all(n, '[aeiou]')) AS INTEGER) AS s_cnt,
        |  regexp_extract(n, '^([a-z]+)', 1) AS s_ext,
        |  regexp_replace(n, '[aeiou]', '_', 'g') AS s_repl,
        |  CASE WHEN length(n) >= 30 THEN n
        |       ELSE repeat('.', CAST((30 - length(n)) // 2 AS INTEGER)) || n ||
        |            repeat('.', CAST(30 - length(n) - (30 - length(n)) // 2 AS INTEGER))
        |  END AS s_center,
        |  CASE WHEN (k - 5000) < 0
        |       THEN '-' || lpad(CAST(-(k - 5000) AS VARCHAR), 7, '0')
        |       ELSE lpad(CAST(k - 5000 AS VARCHAR), 8, '0') END AS s_zfill,
        |  regexp_matches(n, '^[A-Za-z]+$') AS s_alpha,
        |  p_brand = upper(p_brand) AND regexp_matches(p_brand, '[A-Za-z]') AS s_upper,
        |  greatest(least(p_retailprice, 1500.0), 500.0) AS n_clip,
        |  round(k / 7.0, 6) AS n_round,
        |  (k % 7) BETWEEN 2 AND 4 AS n_betw,
        |  CAST(floor(CAST(p_size AS DOUBLE) / 3) AS BIGINT) AS n_fdiv,
        |  CASE WHEN p_size > 25 THEN p_retailprice END AS n_where,
        |  CASE WHEN NOT (p_size > 25) THEN p_retailprice END AS n_mask,
        |  (k % 5) IN (0, 2) AS n_isin,
        |  coalesce(CASE WHEN p_size > 25 THEN p_retailprice END, 0.0) AS n_fill,
        |  (CASE WHEN p_size > 25 THEN p_retailprice END) IS NULL AS n_isna
        |FROM p""".stripMargin,

    "pandas_frame_ops" ->
      """WITH o AS (
        |  SELECT * FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT o_orderkey, o_custkey,
        |  lag(o_totalprice) OVER w AS w_shift,
        |  lead(o_totalprice) OVER w AS w_lead,
        |  o_totalprice - lag(o_totalprice) OVER w AS w_diff,
        |  (o_totalprice - lag(o_totalprice) OVER w) / lag(o_totalprice) OVER w AS w_pct,
        |  sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w_csum,
        |  max(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w_cmax,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS INTEGER) AS w_rank,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS INTEGER) AS w_drank,
        |  CAST(year(o_orderdate) AS INTEGER) AS d_y,
        |  CAST((dayofweek(o_orderdate) + 6) % 7 AS INTEGER) AS d_dow,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS d_doy,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS d_q,
        |  CAST(day(last_day(o_orderdate)) AS INTEGER) AS d_dim,
        |  day(o_orderdate) = 1 AS d_ms,
        |  day(o_orderdate) = day(last_day(o_orderdate)) AS d_me,
        |  strftime(o_orderdate, '%Y/%m') AS d_fmt,
        |  CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d_norm
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin
  )
}
