package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Window functions — SURVEY.md §2.5: the Calcite dispatch inventory
  * (BodoSQL .../window/WindowAggregateApplyFuncTable.kt:25-80), lead/lag
  * (bodo/libs/_lead_lag.cpp), streaming window state
  * (bodo/libs/streaming/_window.h:41), Snowflake specials
  * (RATIO_TO_REPORT / CONDITIONAL_TRUE_EVENT / CONDITIONAL_CHANGE_EVENT),
  * MIN_ROW_NUMBER_FILTER (QUALIFY fusion, MinRowNumberFilterRule.java),
  * pandas rolling (bodo/hiframes/rolling.py:28).
  *
  * Scale notes: every window partitions on a real key (user_id/event_type)
  * → one hash shuffle, per-partition sort, no global sort. The qualify-style
  * rn=1 filter plans through Spark's WindowGroupLimit (verified in tests).
  */
object WindowQueries extends QueryModule {

  private def ev(s: SparkSession, d: String) = events(s, d)

  override def queries: Map[String, QueryFn] = Map(
    // Ranking family under ties (ORDER BY value only — rank semantics).
    "win_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(desc("value"))
      ev(s, d).filter(col("user_id") < 50)
        .select(col("event_id"), col("event_type"), col("value"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
    }),

    // row_number / ntile with a fully deterministic order.
    "win_rownum" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(desc("value"), asc("event_id"))
      ev(s, d).filter(col("user_id") < 50)
        .select(col("event_id"), col("event_type"),
          row_number().over(w).as("rn"),
          ntile(4).over(w).as("quartile"))
    }),

    // Navigation: lead/lag with offset+default, first/last/nth over full frame.
    "win_nav" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev(s, d).filter(col("user_id") < 30)
        .select(col("user_id"), col("event_id"),
          lag(col("value"), 1, -1.0).over(w).as("prev_v"),
          lead(col("value"), 2).over(w).as("next2_v"),
          first(col("event_type")).over(full).as("first_type"),
          last(col("event_type")).over(full).as("last_type"),
          nth_value(col("value"), 3).over(full).as("third_v"))
    }),

    // Ignore-nulls navigation (ref bodo/libs/_lead_lag.cpp — the dedicated
    // 742-LoC kernel exists precisely for the respect/ignore-nulls axis):
    // lag/lead skip null values, first/last take the first/last NON-null
    // of the partition. The oracle emulates with arg_max/arg_min FILTER
    // windows over a precomputed row_number (DuckDB 1.0 has no IGNORE
    // NULLS syntax), so determinism needs the explicit rn order key.
    "win_nav_ignore_nulls" -> ((s, d) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      val before = w.rowsBetween(Window.unboundedPreceding, -1)
      val after = w.rowsBetween(1, Window.unboundedFollowing)
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev(s, d).filter(col("user_id") < 30)
        .withColumn("rn", row_number().over(byTs).cast("long"))
        .withColumn("v", when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
        .select(col("user_id"), col("rn"), col("v"),
          lag(col("v"), 1, null, true).over(w).as("prev_nn"),
          lead(col("v"), 1, null, true).over(w).as("next_nn"),
          first(col("v"), ignoreNulls = true).over(full).as("first_nn"),
          last(col("v"), ignoreNulls = true).over(full).as("last_nn"))
      // lag/lead defaults stay null; `before`/`after` frames are what the
      // oracle's arg_max/arg_min FILTER replicate
    }),

    // pandas NA-handling family over a per-user time series (ref
    // bodo/hiframes/series_impl.py fillna/ffill/bfill/diff/pct_change/clip
    // overloads): ffill/bfill are ignore-nulls running last/first, fillna
    // with the group mean is coalesce against a partition aggregate, and
    // diff/pct_change are lag arithmetic — all inside the same two-key
    // window, one shuffle total.
    "win_pandas_fill" -> ((s, d) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      val ff = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val grp = Window.partitionBy(col("user_id"))
      val lag1 = lag(col("v"), 1).over(w)
      ev(s, d).filter(col("user_id") < 30)
        .withColumn("rn", row_number().over(byTs).cast("long"))
        .withColumn("v", when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
        .select(col("user_id"), col("rn"), col("v"),
          last(col("v"), ignoreNulls = true).over(ff).as("ffill"),
          first(col("v"), ignoreNulls = true).over(bf).as("bfill"),
          (col("v") - lag1).as("diff1"),
          ((col("v") - lag1) / nullif(lag1, lit(0.0))).as("pct_change"),
          least(greatest(col("value"), lit(25.0)), lit(75.0)).as("clipped"),
          coalesce(col("v"), avg(col("v")).over(grp)).as("fill_mean"))
    }),

    // Linear interpolation of interior null runs (pandas
    // Series.interpolate): bracket each null with the nearest non-null
    // on both sides — running max/arg_max of (rn, v) over the preceding
    // frame, min/arg_min over the following — then one row-local linear
    // blend. Leading nulls stay null; trailing nulls carry the last
    // known value. Same one-shuffle window as the fill family.
    "win_interpolate" -> ((s, d) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      val ff = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val nnRn = when(col("v").isNotNull, col("rn"))
      val interp = when(col("v").isNotNull, col("v"))
        .when(col("prn").isNull, lit(null))
        .when(col("nrn").isNull, col("pv"))
        .otherwise(col("pv") +
          (col("nv") - col("pv")) * (col("rn") - col("prn")) / (col("nrn") - col("prn")))
      ev(s, d).filter(col("user_id") < 30)
        .withColumn("rn", row_number().over(byTs).cast("long"))
        .withColumn("v", when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(ff))
        .withColumn("prn", max(nnRn).over(ff))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(bf))
        .withColumn("nrn", min(nnRn).over(bf))
        .select(col("user_id"), col("rn"), col("v"), interp.as("v_interp"))
    }),

    // Framed aggregates: running + moving (ROWS frames).
    "win_frames" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d).filter(col("user_id") < 30)
        .select(col("user_id"), col("event_id"),
          sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run_sum"),
          min(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run_min"),
          max(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run_max"),
          avg(col("value")).over(w.rowsBetween(-3, 0)).as("mavg4"),
          count(lit(1)).over(w.rowsBetween(-3, 0)).as("mcount4"))
    }),

    // RANGE frame over a numeric key (value-based window).
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rangeBetween(-100L, 0L)
      ev(s, d).filter(col("user_id") < 30)
        .select(col("event_id"), col("event_type"),
          sum(col("value")).over(w).as("range_sum"),
          count(lit(1)).over(w).as("range_n"))
    }),

    // Time-based rolling window (pandas rolling w/ time offset): 1h sum.
    "win_time_range" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(unix_millis(col("ts")))
        .rangeBetween(-3600000L, 0L)
      ev(s, d).filter(col("user_id") < 30)
        .select(col("user_id"), col("event_id"),
          sum(col("value")).over(w).as("hour_sum"),
          count(lit(1)).over(w).as("hour_n"))
    }),

    // Snowflake specials composed from primitives.
    "win_snowflake_specials" -> ((s, d) => {
      val part = Window.partitionBy(col("event_type"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d).filter(col("user_id") < 30)
        .select(col("user_id"), col("event_id"),
          (col("value") / sum(col("value")).over(part)).as("ratio_to_report"),
          sum(when(col("value") > 10.0, 1L).otherwise(0L)).over(run).as("cond_true_event"),
          sum(coalesce(
            (col("event_type") =!= lag(col("event_type"), 1)
              .over(Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
              .cast("long"), lit(0L))).over(run).as("cond_change_event"))
    }),

    // QUALIFY row_number()=1 — latest event per user (WindowGroupLimit path).
    "win_qualify" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(desc("ts"), desc("event_id"))
      ev(s, d).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
    }),

    // Per-group top-N (rank <= 3).
    "win_topn_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(desc("value"), asc("event_id"))
      ev(s, d).withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("event_type"), col("rn"), col("event_id"), col("value"))
    }),

    // Rolling covariance/correlation (pandas rolling.cov/corr) — expressed
    // via explicit co-moment sums so 1-row frames yield NULL (not an ANSI
    // divide-by-zero) and both engines evaluate the identical formula.
    "win_rolling_stats" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(-10, 0)
      val x = col("value")
      val y = col("user_id").cast("double")
      val n = count(lit(1)).over(w).cast("double")
      val sx = sum(x).over(w); val sy = sum(y).over(w)
      val sxx = sum(x * x).over(w); val syy = sum(y * y).over(w)
      val sxy = sum(x * y).over(w)
      val d1 = n * sxx - sx * sx; val d2 = n * syy - sy * sy
      ev(s, d).filter(col("user_id") < 20)
        .select(col("event_id"), col("event_type"),
          when(n > 1.0, (sxy - sx * sy / n) / (n - 1.0)).as("roll_cov"),
          when(d1 > 0.0 && d2 > 0.0,
            (n * sxy - sx * sy) / (sqrt(d1) * sqrt(d2))).as("roll_corr"),
          when(n > 1.0, sqrt((sxx - sx * sx / n) / (n - 1.0))).as("roll_std"))
    }),

    // Second rolling battery: the windowed_* kernel family the reference
    // ships beyond plain sum/avg (window_agg_array_kernels.py:
    // windowed_median/mode:  exact per-frame; windowed_count_if,
    // windowed_booland/boolor at :364, boolxor = "true_count == 1" at
    // :370; windowed bit aggregates; windowed_skew/kurtosis). Skew and
    // excess kurtosis come from RUNNING POWER SUMS over the frame —
    // O(1) per row through Spark's sliding-frame sum, not an O(frame)
    // imperative recompute — with the sample (pandas/Snowflake) formulas
    // applied arithmetically; the oracle runs the identical arithmetic.
    // Mode is emitted only on full 5-row frames of a two-valued input
    // (odd count -> the mode is provably unique, so both engines agree).
    "win_rolling_stats2" -> ((s, d) => {
      // ordered by event_id alone: ts is ns in the oracle engine and µs
      // here, so a ts sort could tie-break differently across engines
      val ord = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val w9 = ord.rowsBetween(-8, 0)
      val w5 = ord.rowsBetween(-4, 0)
      val x = col("value")
      val b = (col("event_id") % 2).cast("int")
      val n = count(lit(1)).over(w9).cast("double")
      val s1 = sum(x).over(w9); val s2 = sum(x * x).over(w9)
      val s3 = sum(x * x * x).over(w9); val s4 = sum(x * x * x * x).over(w9)
      val m = s1 / n
      val m2 = s2 / n - m * m
      val m3 = s3 / n - lit(3.0) * m * s2 / n + lit(2.0) * m * m * m
      val m4 = s4 / n - lit(4.0) * m * s3 / n +
        lit(6.0) * m * m * s2 / n - lit(3.0) * m * m * m * m
      val trues = sum(when(x > 50.0, 1L).otherwise(0L)).over(w9)
      // Spark refuses median()/mode() with a window FRAME
      // (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the exact frame
      // median comes from a sorted collect_list (O(frame log frame) per
      // row — frame is a constant 9) and the two-valued mode from the
      // frame's true-count (odd full frame -> majority IS the mode).
      val lst = sort_array(collect_list(x).over(w9))
      val cnt = size(lst)
      val medLo = element_at(lst, ((cnt + 1) / 2).cast("int"))
      val medHi = element_at(lst, (cnt / 2).cast("int") + 1)
      val trues5 = sum(b.cast("long")).over(w5)
      ev(s, d).filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          ((medLo + medHi) / 2.0).as("roll_median"),
          when(row_number().over(ord) >= 5,
            when(trues5 * 2 > 5, 1).otherwise(0)).as("roll_mode"),
          trues.as("roll_countif"),
          (trues > 0L).as("roll_boolor"),
          (trues === count(lit(1)).over(w9)).as("roll_booland"),
          (trues === 1L).as("roll_boolxor"),
          bit_and((col("event_id") % 256).cast("int")).over(w5).as("roll_bitand"),
          bit_or((col("event_id") % 256).cast("int")).over(w5).as("roll_bitor"),
          bit_xor((col("event_id") % 256).cast("int")).over(w5).as("roll_bitxor"),
          when(n >= 3.0 && m2 > 1e-12,
            sqrt(n * (n - 1.0)) / (n - 2.0) * m3 / pow(m2, 1.5)).as("roll_skew"),
          when(n >= 4.0 && m2 > 1e-12,
            (n - 1.0) / ((n - 2.0) * (n - 3.0)) *
              ((n + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0)).as("roll_kurt"))
    }),

    // Windowed percentiles (window_agg_array_kernels.py:
    // windowed_approx_percentile + the MEDIAN window kernel): exact
    // interpolated percentile over the whole partition (the reference's
    // OVER (PARTITION BY) shape) and over a sliding rows frame. The
    // whole-partition variant is deliberately NOT a WindowExec:
    // event_type is a low-cardinality key, so OVER (PARTITION BY
    // event_type) buffers a handful of giant partitions at 100× scale
    // (r8 VERDICT "what's wrong" #1). Same semantics as two narrow ops
    // instead: groupBy(event_type).percentile + a broadcast join-back —
    // the grouped agg is map-side-combined and the per-key result is
    // tiny by construction. The frame variant keeps WindowExec (bounded
    // 11-row frames stream fine). The approximate variant (t-digest
    // percentile_approx) is pinned against the exact kernel in
    // FunctionsSpec — sketch outputs have no DuckDB oracle.
    "win_percentile" -> ((s, d) => {
      val frame = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(-5, 5)
      val base = ev(s, d).filter(col("user_id") < 40)
      val perKey = base.groupBy(col("event_type").as("pct_key"))
        .agg(expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"))
      base
        .select(col("event_id"), col("event_type"),
          expr("percentile(value, 0.5)").over(frame).as("roll_med"))
        // null-safe: a null event_type is its own window partition, so the
        // join-back must match it too or those rows vanish (r9 ADVICE #2)
        .join(broadcast(perKey), col("event_type") <=> col("pct_key"))
        .select(col("event_id"), col("event_type"),
          col("p50"), col("p90"), col("roll_med"))
    }),

    // groupby.cum* family (cumsum/cummax/cummin + cumprod via exp∘sum∘ln).
    "win_cumulative" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d).filter(col("user_id") < 30)
        .select(col("user_id"), col("event_id"),
          sum(col("value")).over(w).as("cumsum"),
          max(col("value")).over(w).as("cummax"),
          min(col("value")).over(w).as("cummin"),
          exp(sum(log(lit(1.0) + col("value") / 1000.0)).over(w)).as("cumprod1p"))
    }),

    // The same 10-minute-gap sessionization through Spark's NATIVE
    // session_window operator (the merging-session aggregate Structured
    // Streaming also uses) — one hash shuffle on the user key, sessions
    // merged inside the aggregate, no window-function pass at all. The
    // oracle replays the gap/cumulative-sum definition, which is the
    // session_window semantic: end = last event + gap.
    "win_session_native" -> ((s, d) => {
      ev(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
        .select(col("user_id"),
          col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("n_events"), col("session_value"))
    }),

    // Sessionization: 10-minute inactivity gap starts a new session.
    "win_sessionize" -> ((s, d) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gap = (unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(byTs)) > 600000L
      ev(s, d)
        .withColumn("new_sess", coalesce(gap.cast("long"), lit(0L)))
        .withColumn("session_idx", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "win_pandas_fill" ->
      """WITH b AS (
        |  SELECT user_id, value,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS BIGINT) AS rn,
        |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id < 30)
        |SELECT user_id, rn, v,
        |  arg_max(v, rn) FILTER (WHERE v IS NOT NULL) OVER
        |    (PARTITION BY user_id ORDER BY rn
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
        |  arg_min(v, rn) FILTER (WHERE v IS NOT NULL) OVER
        |    (PARTITION BY user_id ORDER BY rn
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill,
        |  v - lag(v) OVER w AS diff1,
        |  (v - lag(v) OVER w) / nullif(lag(v) OVER w, 0.0) AS pct_change,
        |  least(greatest(value, 25.0), 75.0) AS clipped,
        |  coalesce(v, avg(v) OVER (PARTITION BY user_id)) AS fill_mean
        |FROM b
        |WINDOW w AS (PARTITION BY user_id ORDER BY rn)""".stripMargin,

    "win_interpolate" ->
      """WITH b AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS BIGINT) AS rn,
        |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id < 30),
        |c AS (
        |  SELECT user_id, rn, v,
        |    arg_max(v, rn) FILTER (WHERE v IS NOT NULL) OVER pre AS pv,
        |    max(CASE WHEN v IS NOT NULL THEN rn END) OVER pre AS prn,
        |    arg_min(v, rn) FILTER (WHERE v IS NOT NULL) OVER post AS nv,
        |    min(CASE WHEN v IS NOT NULL THEN rn END) OVER post AS nrn
        |  FROM b
        |  WINDOW
        |    pre AS (PARTITION BY user_id ORDER BY rn
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    post AS (PARTITION BY user_id ORDER BY rn
        |             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, rn, v,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN prn IS NULL THEN NULL
        |       WHEN nrn IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (rn - prn) / (nrn - prn) END AS v_interp
        |FROM c""".stripMargin,

    "win_nav_ignore_nulls" ->
      """WITH b AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS BIGINT) AS rn,
        |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id < 30)
        |SELECT user_id, rn, v,
        |  arg_max(v, rn) FILTER (WHERE v IS NOT NULL) OVER
        |    (PARTITION BY user_id ORDER BY rn
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_nn,
        |  arg_min(v, rn) FILTER (WHERE v IS NOT NULL) OVER
        |    (PARTITION BY user_id ORDER BY rn
        |     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_nn,
        |  arg_min(v, rn) FILTER (WHERE v IS NOT NULL) OVER
        |    (PARTITION BY user_id ORDER BY rn
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_nn,
        |  arg_max(v, rn) FILTER (WHERE v IS NOT NULL) OVER
        |    (PARTITION BY user_id ORDER BY rn
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_nn
        |FROM b""".stripMargin,

    "win_rank" ->
      """SELECT event_id, event_type, value,
        | CAST(rank() OVER w AS INT) AS rnk,
        | CAST(dense_rank() OVER w AS INT) AS drnk,
        | percent_rank() OVER w AS prnk,
        | cume_dist() OVER w AS cdist
        |FROM events WHERE user_id < 50
        |WINDOW w AS (PARTITION BY event_type ORDER BY value DESC)""".stripMargin,

    "win_rownum" ->
      """SELECT event_id, event_type,
        | CAST(row_number() OVER w AS INT) AS rn,
        | CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM events WHERE user_id < 50
        |WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)""".stripMargin,

    "win_nav" ->
      """SELECT user_id, event_id,
        | lag(value, 1, -1.0) OVER w AS prev_v,
        | lead(value, 2) OVER w AS next2_v,
        | first_value(event_type) OVER wf AS first_type,
        | last_value(event_type) OVER wf AS last_type,
        | nth_value(value, 3) OVER wf AS third_v
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        | wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "win_frames" ->
      """SELECT user_id, event_id,
        | sum(value) OVER wr AS run_sum,
        | min(value) OVER wr AS run_min,
        | max(value) OVER wr AS run_max,
        | avg(value) OVER wm AS mavg4,
        | count(*) OVER wm AS mcount4
        |FROM events WHERE user_id < 30
        |WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        | wm AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    "win_range_frame" ->
      """SELECT event_id, event_type,
        | sum(value) OVER w AS range_sum,
        | count(*) OVER w AS range_n
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |        RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)""".stripMargin,

    "win_time_range" ->
      """SELECT user_id, event_id,
        | sum(value) OVER w AS hour_sum,
        | count(*) OVER w AS hour_n
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |        RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "win_snowflake_specials" ->
      """WITH b AS (
        | SELECT user_id, event_id, ts, value,
        |   value / sum(value) OVER (PARTITION BY event_type) AS ratio_to_report,
        |   CASE WHEN value > 10.0 THEN 1 ELSE 0 END AS is_true,
        |   COALESCE(CAST(event_type <> lag(event_type, 1) OVER
        |     (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT), 0) AS chg
        | FROM events WHERE user_id < 30)
        |SELECT user_id, event_id, ratio_to_report,
        | CAST(sum(is_true) OVER run AS BIGINT) AS cond_true_event,
        | CAST(sum(chg) OVER run AS BIGINT) AS cond_change_event
        |FROM b
        |WINDOW run AS (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "win_qualify" ->
      """SELECT user_id, event_id, event_type, value FROM (
        | SELECT user_id, event_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,

    "win_topn_per_group" ->
      """SELECT event_type, CAST(rn AS INT) AS rn, event_id, value FROM (
        | SELECT event_type, event_id, value,
        |   row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
        | FROM events) WHERE rn <= 3""".stripMargin,

    "win_rolling_stats" ->
      """WITH b AS (
        | SELECT event_id, event_type,
        |  CAST(count(*) OVER w AS DOUBLE) AS n,
        |  sum(value) OVER w AS sx,
        |  sum(CAST(user_id AS DOUBLE)) OVER w AS sy,
        |  sum(value * value) OVER w AS sxx,
        |  sum(CAST(user_id AS DOUBLE) * CAST(user_id AS DOUBLE)) OVER w AS syy,
        |  sum(value * CAST(user_id AS DOUBLE)) OVER w AS sxy
        | FROM events WHERE user_id < 20
        | WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |        ROWS BETWEEN 10 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type,
        | CASE WHEN n > 1.0 THEN (sxy - sx * sy / n) / (n - 1.0) END AS roll_cov,
        | CASE WHEN (n * sxx - sx * sx) > 0.0 AND (n * syy - sy * sy) > 0.0
        |   THEN (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) END AS roll_corr,
        | CASE WHEN n > 1.0 THEN sqrt((sxx - sx * sx / n) / (n - 1.0)) END AS roll_std
        |FROM b""".stripMargin,

    "win_rolling_stats2" ->
      """WITH b AS (
        | SELECT user_id, event_id, value,
        |  CAST(event_id % 2 AS INTEGER) AS bv,
        |  CAST(count(*) OVER w9 AS DOUBLE) AS n,
        |  sum(value) OVER w9 AS s1,
        |  sum(value * value) OVER w9 AS s2,
        |  sum(value * value * value) OVER w9 AS s3,
        |  sum(value * value * value * value) OVER w9 AS s4,
        |  sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) OVER w9 AS trues,
        |  CAST(count(*) OVER w9 AS BIGINT) AS cnt,
        |  median(value) OVER w9 AS roll_median,
        |  CAST(row_number() OVER ord AS BIGINT) AS rn,
        |  CAST(mode(CAST(event_id % 2 AS INTEGER)) OVER w5 AS INTEGER) AS md5,
        |  CAST(bit_and(CAST(event_id % 256 AS INTEGER)) OVER w5 AS INTEGER) AS roll_bitand,
        |  CAST(bit_or(CAST(event_id % 256 AS INTEGER)) OVER w5 AS INTEGER) AS roll_bitor,
        |  CAST(bit_xor(CAST(event_id % 256 AS INTEGER)) OVER w5 AS INTEGER) AS roll_bitxor
        | FROM events WHERE user_id < 20
        | WINDOW
        |  ord AS (PARTITION BY user_id ORDER BY event_id),
        |  w9 AS (PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
        |  w5 AS (PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |c AS (
        | SELECT *, s1 / n AS m,
        |  s2 / n - (s1 / n) * (s1 / n) AS m2,
        |  s3 / n - 3.0 * (s1 / n) * s2 / n + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |  s4 / n - 4.0 * (s1 / n) * s3 / n + 6.0 * (s1 / n) * (s1 / n) * s2 / n
        |    - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        | FROM b)
        |SELECT user_id, event_id, roll_median,
        | CASE WHEN rn >= 5 THEN md5 END AS roll_mode,
        | CAST(trues AS BIGINT) AS roll_countif,
        | trues > 0 AS roll_boolor,
        | trues = cnt AS roll_booland,
        | trues = 1 AS roll_boolxor,
        | roll_bitand, roll_bitor, roll_bitxor,
        | CASE WHEN n >= 3.0 AND m2 > 1e-12
        |   THEN sqrt(n * (n - 1.0)) / (n - 2.0) * m3 / pow(m2, 1.5) END AS roll_skew,
        | CASE WHEN n >= 4.0 AND m2 > 1e-12
        |   THEN (n - 1.0) / ((n - 2.0) * (n - 3.0)) *
        |        ((n + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0) END AS roll_kurt
        |FROM c""".stripMargin,

    "win_percentile" ->
      """SELECT event_id, event_type,
        | quantile_cont(value, 0.5) OVER (PARTITION BY event_type) AS p50,
        | quantile_cont(value, 0.9) OVER (PARTITION BY event_type) AS p90,
        | quantile_cont(value, 0.5) OVER f AS roll_med
        |FROM events WHERE user_id < 40
        |WINDOW f AS (PARTITION BY event_type ORDER BY event_id
        |        ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)""".stripMargin,

    "win_cumulative" ->
      """SELECT user_id, event_id,
        | sum(value) OVER w AS cumsum,
        | max(value) OVER w AS cummax,
        | min(value) OVER w AS cummin,
        | exp(sum(ln(1.0 + value / 1000.0)) OVER w) AS cumprod1p
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "win_session_native" ->
      """WITH e AS (
        | SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |g AS (
        | SELECT user_id, ts, value,
        |   COALESCE(CAST(ts - lag(ts, 1) OVER
        |     (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 10 MINUTE
        |     AS BIGINT), 0) AS new_sess,
        |   event_id
        | FROM e),
        |s AS (
        | SELECT user_id, ts, value, sum(new_sess) OVER
        |   (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM g)
        |SELECT user_id, min(ts) AS s_start,
        |  max(ts) + INTERVAL 10 MINUTE AS s_end,
        |  count(*) AS n_events, sum(value) AS session_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "win_sessionize" ->
      """WITH g AS (
        | SELECT user_id, event_id, ts, value,
        |   COALESCE(CAST((epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER
        |     (PARTITION BY user_id ORDER BY ts, event_id)) > 600000 AS BIGINT), 0) AS new_sess
        | FROM events),
        | s AS (
        | SELECT user_id, value, CAST(sum(new_sess) OVER
        |   (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        | FROM g)
        |SELECT user_id, session_idx, count(*) AS n_events, sum(value) AS session_value
        |FROM s GROUP BY user_id, session_idx""".stripMargin
  )
}
