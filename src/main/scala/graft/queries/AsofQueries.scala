package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** As-of and interval joins (SURVEY.md §2.3 / §7.2-M6).
  *
  * Reference: bodo/ir/join.py:154,183 (`pd.merge_asof`, backward nearest
  * match on sorted keys), bodo/libs/_interval_join.cpp:30 (point-in-
  * interval join with equi pre-key).
  *
  * As-of composition (no driver-side sort-merge): tag-and-union both
  * sides, one window per by-group ordered by time with
  * `last(value, ignoreNulls)` over UNBOUNDED PRECEDING, keep probe rows.
  * Scale shape: a single hash-partition-by-user + in-partition sort —
  * exactly one shuffle, no point-vs-point product. The interval join
  * carries the equi key so Catalyst plans a hash join with the range
  * predicate as residual, never a nested loop over the fact table.
  * Oracle: DuckDB's native ASOF JOIN / range predicates.
  */
object AsofQueries extends QueryModule {

  override def queries: Map[String, QueryFn] = Map(
    // Backward as-of: for each purchase, the latest prior click (any lag)
    // of the same user; LEFT semantics (purchases with no prior click keep
    // nulls).
    "join_asof" -> ((s, d) => {
      val ev = events(s, d)
      val quotes = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("q_ts"), col("value").as("q_val"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      val tagged = quotes
        .select(col("user_id"), col("q_ts").as("t"), lit(0).as("is_probe"),
          lit(null).cast("long").as("event_id"), col("q_ts"), col("q_val"))
        .unionByName(probes
          .select(col("user_id"), col("p_ts").as("t"), lit(1).as("is_probe"),
            col("event_id"), lit(null).cast("timestamp").as("q_ts"),
            lit(null).cast("double").as("q_val")))
      // quote sorts before probe at equal t => t_quote <= t_probe matches.
      // q_val is the final tie-break: among several clicks at the same
      // instant, last() deterministically picks the max value — and the
      // oracle pre-aggregates its quote side to the same max, since ASOF
      // JOIN's choice among equal-timestamp quotes is unspecified.
      val w = Window.partitionBy("user_id").orderBy(col("t"), col("is_probe"), col("q_val"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("m_ts", last(col("q_ts"), ignoreNulls = true).over(w))
        .withColumn("m_val", last(col("q_val"), ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .select(col("event_id"), col("user_id"), col("t").as("p_ts"),
          col("m_ts"), col("m_val"))
    }),

    // Same backward as-of, through the native whole-operator path: logical
    // AsofJoin node -> AsofJoinStrategy -> AsofJoinExec streaming merge
    // (graft/plans/AsofJoin.scala). The quote side is pre-aggregated to one
    // row per (user, ts) — max(value) — because the backward match among
    // equal-timestamp quotes is otherwise unspecified, and the oracle does
    // the same. Plan shape: exactly one exchange per side, no window.
    "join_asof_native" -> ((s, d) => {
      val ev = events(s, d)
      val quotes = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("q_user"), col("ts").as("q_ts"))
        .agg(max(col("value")).as("q_val"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      graft.plans.Asof.join(probes, quotes, "user_id", "q_user", "p_ts", "q_ts")
        .select(col("event_id"), col("user_id"), col("p_ts"),
          col("q_ts").as("m_ts"), col("q_val").as("m_val"))
    }),

    // Multi-column by-groups through the native operator (merge_asof
    // by=['user','day']): the AsofJoin logical node takes key LISTS, so
    // the physical merge clusters and sorts on all key columns natively —
    // no struct-packing workaround. Here: latest SAME-DAY prior click per
    // purchase (the cross-day match that join_asof_native would emit must
    // come back null).
    "join_asof_native_bygroups" -> ((s, d) => {
      val ev = events(s, d)
      val quotes = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("q_user"), to_date(col("ts")).as("q_day"),
          col("ts").as("q_ts"))
        .agg(max(col("value")).as("q_val"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("p_day"),
          col("ts").as("p_ts"))
      graft.plans.Asof.joinBy(probes, quotes,
          Seq("user_id", "p_day"), Seq("q_user", "q_day"), "p_ts", "q_ts")
        .select(col("event_id"), col("user_id"), col("p_ts"),
          col("q_ts").as("m_ts"), col("q_val").as("m_val"))
    }),

    // Forward direction through the native operator (merge_asof
    // direction='forward'): earliest same-user click at-or-after each
    // purchase.
    "join_asof_fwd" -> ((s, d) => {
      val ev = events(s, d)
      val quotes = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("q_user"), col("ts").as("q_ts"))
        .agg(max(col("value")).as("q_val"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      graft.plans.Asof.join(probes, quotes, "user_id", "q_user", "p_ts", "q_ts",
          direction = "forward")
        .select(col("event_id"), col("user_id"), col("p_ts"),
          col("q_ts").as("m_ts"), col("q_val").as("m_val"))
    }),

    // Nearest direction (merge_asof direction='nearest'): the closer of
    // the latest prior and earliest later same-user click, backward
    // winning ties. Oracle: backward + forward DuckDB ASOF joins with the
    // distance comparison replayed.
    "join_asof_nearest" -> ((s, d) => {
      val ev = events(s, d)
      val quotes = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("q_user"), col("ts").as("q_ts"))
        .agg(max(col("value")).as("q_val"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      graft.plans.Asof.join(probes, quotes, "user_id", "q_user", "p_ts", "q_ts",
          direction = "nearest")
        .select(col("event_id"), col("user_id"), col("p_ts"),
          col("q_ts").as("m_ts"), col("q_val").as("m_val"))
    }),

    // Backward with a 1-hour tolerance (merge_asof tolerance=): a prior
    // click farther than an hour back nulls out instead of matching.
    "join_asof_tol" -> ((s, d) => {
      val ev = events(s, d)
      val quotes = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("q_user"), col("ts").as("q_ts"))
        .agg(max(col("value")).as("q_val"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
      graft.plans.Asof.join(probes, quotes, "user_id", "q_user", "p_ts", "q_ts",
          tolerance = Some(3600L * 1000000L)) // 1 hour in micros
        .select(col("event_id"), col("user_id"), col("p_ts"),
          col("q_ts").as("m_ts"), col("q_val").as("m_val"))
    }),

    // Keyless point-in-interval join, binned: without an equi key a range
    // join plans as a nested loop — O(n·m) and a scale-killer. Binning
    // manufactures the equi key: every interval explodes to its covering
    // 1-hour bins (<= 3 for a 2-hour window), every point belongs to
    // EXACTLY ONE bin, so the bin-equi hash join finds each qualifying
    // pair exactly once (no post-dedup) and the residual range predicate
    // filters within buckets. Plan-asserted no-NLJ in PlanShapeSpec. This
    // is the general interval-join answer when no natural key exists
    // (ref bodo/libs/_interval_join.cpp handles the same case natively).
    "join_interval_binned" -> ((s, d) => {
      val ev = events(s, d)
      val binSec = 3600L
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("iv_id"), col("ts").as("t0"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("t1"))
        .withColumn("bin", explode(sequence(
          floor(unix_timestamp(col("t0")) / binSec).cast("long"),
          floor(unix_timestamp(col("t1")) / binSec).cast("long"))))
      val pts = ev.filter(col("event_type") === "click")
        .select(col("ts").as("pt"), col("value"))
        .withColumn("bin", floor(unix_timestamp(col("pt")) / binSec).cast("long"))
      iv.join(pts, Seq("bin"))
        .filter(col("pt") >= col("t0") && col("pt") < col("t1"))
        .groupBy(col("iv_id"))
        .agg(count(lit(1)).as("n_hits"), sum(col("value")).as("sum_v"))
    }),

    // The same keyless point-in-interval join through the native
    // whole-operator path (plans/IntervalJoin.scala): the signup-interval
    // side travels through a real BroadcastExchange, probes binary-search
    // the sorted starts (O(log m) instead of O(m) per click), and the
    // click stream never shuffles. Same oracle as the binned variant.
    "join_interval_native" -> ((s, d) => {
      val ev = events(s, d)
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("iv_id"), col("ts").as("t0"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("t1"))
      val pts = ev.filter(col("event_type") === "click")
        .select(col("ts").as("pt"), col("value"))
      graft.plans.Interval.join(pts, iv, "pt", "t0", "t1")
        .groupBy(col("iv_id"))
        .agg(count(lit(1)).as("n_hits"), sum(col("value")).as("sum_v"))
    }),

    // LEFT point-in-interval join through the native operator (reference
    // parity: _interval_join.cpp restricts the operator to inner/left).
    // Clicks with no covering signup window survive with a null interval
    // side and land in the NULL iv_id group — the group row that proves
    // the outer semantics end-to-end.
    "join_interval_native_left" -> ((s, d) => {
      val ev = events(s, d)
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("iv_id"), col("ts").as("t0"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("t1"))
      val pts = ev.filter(col("event_type") === "click")
        .select(col("ts").as("pt"), col("value"))
      graft.plans.Interval.join(pts, iv, "pt", "t0", "t1", joinType = "left")
        .groupBy(col("iv_id"))
        .agg(count(lit(1)).as("n_hits"), sum(col("value")).as("sum_v"))
    }),

    // Interval-OVERLAP join through the same native operator (ref
    // _interval_join.cpp's interval-vs-interval case): every purchase's
    // 1-hour window against every signup's 2-hour window, matched when
    // the ranges intersect — the probe side streams, the signup intervals
    // broadcast, and the identical sorted-starts index answers overlap by
    // binary-searching on the probe's END and walking on its START.
    "join_interval_overlap" -> ((s, d) => {
      val ev = events(s, d)
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("iv_id"), col("ts").as("t0"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("t1"))
      val pr = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p0"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("p1"))
      graft.plans.Interval.joinOverlap(pr, iv, "p0", "p1", "t0", "t1")
        .groupBy(col("iv_id"))
        .agg(count(lit(1)).as("n_overlaps"), min(col("p_id")).as("first_p"))
    }),

    // Point-in-interval with equi pre-key: signups open a 2-hour window;
    // count same-user clicks inside it.
    "join_interval" -> ((s, d) => {
      val ev = events(s, d)
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("iv_id"), col("user_id"),
          col("ts").as("t0"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("t1"))
      val pts = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("u2"), col("ts").as("pt"), col("value"))
      iv.join(pts,
          col("user_id") === col("u2") && col("pt") >= col("t0") && col("pt") < col("t1"))
        .groupBy(col("iv_id"), col("user_id"))
        .agg(count(lit(1)).as("n_hits"), sum(col("value")).as("sum_v"))
    })
  )

  override def oracle: Map[String, String] = Map(
    // DuckDB native ASOF LEFT JOIN over the µs-truncated timestamps.
    "join_asof" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |q AS (SELECT user_id, ts AS q_ts, max(value) AS q_val
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.p_ts, q.q_ts AS m_ts, q.q_val AS m_val
        |FROM p ASOF LEFT JOIN q ON p.user_id = q.user_id AND p.p_ts >= q.q_ts""".stripMargin,

    "join_asof_native" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |q AS (SELECT user_id, ts AS q_ts, max(value) AS q_val
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.p_ts, q.q_ts AS m_ts, q.q_val AS m_val
        |FROM p ASOF LEFT JOIN q ON p.user_id = q.user_id AND p.p_ts >= q.q_ts""".stripMargin,

    "join_asof_native_bygroups" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |q AS (SELECT user_id, CAST(ts AS DATE) AS day, ts AS q_ts, max(value) AS q_val
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2, 3),
        |p AS (SELECT event_id, user_id, CAST(ts AS DATE) AS day, ts AS p_ts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.p_ts, q.q_ts AS m_ts, q.q_val AS m_val
        |FROM p ASOF LEFT JOIN q
        |  ON p.user_id = q.user_id AND p.day = q.day AND p.p_ts >= q.q_ts""".stripMargin,

    "join_asof_fwd" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |q AS (SELECT user_id, ts AS q_ts, max(value) AS q_val
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.p_ts, q.q_ts AS m_ts, q.q_val AS m_val
        |FROM p ASOF LEFT JOIN q ON p.user_id = q.user_id AND p.p_ts <= q.q_ts""".stripMargin,

    "join_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |q AS (SELECT user_id, ts AS q_ts, max(value) AS q_val
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase'),
        |b AS (SELECT p.event_id, q.q_ts, q.q_val
        |      FROM p ASOF LEFT JOIN q ON p.user_id = q.user_id AND p.p_ts >= q.q_ts),
        |f AS (SELECT p.event_id, q.q_ts, q.q_val
        |      FROM p ASOF LEFT JOIN q ON p.user_id = q.user_id AND p.p_ts <= q.q_ts)
        |SELECT p.event_id, p.user_id, p.p_ts,
        |  CASE WHEN f.q_ts IS NULL THEN b.q_ts
        |       WHEN b.q_ts IS NULL THEN f.q_ts
        |       WHEN p.p_ts - b.q_ts <= f.q_ts - p.p_ts THEN b.q_ts ELSE f.q_ts END AS m_ts,
        |  CASE WHEN f.q_ts IS NULL THEN b.q_val
        |       WHEN b.q_ts IS NULL THEN f.q_val
        |       WHEN p.p_ts - b.q_ts <= f.q_ts - p.p_ts THEN b.q_val ELSE f.q_val END AS m_val
        |FROM p
        |LEFT JOIN b ON p.event_id = b.event_id
        |LEFT JOIN f ON p.event_id = f.event_id""".stripMargin,

    "join_asof_tol" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |q AS (SELECT user_id, ts AS q_ts, max(value) AS q_val
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.p_ts,
        |  CASE WHEN p.p_ts - q.q_ts <= INTERVAL 1 HOUR THEN q.q_ts END AS m_ts,
        |  CASE WHEN p.p_ts - q.q_ts <= INTERVAL 1 HOUR THEN q.q_val END AS m_val
        |FROM p ASOF LEFT JOIN q ON p.user_id = q.user_id AND p.p_ts >= q.q_ts""".stripMargin,

    "join_interval_binned" ->
      """WITH e AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |iv AS (SELECT event_id AS iv_id, ts AS t0, ts + INTERVAL 2 HOUR AS t1
        |       FROM e WHERE event_type = 'signup'),
        |pt AS (SELECT ts AS pt, value FROM e WHERE event_type = 'click')
        |SELECT iv.iv_id, count(*) AS n_hits, sum(pt.value) AS sum_v
        |FROM iv JOIN pt ON pt.pt >= iv.t0 AND pt.pt < iv.t1
        |GROUP BY iv.iv_id""".stripMargin,

    "join_interval_native" ->
      """WITH e AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |iv AS (SELECT event_id AS iv_id, ts AS t0, ts + INTERVAL 2 HOUR AS t1
        |       FROM e WHERE event_type = 'signup'),
        |pt AS (SELECT ts AS pt, value FROM e WHERE event_type = 'click')
        |SELECT iv.iv_id, count(*) AS n_hits, sum(pt.value) AS sum_v
        |FROM iv JOIN pt ON pt.pt >= iv.t0 AND pt.pt < iv.t1
        |GROUP BY iv.iv_id""".stripMargin,

    "join_interval_native_left" ->
      """WITH e AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |iv AS (SELECT event_id AS iv_id, ts AS t0, ts + INTERVAL 2 HOUR AS t1
        |       FROM e WHERE event_type = 'signup'),
        |pt AS (SELECT ts AS pt, value FROM e WHERE event_type = 'click')
        |SELECT iv.iv_id, count(*) AS n_hits, sum(pt.value) AS sum_v
        |FROM pt LEFT JOIN iv ON pt.pt >= iv.t0 AND pt.pt < iv.t1
        |GROUP BY iv.iv_id""".stripMargin,

    // inclusive overlap: p0 <= t1 AND p1 >= t0
    "join_interval_overlap" ->
      """WITH e AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |iv AS (SELECT event_id AS iv_id, ts AS t0, ts + INTERVAL 2 HOUR AS t1
        |       FROM e WHERE event_type = 'signup'),
        |pr AS (SELECT event_id AS p_id, ts AS p0, ts + INTERVAL 1 HOUR AS p1
        |       FROM e WHERE event_type = 'purchase')
        |SELECT iv.iv_id, count(*) AS n_overlaps, min(pr.p_id) AS first_p
        |FROM iv JOIN pr ON iv.t0 <= pr.p1 AND iv.t1 >= pr.p0
        |GROUP BY iv.iv_id""".stripMargin,

    "join_interval" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events),
        |iv AS (SELECT event_id AS iv_id, user_id, ts AS t0, ts + INTERVAL 2 HOUR AS t1
        |       FROM e WHERE event_type = 'signup'),
        |pt AS (SELECT user_id AS u2, ts AS pt, value FROM e WHERE event_type = 'click')
        |SELECT iv.iv_id, iv.user_id, count(*) AS n_hits, sum(pt.value) AS sum_v
        |FROM iv JOIN pt ON iv.user_id = pt.u2 AND pt.pt >= iv.t0 AND pt.pt < iv.t1
        |GROUP BY iv.iv_id, iv.user_id""".stripMargin
  )
}
