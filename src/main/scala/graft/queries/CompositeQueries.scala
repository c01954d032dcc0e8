package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.Tables._

/** TPCx-BB-style composite workloads (r9 VERDICT item 1): each entry fuses
  * three or more operator families — text-quality gating, sessionization
  * windows, as-of/equi joins, dedup, datetime kernels, pivoted aggregation —
  * into ONE plan, the way the reference runs whole TPCx-BB queries as single
  * correctness tests (BodoSQL/bodosql/tests/test_tpcxbb_first_half.py,
  * test_tpcxbb_q01/q06/q09/q12). The point is compositional correctness:
  * the per-family entries prove each operator alone; these prove the
  * families compose in a single Catalyst plan without semantic drift.
  *
  * Scale notes apply per entry below; the common rules: the documents side
  * of every events⋈documents join is broadcast (dimension-sized after the
  * gate), sessionization shuffles once on user_id and every later
  * aggregation either reuses that partitioning or is map-side combined,
  * and no entry materializes a whole-partition (unbounded-frame) window
  * over an unbounded key. PlanShapeSpec pins those claims.
  */
object CompositeQueries extends QueryModule {

  private val stopList = Seq("the", "a", "of", "and", "in")
  private val stopIn = stopList.map(x => s"'$x'").mkString(", ")

  /** text_quality's score over `documents` — replicated (not imported) so
    * the composite plan is self-contained and the oracle can inline it. */
  private def qualityScore: Column = {
    val nt = size(split(col("text"), " ")).cast("long")
    val nstop = size(expr(s"filter(split(text, ' '), x -> x IN ($stopIn))")).cast("long")
    val lenScore = least(col("n_chars") / 400.0, lit(1.0))
    val stopRatio = nstop.cast("double") / nt
    val meanWl = (col("n_chars") - (nt - 1)) / nt
    val shapeOk = when(meanWl >= 3.0 && meanWl <= 8.0, 1.0).otherwise(0.0)
    lenScore * 0.4 + stopRatio * 2.0 * 0.3 + shapeOk * 0.3
  }

  /** Oracle CTE mirroring [[qualityScore]] ≥ 0.5 → (doc_id, lang, source). */
  private val keptCte =
    s"""kept AS (
       |  SELECT doc_id, lang, source FROM (
       |    SELECT doc_id, lang, source,
       |      least(n_chars / 400.0, 1.0) * 0.4
       |      + (len(list_filter(string_split(text, ' '), x -> x IN ($stopIn)))
       |         / len(string_split(text, ' '))) * 2.0 * 0.3
       |      + CASE WHEN (n_chars - (len(string_split(text, ' ')) - 1))
       |                  / len(string_split(text, ' ')) BETWEEN 3.0 AND 8.0
       |             THEN 0.3 ELSE 0.0 END AS q
       |    FROM documents)
       |  WHERE q >= 0.5)""".stripMargin

  /** Sessionized events: one shuffle on user_id (the window partition);
    * `gapMs` of inactivity starts a new session. Same construction as
    * win_sessionize, parameterized so affinity can use a wider gap.
    * `pre` projects the events BEFORE the window shuffle (guide §2.3 —
    * project before the exchange): a caller that only needs a derived
    * value of a wide column computes it scan-side and drops the payload,
    * so the user_id exchange never carries it. Default identity keeps
    * every other caller byte-identical. */
  private def sessionized(s: SparkSession, d: String, gapMs: Long,
                          pre: DataFrame => DataFrame = identity): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = (unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(byTs)) > gapMs
    pre(events(s, d))
      .withColumn("new_sess", coalesce(gap.cast("long"), lit(0L)))
      .withColumn("session_idx", sum(col("new_sess")).over(run))
  }

  /** Oracle CTEs mirroring [[sessionized]] → sess(user_id, event_type,
    * props, sid). epoch_ms on the µs-cast timestamp matches unix_millis. */
  private def sessCte(gapMs: Long): String =
    s"""g AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, props,
       |    COALESCE(CAST((epoch_ms(CAST(ts AS TIMESTAMP))
       |      - lag(epoch_ms(CAST(ts AS TIMESTAMP)), 1) OVER
       |        (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
       |      > $gapMs AS BIGINT), 0) AS new_sess
       |  FROM events),
       |sess AS (
       |  SELECT user_id, event_type, props,
       |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM g)""".stripMargin

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  override def queries: Map[String, QueryFn] = Map(
    // ── 1. Quality gate → sessionize → doc join → pivoted agg ────────────
    // The verdict's flagship shape. Families: text kernels, window
    // (sessionize), JSON extraction, broadcast equi-join, pivot agg.
    // Per lang of quality-kept documents, how many distinct sessions
    // touched a doc of that lang, pivoted by event_type.
    // Scale: gate+scan of documents is narrow; kept side broadcast; the
    // only wide ops are the user_id window shuffle and the final
    // lang-pivot agg (map-side combined over 5×n_lang cells).
    "composite_gate_session_pivot" -> ((s, d) => {
      val kept = documents(s, d)
        .withColumn("quality", qualityScore)
        .filter(col("quality") >= 0.5)
        .select(col("doc_id"), col("lang"))
      // k extracted BEFORE the window shuffle and props dropped (r22,
      // guide §2.3): the user_id exchange previously carried the raw JSON
      // string through shuffle + two window passes only for a post-window
      // get_json_object — at 100 TB that is the whole props payload
      // crossing the network for one long. Same rows, same k values.
      val sess = sessionized(s, d, 600000L, df => df.select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k")))
      sess.join(broadcast(kept), col("k") === col("doc_id"))
        .groupBy(col("lang"))
        .pivot("event_type", eventTypes)
        .agg(count_distinct(col("user_id") * 100000L + col("session_idx")))
        .na.fill(0L, eventTypes)
    }),

    // ── 2. Sessionize → distinct → self-join pairs → agg + HAVING ────────
    // TPCx-BB q01's affinity shape (test_tpcxbb_first_half.py:18): which
    // event types co-occur in the same session. Families: window, distinct,
    // self-equi-join, agg with HAVING. 6h gap so sessions hold >1 event.
    // Scale: the self-join key (user_id, session_idx) is high-cardinality
    // (no Σbucket² blowup — sessions are bounded by the gap), and both
    // sides are the same deduped child so the exchange is reused.
    "composite_session_pair_affinity" -> ((s, d) => {
      // r22 (VERDICT r21 item 6): the distinct+self-join formulation
      // planned the ENTIRE sessionize pipeline twice — the r22-start plan
      // shows two full scan→exchange→sort→window×2→distinct chains (no
      // subtree reuse; one side re-built under a BroadcastExchange) joined
      // by a BHJ. Sessions hold at most |event_type| = 5 distinct types,
      // so the per-session type set is a tiny array: collect it ONCE
      // (collect_set — the groupBy(user_id, session_idx) re-uses the
      // window's user_id partitioning, no new exchange) and explode the
      // ordered pairs from the sorted array. One pipeline instead of two,
      // no join; identical pairs (sorted distinct array ⇒ a < b pairs
      // exactly once per session), identical counts, oracle-verified.
      val sess = sessionized(s, d, 21600000L)
        .select(col("user_id"), col("session_idx"), col("event_type"))
      sess.groupBy(col("user_id"), col("session_idx"))
        .agg(sort_array(collect_set(col("event_type"))).as("tset"))
        .select(posexplode(col("tset")).as(Seq("i", "type_a")), col("tset"))
        .select(col("type_a"),
          explode(expr("slice(tset, i + 2, size(tset))")).as("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_sessions"))
        .filter(col("n_sessions") >= 2)
    }),

    // ── 3. Filter → as-of join → datetime kernel → agg ───────────────────
    // TPCx-BB q12's clickpath-conversion shape (test_tpcxbb_first_half.py:298):
    // purchases matched to the most recent prior click by the same user
    // within 7 days. Families: filter, as-of join (union-window encoding,
    // same as join_asof), datetime extraction, agg. Scale: one shuffle on
    // user_id; the window frame is running (not whole-partition).
    "composite_funnel_conversion" -> ((s, d) => {
      val e = events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts")).distinct()
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      val tagged = clicks
        .select(col("user_id"), col("c_ts").as("t"), lit(0).as("is_probe"), col("c_ts"))
        .unionByName(purch.select(col("user_id"), col("p_ts").as("t"),
          lit(1).as("is_probe"), lit(null).cast("timestamp").as("c_ts")))
      // click sorts before purchase at equal t => c_ts <= p_ts matches,
      // mirroring DuckDB ASOF JOIN's >= bound.
      val w = Window.partitionBy("user_id").orderBy(col("t"), col("is_probe"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lagMs = unix_millis(col("t")) - unix_millis(col("m_ts"))
      tagged
        .withColumn("m_ts", last(col("c_ts"), ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1 && col("m_ts").isNotNull && lagMs <= 604800000L)
        .groupBy(dayofweek(col("t")).cast("long").as("dow"))
        .agg(count(lit(1)).as("n_conv"),
          avg(lagMs / lit(60000.0)).as("avg_lag_min"))
    }),

    // ── 4. 4-way join → CASE-ladder agg ──────────────────────────────────
    // TPCx-BB q09's multi-predicate SUM(CASE) shape
    // (test_tpcxbb_first_half.py:157) over the TPC-H star. Families:
    // multi-join (nation broadcast), datetime filter, conditional agg.
    // Scale: lineitem⋈orders shuffles on orderkey, orders⋈customer on
    // custkey — both unavoidable and AQE-coalesced; nation broadcasts.
    "composite_case_ladder" -> ((s, d) => {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .filter(year(col("o_orderdate")) === 1996)
        .groupBy(col("n_name"))
        .agg(
          sum(when(col("o_totalprice") > 150000.0, rev)).as("rev_big"),
          sum(when(col("o_totalprice") > 50000.0 && col("o_totalprice") <= 150000.0, rev)).as("rev_mid"),
          sum(when(col("o_totalprice") <= 50000.0, rev)).as("rev_small"),
          count(lit(1)).as("n_items"))
    }),

    // ── 5. Datetime bucketing → conditional agg → top-k → join ───────────
    // TPCx-BB q06's spend-trend shape (test_tpcxbb_first_half.py:80):
    // customers whose 1995-H2 order volume grew most vs H1. Families:
    // datetime kernels, manual-pivot conditional agg, top-k
    // (TakeOrderedAndProject, never a single-partition window), join back
    // to the customer dimension with the 20-row side broadcast.
    "composite_spend_trend" -> ((s, d) => {
      val per = orders(s, d)
        .filter(year(col("o_orderdate")) === 1995)
        .groupBy(col("o_custkey"))
        .agg(
          sum(when(month(col("o_orderdate")) <= 6, col("o_totalprice"))).as("h1"),
          sum(when(month(col("o_orderdate")) > 6, col("o_totalprice"))).as("h2"))
        .filter(col("h1").isNotNull && col("h2").isNotNull && col("h1") > 0)
        .withColumn("ratio", round(col("h2") / col("h1"), 6))
      val top = per
        .orderBy(col("ratio").desc, col("o_custkey"))
        .limit(20)
      customer(s, d)
        .join(broadcast(top), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_mktsegment"), col("ratio"))
    }),

    // ── 6. Text kernel → JSON → agg → join → window QUALIFY ──────────────
    // Engagement ranking: per source, the top-3 documents by event volume.
    // Families: token counting, JSON extraction, agg, join, ranking window
    // with a rank-filter that must fuse to WindowGroupLimit (plan-pinned).
    // Scale: events agg is map-side combined to ≤100 keys then broadcast.
    "composite_doc_engagement_rank" -> ((s, d) => {
      val eng = events(s, d)
        .withColumn("doc_k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("doc_k").isNotNull)
        .groupBy(col("doc_k"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      val joined = documents(s, d)
        .join(broadcast(eng), col("doc_id") === col("doc_k"))
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          col("n_events"), col("sum_value"))
      val w = Window.partitionBy(col("source")).orderBy(col("n_events").desc, col("doc_id"))
      joined
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
    }),

    // ── 7. Quality gate → exact-dedup keep-first → join → weekly pivot ───
    // The nightly corpus job fused with engagement reporting: gate
    // documents, keep the first doc_id per exact text hash, then pivot
    // weekly event counts against the surviving docs. Families: text
    // kernels, dedup window, broadcast join, datetime trunc, pivot agg.
    "composite_dedup_gate_weekly" -> ((s, d) => {
      // r22 (guide §2.3 — aggregate before you shuffle): "first doc_id
      // per content hash" was a row_number window: shuffle every
      // surviving (th, doc_id) row, SORT each hash partition, keep rn=1.
      // min(doc_id) per hash is the same value (doc_id is the window's
      // only order key), computed as a hash aggregate: map-side partial
      // min collapses duplicate hashes BEFORE the exchange (the shuffle
      // carries one row per (map task, hash) instead of one per document)
      // and the per-partition Sort + two Window passes disappear
      // (plans/r22: 25→21 ops, Window/Sort→0, exchange input
      // [doc_id, th]→[th, min]). Same kept set, oracle green.
      val kept = documents(s, d)
        .withColumn("quality", qualityScore)
        .filter(col("quality") >= 0.5)
        .select(md5(col("text")).as("th"), col("doc_id"))
        .groupBy(col("th"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .join(broadcast(kept), col("k") === col("doc_id"))
        .groupBy(date_trunc("week", col("ts")).as("week"))
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
        .na.fill(0L, eventTypes)
    })
  )

  override def oracle: Map[String, String] = Map(
    "composite_gate_session_pivot" ->
      s"""WITH $keptCte,
         |${sessCte(600000L)},
         |j AS (
         |  SELECT k.lang, s.event_type, s.user_id * 100000 + s.sid AS skey
         |  FROM sess s JOIN kept k
         |    ON CAST(json_extract_string(s.props, '$$.k') AS BIGINT) = k.doc_id)
         |SELECT lang,
         |  count(DISTINCT CASE WHEN event_type = 'click' THEN skey END) AS click,
         |  count(DISTINCT CASE WHEN event_type = 'view' THEN skey END) AS view,
         |  count(DISTINCT CASE WHEN event_type = 'purchase' THEN skey END) AS purchase,
         |  count(DISTINCT CASE WHEN event_type = 'signup' THEN skey END) AS signup,
         |  count(DISTINCT CASE WHEN event_type = 'error' THEN skey END) AS error
         |FROM j GROUP BY lang""".stripMargin,

    "composite_session_pair_affinity" ->
      s"""WITH ${sessCte(21600000L)},
         |u AS (SELECT DISTINCT user_id, sid, event_type FROM sess)
         |SELECT a.event_type AS type_a, b.event_type AS type_b,
         |  count(*) AS n_sessions
         |FROM u a JOIN u b
         |  ON a.user_id = b.user_id AND a.sid = b.sid
         | AND a.event_type < b.event_type
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "composite_funnel_conversion" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |c AS (SELECT DISTINCT user_id, ts AS c_ts FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS p_ts FROM e WHERE event_type = 'purchase'),
        |m AS (SELECT p.user_id, p.p_ts, c.c_ts
        |      FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.p_ts >= c.c_ts)
        |SELECT CAST(dayofweek(p_ts) AS BIGINT) + 1 AS dow, count(*) AS n_conv,
        |  avg((epoch_ms(p_ts) - epoch_ms(c_ts)) / 60000.0) AS avg_lag_min
        |FROM m WHERE epoch_ms(p_ts) - epoch_ms(c_ts) <= 604800000
        |GROUP BY 1""".stripMargin,

    "composite_case_ladder" ->
      """SELECT n_name,
        |  sum(CASE WHEN o_totalprice > 150000.0
        |       THEN l_extendedprice * (1.0 - l_discount) END) AS rev_big,
        |  sum(CASE WHEN o_totalprice > 50000.0 AND o_totalprice <= 150000.0
        |       THEN l_extendedprice * (1.0 - l_discount) END) AS rev_mid,
        |  sum(CASE WHEN o_totalprice <= 50000.0
        |       THEN l_extendedprice * (1.0 - l_discount) END) AS rev_small,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE year(o_orderdate) = 1996
        |GROUP BY n_name""".stripMargin,

    "composite_spend_trend" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    sum(CASE WHEN month(o_orderdate) <= 6 THEN o_totalprice END) AS h1,
        |    sum(CASE WHEN month(o_orderdate) > 6 THEN o_totalprice END) AS h2
        |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
        |top AS (
        |  SELECT o_custkey, round(h2 / h1, 6) AS ratio FROM per
        |  WHERE h1 IS NOT NULL AND h2 IS NOT NULL AND h1 > 0
        |  ORDER BY ratio DESC, o_custkey LIMIT 20)
        |SELECT c.c_custkey, c.c_mktsegment, t.ratio
        |FROM top t JOIN customer c ON t.o_custkey = c.c_custkey""".stripMargin,

    "composite_doc_engagement_rank" ->
      """WITH eng AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS doc_k,
        |    count(*) AS n_events, sum(value) AS sum_value
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  GROUP BY 1),
        |j AS (
        |  SELECT d.doc_id, d.source,
        |    len(string_split(d.text, ' ')) AS n_tokens, e.n_events, e.sum_value
        |  FROM documents d JOIN eng e ON d.doc_id = e.doc_k),
        |r AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY source ORDER BY n_events DESC, doc_id) AS rnk
        |  FROM j)
        |SELECT doc_id, source, n_tokens, n_events, sum_value, rnk
        |FROM r WHERE rnk <= 3""".stripMargin,

    "composite_dedup_gate_weekly" ->
      s"""WITH $keptCte,
         |first_per_hash AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER
         |      (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM documents WHERE doc_id IN (SELECT doc_id FROM kept))
         |  WHERE rn = 1),
         |ev AS (
         |  SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS week,
         |    event_type
         |  FROM events e JOIN first_per_hash f
         |    ON CAST(json_extract_string(e.props, '$$.k') AS BIGINT) = f.doc_id)
         |SELECT week,
         |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
         |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error
         |FROM ev GROUP BY week""".stripMargin
  )
}
