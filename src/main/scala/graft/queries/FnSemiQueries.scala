package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar-kernel batteries, semi-structured families (SURVEY.md §2.8):
  * json (ref BodoSQL/bodosql/kernels/json_array_kernels.py, 24 fns;
  * bodo/io/json_col_parser.cpp), nested/array (nested_data_kernels.py, 56),
  * and the TIME-type kit (time_array_kernels.py; TIME has no Spark type —
  * modeled as nanos-of-day LongType per SURVEY §1.2).
  *
  * `events.props` is the designed JSON column (FIXTURES.md) — parsed here
  * with both get_json_object and from_json, then aggregated, so extraction
  * feeds a real downstream shuffle rather than a display-only projection.
  */
object FnSemiQueries extends QueryModule {

  override def queries: Map[String, QueryFn] = Map(
    // JSON extraction + filter + aggregation over events.props.
    "fn_json_props" -> ((s, d) => {
      val ev = events(s, d)
        .withColumn("k_str", get_json_object(col("props"), "$.k"))
        .withColumn("k", col("k_str").cast("long"))
        .withColumn("k2", from_json(col("props"), lit("k INT")).getField("k").cast("long"))
      ev.filter(col("k").isNotNull)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          avg(col("k")).as("avg_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(when(col("k") =!= col("k2"), 1).otherwise(0)).as("parse_mismatch"),
          countDistinct(col("k") % 10).as("n_kmod"))
    }),

    // OBJECT_* kernel family (ref json_array_kernels.py: object_construct/
    // keys/insert/delete/pick, get_path): props carries one key, so a
    // 3-key object is constructed from fixture columns first; every
    // object operation is a native map function and only the serialized
    // canonical JSON (stable key order, both engines) leaves the query.
    "fn_json2" -> ((s, d) => {
      val m = map(
        lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string"),
        lit("k"), get_json_object(col("props"), "$.k"))
      events(s, d).filter(col("event_id") % 40 === 0).select(
        col("event_id"),
        to_json(m).as("obj"),
        array_join(array_sort(json_object_keys(to_json(m))), ",").as("okeys"),
        to_json(map_filter(m, (k, _) => k =!= "uid")).as("odel"),
        to_json(map_filter(m, (k, _) => k.isin("uid", "k"))).as("opick"),
        to_json(map_concat(m, map(lit("new"), lit("1")))).as("oins"),
        get_json_object(to_json(m), "$.uid").as("gpath"))
    }),

    // Array/nested kernel battery over document word arrays. Array results
    // are serialized with array_join into canonical strings at the output
    // boundary only (the driver's pandas checker cannot hash ndarray cells);
    // every array computation stays native Catalyst.
    "fn_array" -> ((s, d) => {
      val w = slice(split(col("text"), " "), 1, 6)
      def aj(c: Column): Column = array_join(transform(c, x => x.cast("string")), ",")
      documents(s, d).filter(col("doc_id") % 2 === 0).select(
        col("doc_id"),
        array_contains(w, "data").as("has_data"),
        array_position(w, "data").as("pos_data"),
        aj(array_sort(array_distinct(w))).as("dis"),
        aj(array_sort(array_union(w, array(lit("alpha"), lit("beta"))))).as("un"),
        aj(array_sort(array_intersect(w, array(lit("data"), lit("key"), lit("row"))))).as("its"),
        aj(array_sort(array_except(w, array(lit("the"), lit("a"))))).as("exc"),
        arrays_overlap(w, array(lit("key"), lit("value"))).as("ovl"),
        size(w).cast("long").as("sz"),
        array_max(w).as("mx"),
        array_min(w).as("mn"),
        array_join(w, "-").as("jn"),
        aj(flatten(array(slice(w, 1, 2), slice(w, 3, 2)))).as("fl"),
        aj(array_append(slice(w, 1, 2), "zz")).as("ap"),
        aj(array_remove(w, "the")).as("rm"),
        aj(reverse(w)).as("rv"),
        aj(sequence(lit(1L), lit(5L))).as("sq"),
        aj(zip_with(sequence(lit(1L), lit(3L)), sequence(lit(4L), lit(6L)),
          (a, b) => a + b)).as("zw"),
        aggregate(sequence(lit(1L), lit(5L)), lit(0L), (acc, x) => acc + x).as("ag"))
    }),

    // Higher-order array kernels (the §2.8 nested-kernel long tail the
    // first battery left out): filter / exists / forall, transform with
    // element index, comparator array_sort (length then lexicographic —
    // DuckDB emulates via a zero-padded sort-key transform), array_compact/
    // repeat/insert, positional slice and element_at (± index). Same
    // scalar-serialization convention as fn_array.
    "fn_array2" -> ((s, d) => {
      val w = slice(split(col("text"), " "), 1, 8)
      def aj(c: Column): Column = array_join(c, ",")
      documents(s, d).filter(col("doc_id") % 3 === 0).select(
        col("doc_id"),
        aj(filter(w, x => length(x) > 3)).as("flt"),
        exists(w, x => x === lit("data")).as("ex"),
        forall(w, x => length(x) < 20).as("fa"),
        aj(transform(w, (x, i) => concat((i + 1).cast("string"), lit(":"), x))).as("tfi"),
        aj(array_compact(w)).as("cmp"),
        aj(array_repeat(col("lang"), 3)).as("rpt"),
        aj(array_insert(slice(w, 1, 3), lit(2), lit("INS"))).as("ins"),
        aj(slice(w, 2, 3)).as("slc"),
        element_at(w, 2).as("el2"),
        element_at(w, -1).as("ellast"),
        aj(array_sort(w, (a, b) =>
          when(length(a) =!= length(b), length(a) - length(b))
            .otherwise(when(a < b, -1).when(a > b, 1).otherwise(0)))).as("srt_len"))
    }),

    // VARIANT kernels (§2.8 variant/semi-structured; Spark 4 VariantType —
    // the engine-native form of Snowflake VARIANT per SURVEY §1.2):
    // parse_json -> variant, typed variant_get extraction, re-serialize.
    "fn_variant" -> ((s, d) => {
      val v = parse_json(col("props"))
      events(s, d).filter(col("event_id") % 25 === 0).select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("vk"),
        expr("variant_get(parse_json(props), '$.k', 'string')").as("vs"),
        to_json(v).as("vj"),
        expr("variant_get(parse_json(props), '$.zzz', 'bigint')").as("vmiss"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").isNull.as("vnull"))
    }),

    // MAP-type kernels (§2.8 nested / object kernels): construction,
    // keys/values, lookup, concat, contains. Maps stay internal — outputs
    // are scalars/arrays (map cells don't canonicalize across engines).
    "fn_map" -> ((s, d) => {
      val m = map_from_arrays(
        array(lit("brand"), lit("type")),
        array(col("p_brand"), col("p_type")))
      val m2 = map_concat(m, map_from_arrays(array(lit("size")),
        array(col("p_size").cast("string"))))
      part(s, d).filter(col("p_partkey") % 4 === 0).select(
        col("p_partkey"),
        array_join(map_keys(m), ",").as("mk"),
        array_join(map_values(m), ",").as("mv"),
        size(m).cast("long").as("msz"),
        element_at(m, "brand").as("get_b"),
        element_at(m2, "size").as("get_sz"),
        map_contains_key(m, "type").as("has_t"),
        map_contains_key(m, "nope").as("has_n"))
    }),

    // FLATTEN over a MAP/OBJECT: Snowflake FLATTEN's KEY/VALUE output
    // columns via explode of a map (ref lateral.py:92 object branch).
    "lateral_flatten_map" -> ((s, d) => {
      val m = map_from_arrays(
        array(lit("brand"), lit("type"), lit("size")),
        array(col("p_brand"), col("p_type"), col("p_size").cast("string")))
      part(s, d).filter(col("p_partkey") % 9 === 0)
        .select(col("p_partkey").as("seq"), explode(m).as(Seq("key", "value")))
    }),

    // FLATTEN with the OUTER option: empty arrays keep their parent row
    // with null INDEX/VALUE (Snowflake LATERAL FLATTEN(..., OUTER=>TRUE)).
    "lateral_flatten_outer" -> ((s, d) => {
      val l = when(col("doc_id") % 7 === 0, array().cast("array<string>"))
        .otherwise(slice(split(col("text"), " "), 1, 3))
      documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("seq"), l.as("l"))
        .select(col("seq"), posexplode_outer(col("l")).as(Seq("idx", "value")))
    }),

    // TIMESTAMPTZ offset-retention kit (SURVEY §1.2): construct from wall
    // clock + offset, compare in UTC, reconstruct the wall clock, canonical
    // '±HH:MM' display — see graft.functions.TimestampTz. The offset is
    // derived from user_id (-11:00..+12:00 in 30-min steps) so every
    // helper is exercised across the full offset range.
    "fn_timestamptz" -> ((s, d) => {
      import graft.functions.TimestampTz
      val off = (((col("user_id") % 47) - 22) * 30).cast("int")
      val tz = TimestampTz.make(col("ts"), off)
      events(s, d).filter(col("event_id") % 20 === 0).select(
        col("event_id"),
        TimestampTz.utc(tz).as("utc"),
        TimestampTz.offsetMin(tz).cast("int").as("off_min"),
        TimestampTz.wall(tz).as("wall"),
        hour(TimestampTz.wall(tz)).as("wall_hh"),
        TimestampTz.show(tz).as("disp"),
        (TimestampTz.utc(tz) < col("ts")).as("east_of_utc"))
    }),

    // TIME-of-day kit over events.ts (µs-truncated timestamp; see Tables).
    // r18: NATIVE Spark 4.1 TimeType — `t` is a real time(6) column
    // (schema_match proves the type; DuckDB oracles TIME directly) built
    // from the timestamp's µs-of-day, `tfp` exercises TIME_FROM_PARTS'
    // Snowflake rollover as native TIME, and hh/mi/ss extract FROM the
    // TIME column. The long-nanos columns stay as the compat surface.
    "fn_time" -> ((s, d) => {
      import graft.functions.SnowflakeFns
      val ts = col("ts")
      val t = SnowflakeFns.toTime(ts)
      events(s, d).filter(col("event_id") % 20 === 0).select(
        col("event_id"),
        t.as("t"),
        SnowflakeFns.timeFromParts(hour(ts), minute(ts) + lit(150),
          second(ts), lit(0L)).as("tfp"), // minute 150 rolls over
        hour(t).as("hh"),
        minute(t).as("mi"),
        second(t).as("ss"),
        ((unix_micros(ts) % 86400000000L) * 1000).as("time_ns"),
        (unix_micros(ts) % 1000000L).as("us_frac"),
        date_format(ts, "HH:mm:ss").as("tstr"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "fn_json_props" ->
      """WITH e AS (
        |  SELECT event_type,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS k2
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  avg(k) AS avg_k, min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(CASE WHEN k <> k2 THEN 1 ELSE 0 END) AS BIGINT) AS parse_mismatch,
        |  count(DISTINCT k % 10) AS n_kmod
        |FROM e WHERE k IS NOT NULL
        |GROUP BY event_type""".stripMargin,

    "fn_array" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ')[1:6] AS w FROM documents
        |           WHERE doc_id % 2 = 0)
        |SELECT doc_id,
        |  list_contains(w, 'data') AS has_data,
        |  CAST(coalesce(list_position(w, 'data'), 0) AS BIGINT) AS pos_data,
        |  coalesce(array_to_string(list_sort(list_distinct(w)), ','), '') AS dis,
        |  coalesce(array_to_string(list_sort(list_distinct(list_concat(w, ['alpha', 'beta']))), ','), '') AS un,
        |  coalesce(array_to_string(list_sort(list_intersect(w, ['data', 'key', 'row'])), ','), '') AS its,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(w), x -> x NOT IN ('the', 'a'))), ','), '') AS exc,
        |  list_has_any(w, ['key', 'value']) AS ovl,
        |  len(w) AS sz,
        |  list_aggregate(w, 'max') AS mx,
        |  list_aggregate(w, 'min') AS mn,
        |  coalesce(array_to_string(w, '-'), '') AS jn,
        |  coalesce(array_to_string(flatten([w[1:2], w[3:4]]), ','), '') AS fl,
        |  coalesce(array_to_string(list_append(w[1:2], 'zz'), ','), '') AS ap,
        |  coalesce(array_to_string(list_filter(w, x -> x <> 'the'), ','), '') AS rm,
        |  coalesce(array_to_string(list_reverse(w), ','), '') AS rv,
        |  array_to_string(list_transform(range(1, 6), x -> CAST(x AS VARCHAR)), ',') AS sq,
        |  array_to_string(list_transform(range(1, 4), i -> CAST(2 * i + 3 AS VARCHAR)), ',') AS zw,
        |  CAST(list_sum(range(1, 6)) AS BIGINT) AS ag
        |FROM t""".stripMargin,

    "fn_json2" ->
      """WITH t AS (SELECT event_id, event_type,
        |    CAST(user_id AS VARCHAR) AS uid_s,
        |    json_extract_string(props, '$.k') AS k_s
        |  FROM events WHERE event_id % 40 = 0)
        |SELECT event_id,
        |  CAST(json_object('type', event_type, 'uid', uid_s, 'k', k_s) AS VARCHAR) AS obj,
        |  array_to_string(list_sort(json_keys(
        |    json_object('type', event_type, 'uid', uid_s, 'k', k_s))), ',') AS okeys,
        |  CAST(json_object('type', event_type, 'k', k_s) AS VARCHAR) AS odel,
        |  CAST(json_object('uid', uid_s, 'k', k_s) AS VARCHAR) AS opick,
        |  CAST(json_object('type', event_type, 'uid', uid_s, 'k', k_s, 'new', '1')
        |    AS VARCHAR) AS oins,
        |  uid_s AS gpath
        |FROM t""".stripMargin,

    "fn_array2" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ')[1:8] AS w
        |           FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_filter(w, x -> length(x) > 3), ','), '') AS flt,
        |  list_contains(w, 'data') AS ex,
        |  len(list_filter(w, x -> length(x) >= 20)) = 0 AS fa,
        |  coalesce(array_to_string(
        |    list_transform(w, (x, i) -> CAST(i AS VARCHAR) || ':' || x), ','), '') AS tfi,
        |  coalesce(array_to_string(w, ','), '') AS cmp,
        |  array_to_string(list_transform(range(3), x -> lang), ',') AS rpt,
        |  coalesce(array_to_string(
        |    list_concat(list_concat(list_slice(w, 1, 1), ['INS']), list_slice(w, 2, 3)),
        |    ','), '') AS ins,
        |  coalesce(array_to_string(list_slice(w, 2, 4), ','), '') AS slc,
        |  w[2] AS el2,
        |  w[-1] AS ellast,
        |  coalesce(array_to_string(
        |    list_transform(list_sort(list_transform(w, x -> printf('%03d|%s', length(x), x))),
        |      x -> x[5:]), ','), '') AS srt_len
        |FROM t""".stripMargin,

    "fn_variant" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS vk,
        |  json_extract_string(props, '$.k') AS vs,
        |  CAST(json(props) AS VARCHAR) AS vj,
        |  TRY_CAST(json_extract_string(props, '$.zzz') AS BIGINT) AS vmiss,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL AS vnull
        |FROM events WHERE event_id % 25 = 0""".stripMargin,

    "fn_map" ->
      """SELECT p_partkey,
        |  coalesce(array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ','), '') AS mk,
        |  coalesce(array_to_string(map_values(map(['brand','type'], [p_brand, p_type])), ','), '') AS mv,
        |  CAST(cardinality(map(['brand','type'], [p_brand, p_type])) AS BIGINT) AS msz,
        |  map(['brand','type'], [p_brand, p_type])['brand'][1] AS get_b,
        |  map_concat(map(['brand','type'], [p_brand, p_type]),
        |             map(['size'], [CAST(p_size AS VARCHAR)]))['size'][1] AS get_sz,
        |  list_contains(map_keys(map(['brand','type'], [p_brand, p_type])), 'type') AS has_t,
        |  list_contains(map_keys(map(['brand','type'], [p_brand, p_type])), 'nope') AS has_n
        |FROM part WHERE p_partkey % 4 = 0""".stripMargin,

    "lateral_flatten_map" ->
      """SELECT p_partkey AS seq,
        |  unnest(map_keys(map(['brand','type','size'],
        |    [p_brand, p_type, CAST(p_size AS VARCHAR)]))) AS key,
        |  unnest(map_values(map(['brand','type','size'],
        |    [p_brand, p_type, CAST(p_size AS VARCHAR)]))) AS value
        |FROM part WHERE p_partkey % 9 = 0""".stripMargin,

    "lateral_flatten_outer" ->
      """WITH t AS (
        |  SELECT doc_id AS seq,
        |    CASE WHEN doc_id % 7 = 0 THEN []::VARCHAR[]
        |         ELSE string_split(text, ' ')[1:3] END AS l
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT seq,
        |  CAST(CASE WHEN len(l) = 0 THEN NULL
        |       ELSE generate_subscripts(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END, 1) - 1
        |       END AS INTEGER) AS idx,
        |  unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS value
        |FROM t""".stripMargin,

    "fn_timestamptz" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |  WHERE event_id % 20 = 0),
        |t AS (SELECT event_id, ts,
        |        CAST(((user_id % 47) - 22) * 30 AS INTEGER) AS off FROM e)
        |SELECT event_id,
        |  ts - to_minutes(off) AS utc,
        |  off AS off_min,
        |  ts AS wall,
        |  CAST(hour(ts) AS INTEGER) AS wall_hh,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S')
        |    || CASE WHEN off < 0 THEN '-' ELSE '+' END
        |    || lpad(CAST(abs(off) // 60 AS VARCHAR), 2, '0') || ':'
        |    || lpad(CAST(abs(off) % 60 AS VARCHAR), 2, '0') AS disp,
        |  (ts - to_minutes(off)) < ts AS east_of_utc
        |FROM t""".stripMargin,

    // Oracle must µs-truncate the ns timestamp first (FIXTURES ns policy).
    // `t` is DuckDB's own TIME cast; `tfp` replays the Snowflake rollover
    // (minute + 150 wraps into [0, 24h)) with make_time.
    "fn_time" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |           WHERE event_id % 20 = 0),
        |p AS (SELECT *,
        |  ((hour(ts) * 3600 + (minute(ts) + 150) * 60 + second(ts))
        |    % 86400 + 86400) % 86400 AS fp_s FROM e)
        |SELECT event_id,
        |  CAST(ts AS TIME) AS t,
        |  make_time(fp_s // 3600, (fp_s % 3600) // 60,
        |    CAST(fp_s % 60 AS DOUBLE)) AS tfp,
        |  CAST(hour(ts) AS INTEGER) AS hh,
        |  CAST(minute(ts) AS INTEGER) AS mi,
        |  CAST(second(ts) AS INTEGER) AS ss,
        |  (epoch_us(ts) % 86400000000) * 1000 AS time_ns,
        |  epoch_us(ts) % 1000000 AS us_frac,
        |  strftime(ts, '%H:%M:%S') AS tstr
        |FROM p""".stripMargin
  )
}
