package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.SnowflakeFns._

/** Long-tail Snowflake kernel batteries (VERDICT r7 item 2): the ~45
  * function/argument shapes that "map to a builtin" but had no dedicated
  * oracle entry — TO_CHAR/TO_VARCHAR format codes, TRY_TO_* coercions,
  * number-to-datetime auto-scaling, REGEXP_* with position/occurrence/
  * flags/group arguments, and INSERT/TRANSLATE/STRTOK string edges.
  *
  * Reference layout mirror: one battery per kernel module, one column per
  * kernel/argument-shape, per-function oracle SQL — the same shape as
  * BodoSQL/bodosql/tests/test_kernels/. Kernels cited in
  * graft.functions.SnowflakeFns.
  */
object FnLongTailQueries extends QueryModule {

  override def queries: Map[String, QueryFn] = Map(
    // TO_*/TRY_TO_* conversion long tail over orders
    // (snowflake_conversion_array_kernels.py).
    "fn_conversion2" -> ((s, d) => {
      val k = col("o_orderkey")
      val dt = col("o_orderdate")
      // derived varied time-of-day so HH/MI/SS codes exercise nontrivially
      val ts2 = timestamp_seconds(unix_timestamp(dt.cast("timestamp")) + (k % 86400))
      val numStr = concat((k % 100).cast("string"), lit("."),
        lpad((k % 1000).cast("string"), 3, "0"))
      val expStr = concat((k % 9).cast("string"), lit("."),
        (k % 10).cast("string"), lit("e"), (k % 3).cast("string"))
      val signStr = concat(when(k % 2 === 0, lit("+")).otherwise(lit("-")),
        lit("."), ((k % 9) + 1).cast("string"))
      val boolTok = element_at(
        array(lit("on"), lit("off"), lit("YES"), lit("n"), lit("TRUE"),
          lit("0"), lit("maybe")), ((k % 7) + 1).cast("int"))
      val dateStr = when(k % 5 === 0, lit("xx/yy/2024"))
        .otherwise(concat(lpad((k % 28 + 1).cast("string"), 2, "0"), lit("/"),
          lpad((k % 12 + 1).cast("string"), 2, "0"), lit("/2024")))
      val hexStr = when(k % 6 === 0, lit("XYZZ"))
        .otherwise(lpad(hex(k), 8, "0"))
      orders(s, d).filter(k % 10 === 0).select(
        k,
        toCharDt(dt, "YYYY-MM-DD").as("tc_ymd"),
        toCharDt(dt, "DD/MON/YYYY").as("tc_dmon"),
        toCharDt(dt, "MMMM YYYY").as("tc_mmmm"),
        toCharDt(dt, "DY").as("tc_dy"),
        toCharDt(ts2, "HH24:MI:SS").as("tc_hms"),
        toCharDt(ts2, "HH12 AM").as("tc_hh12"),
        k.cast("string").as("tc_int"),
        ((k % 40) / 4.0).cast("string").as("tc_float"),
        (k % 2 === 0).cast("string").as("tc_bool"),
        numStr.cast("decimal(10,4)").cast("double").as("tn_exact"),
        lit("2.675").cast("decimal(10,2)").cast("double").as("tn_round"),
        lit("-2.675").cast("decimal(10,2)").cast("double").as("tn_round_neg"),
        expr("try_cast(concat('x', o_orderkey) AS DECIMAL(10,2))")
          .cast("double").as("ttn_bad"),
        expStr.cast("double").as("ttd_exp"),
        signStr.cast("double").as("ttd_sign"),
        expr("try_cast('12.3.4' AS DOUBLE)").as("ttd_bad"),
        tryToBooleanStr(boolTok).as("tb_tok"),
        toBooleanNum((k % 3) - 1).as("tb_num"),
        tryToDate(dateStr, "DD/MM/YYYY").as("ttdate_fmt"),
        numberToTs(k * 1000).as("ntd_sec"),
        numberToTs(k + 40000000000L).as("ntd_ms"),
        numberToTs(k + 50000000000000L).as("ntd_us"),
        numberToTs(k * 1000 + 50000000000000000L).as("ntd_ns"),
        hex(expr("try_to_binary(CASE WHEN o_orderkey % 6 = 0 THEN 'XYZZ' " +
          "ELSE lpad(hex(o_orderkey), 8, '0') END, 'hex')")).as("tbin_hex"))
    }),

    // REGEXP_* with position/occurrence/option/flags/group args over
    // customer (regexp_array_kernels.py).
    "fn_regexp3" -> ((s, d) => {
      val s1 = col("c_name")
      val s2c = concat(col("c_name"), lit(" "), col("c_mktsegment"),
        lit(" "), col("c_name"))
      customer(s, d).filter(col("c_custkey") % 4 === 0)
        .withColumn("s2", s2c)
        .select(
          col("c_custkey"),
          regexpSubstrSf(s1, "[0-9]+").as("rs_digits"),
          regexpSubstrSf(s1, "[0-9]+", position = 12).as("rs_pos"),
          regexpSubstrSf(col("s2"), "[0-9]+", 1, 2).as("rs_occ2"),
          regexpSubstrSf(s1, "(Customer)#([0-9]+)", 1, 1, "", 2).as("rs_grp"),
          regexpSubstrSf(s1, "customer", 1, 1, "i").as("rs_ci"),
          regexpSubstrSf(s1, "[0-9]+", 1, 5).as("rs_missing"),
          regexpInstrSf(col("s2"), "[0-9]+").as("ri_1"),
          regexpInstrSf(col("s2"), "[0-9]+", 1, 2).as("ri_2"),
          regexpInstrSf(s1, "[0-9]+", 1, 1, 1).as("ri_end"),
          regexpInstrSf(s1, "[0-9]+", position = 12).as("ri_pos"),
          regexpInstrSf(s1, "zzz").as("ri_none"),
          regexpCountSf(col("s2"), "[0-9]+").as("rc"),
          regexpCountSf(col("s2"), "[0-9]+", position = 12).as("rc_pos"),
          regexpCountSf(col("c_mktsegment"), "[aeiou]", 1, "i").as("rc_ci"),
          regexpReplaceSf(s1, "[0-9]", "#", 12).as("rr_pos"))
    }),

    // VARIANT depth (VERDICT r7 item 9): TYPEOF + the IS_* predicate
    // family over heterogeneous JSON using Spark 4 VariantType
    // (variant_array_kernels.py is_array:14/is_object:40, Snowflake
    // TYPEOF semantics: numbers without exponent are DECIMAL, integers
    // INTEGER, JSON null is NULL_VALUE). The type name comes from
    // schema_of_variant, mapped onto Snowflake's TYPEOF vocabulary;
    // the DuckDB oracle maps json_type onto the same vocabulary
    // (BIGINT->INTEGER, DOUBLE->DECIMAL — DuckDB types JSON decimals as
    // DOUBLE, documented engine-mapping caveat).
    "fn_variant2" -> ((s, d) => {
      val vj = element_at(array(
        lit("123"), lit("12.5"), lit("\"hello\""), lit("true"),
        lit("[1,2,3]"), lit("{\"a\":1}"), lit("null")),
        ((col("event_id") % 7) + 1).cast("int"))
      val sch = expr("schema_of_variant(parse_json(vj))")
      val typeofSf =
        when(sch.startsWith("ARRAY"), "ARRAY")
          .when(sch.startsWith("OBJECT") || sch.startsWith("STRUCT"), "OBJECT")
          .when(sch === "STRING", "VARCHAR")
          .when(sch === "BIGINT", "INTEGER")
          .when(sch.startsWith("DECIMAL"), "DECIMAL")
          .when(sch === "DOUBLE", "DOUBLE")
          .when(sch === "BOOLEAN", "BOOLEAN")
          .when(sch === "VOID", "NULL_VALUE")
          .otherwise("OTHER")
      events(s, d).filter(col("event_id") % 25 === 0)
        .withColumn("vj", vj)
        .select(
          col("event_id"),
          typeofSf.as("vt"),
          typeofSf.equalTo("ARRAY").as("is_arr"),
          typeofSf.equalTo("OBJECT").as("is_obj"),
          typeofSf.equalTo("INTEGER").as("is_int"),
          typeofSf.equalTo("VARCHAR").as("is_str"),
          typeofSf.equalTo("BOOLEAN").as("is_bool"),
          typeofSf.equalTo("DECIMAL").as("is_dec"),
          expr("is_variant_null(parse_json(vj))").as("is_nullv"),
          json_array_length(col("vj")).as("arr_len"),
          array_join(json_object_keys(col("vj")), ",").as("obj_keys"),
          expr("try_variant_get(parse_json(vj), '$[0]', 'bigint')").as("vg_first"),
          expr("try_variant_get(parse_json(vj), '$.a', 'bigint')").as("vg_a"))
    }),

    // INSERT/TRANSLATE/STRTOK/SPLIT_PART/CHARINDEX edge shapes over part
    // (string_array_kernels.py).
    "fn_string4" -> ((s, d) => {
      val b = col("p_name")
      part(s, d).filter(col("p_partkey") % 6 === 0).select(
        col("p_partkey"),
        insertSf(b, 3, 4, lit("XY")).as("ins_mid"),
        insertSf(b, 1, 0, lit("<<")).as("ins_prepend"),
        overlay(b, lit(">>"), length(b) + 1, lit(0)).as("ins_append"),
        translate(b, "aeiou", "AE").as("tr_del"),
        translate(b, "ol", "10").as("tr_swap"),
        strtokSf(b, " ", 2).as("stk2"),
        strtokSf(b, "ao ", 3).as("stk_set"),
        split_part(b, lit(" "), lit(-1)).as("sp_neg"),
        locate("a", b, 5).as("ci2"),
        repeat(left(b, lit(2)), 3).as("rpt"),
        expr("concat('a', space(3), 'b')").as("spc"),
        left(b, lit(100)).as("lft_big"),
        right(b, lit(100)).as("rgt_big"),
        overlay(b, lit("***"), lit(5)).as("ovl_rep"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "fn_conversion2" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_orderdate AS dt,
        |    CAST(o_orderdate AS TIMESTAMP) + to_seconds(o_orderkey % 86400) AS ts2
        |  FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT k AS o_orderkey,
        |  strftime(dt, '%Y-%m-%d') AS tc_ymd,
        |  strftime(dt, '%d/%b/%Y') AS tc_dmon,
        |  strftime(dt, '%B %Y') AS tc_mmmm,
        |  strftime(dt, '%a') AS tc_dy,
        |  strftime(ts2, '%H:%M:%S') AS tc_hms,
        |  strftime(ts2, '%I %p') AS tc_hh12,
        |  CAST(k AS VARCHAR) AS tc_int,
        |  CAST((k % 40) / 4.0 AS VARCHAR) AS tc_float,
        |  CAST(k % 2 = 0 AS VARCHAR) AS tc_bool,
        |  CAST(CAST(CAST(k % 100 AS VARCHAR) || '.' || lpad(CAST(k % 1000 AS VARCHAR), 3, '0')
        |       AS DECIMAL(10,4)) AS DOUBLE) AS tn_exact,
        |  CAST(CAST('2.675' AS DECIMAL(10,2)) AS DOUBLE) AS tn_round,
        |  CAST(CAST('-2.675' AS DECIMAL(10,2)) AS DOUBLE) AS tn_round_neg,
        |  CAST(TRY_CAST('x' || CAST(k AS VARCHAR) AS DECIMAL(10,2)) AS DOUBLE) AS ttn_bad,
        |  TRY_CAST(CAST(k % 9 AS VARCHAR) || '.' || CAST(k % 10 AS VARCHAR)
        |    || 'e' || CAST(k % 3 AS VARCHAR) AS DOUBLE) AS ttd_exp,
        |  TRY_CAST((CASE WHEN k % 2 = 0 THEN '+' ELSE '-' END)
        |    || '.' || CAST((k % 9) + 1 AS VARCHAR) AS DOUBLE) AS ttd_sign,
        |  TRY_CAST('12.3.4' AS DOUBLE) AS ttd_bad,
        |  CASE ['on','off','YES','n','TRUE','0','maybe'][CAST(k % 7 AS INTEGER) + 1]
        |    WHEN 'on' THEN TRUE WHEN 'off' THEN FALSE WHEN 'YES' THEN TRUE
        |    WHEN 'n' THEN FALSE WHEN 'TRUE' THEN TRUE WHEN '0' THEN FALSE
        |    ELSE NULL END AS tb_tok,
        |  ((k % 3) - 1) <> 0 AS tb_num,
        |  CASE WHEN k % 5 = 0 THEN NULL
        |       ELSE CAST(CAST(strptime(
        |         lpad(CAST(k % 28 + 1 AS VARCHAR), 2, '0') || '/' ||
        |         lpad(CAST(k % 12 + 1 AS VARCHAR), 2, '0') || '/2024',
        |         '%d/%m/%Y') AS DATE) AS TIMESTAMP) END AS ttdate_fmt,
        |  epoch_ms(k * 1000 * 1000) AS ntd_sec,
        |  epoch_ms(k + 40000000000) AS ntd_ms,
        |  make_timestamp(k + 50000000000000) AS ntd_us,
        |  make_timestamp((k * 1000 + 50000000000000000) // 1000) AS ntd_ns,
        |  CASE WHEN k % 6 = 0 THEN NULL
        |       ELSE upper(lpad(to_hex(k), 8, '0')) END AS tbin_hex
        |FROM o""".stripMargin,

    "fn_regexp3" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name AS s1, c_mktsegment AS seg,
        |    c_name || ' ' || c_mktsegment || ' ' || c_name AS s2
        |  FROM customer WHERE c_custkey % 4 = 0),
        |x AS (
        |  SELECT c_custkey, s1, seg, s2,
        |    regexp_extract_all(s1, '[0-9]+') AS m1,
        |    str_split_regex(s1, '[0-9]+') AS p1,
        |    regexp_extract_all(s2, '[0-9]+') AS m2,
        |    str_split_regex(s2, '[0-9]+') AS p2,
        |    regexp_extract_all(substr(s1, 12), '[0-9]+') AS m1p,
        |    str_split_regex(substr(s1, 12), '[0-9]+') AS p1p
        |  FROM c)
        |SELECT c_custkey,
        |  m1[1] AS rs_digits,
        |  m1p[1] AS rs_pos,
        |  m2[2] AS rs_occ2,
        |  regexp_extract_all(s1, '(Customer)#([0-9]+)', 2)[1] AS rs_grp,
        |  regexp_extract_all(s1, '(?i)customer')[1] AS rs_ci,
        |  m1[5] AS rs_missing,
        |  CAST(CASE WHEN len(m2) >= 1 THEN 1 + length(p2[1]) ELSE 0 END AS INTEGER) AS ri_1,
        |  CAST(CASE WHEN len(m2) >= 2
        |       THEN 1 + length(p2[1]) + length(p2[2]) + length(m2[1])
        |       ELSE 0 END AS INTEGER) AS ri_2,
        |  CAST(CASE WHEN len(m1) >= 1
        |       THEN 1 + length(p1[1]) + length(m1[1]) ELSE 0 END AS INTEGER) AS ri_end,
        |  CAST(CASE WHEN len(m1p) >= 1 THEN 12 + length(p1p[1]) ELSE 0 END AS INTEGER) AS ri_pos,
        |  0 AS ri_none,
        |  CAST(len(m2) AS INTEGER) AS rc,
        |  CAST(len(regexp_extract_all(substr(s2, 12), '[0-9]+')) AS INTEGER) AS rc_pos,
        |  CAST(len(regexp_extract_all(seg, '(?i)[aeiou]')) AS INTEGER) AS rc_ci,
        |  substr(s1, 1, 11) || regexp_replace(substr(s1, 12), '[0-9]', '#', 'g') AS rr_pos
        |FROM x""".stripMargin,

    "fn_variant2" ->
      """WITH e AS (
        |  SELECT event_id,
        |    ['123','12.5','"hello"','true','[1,2,3]','{"a":1}','null']
        |      [CAST(event_id % 7 AS INTEGER) + 1] AS vj
        |  FROM events WHERE event_id % 25 = 0),
        |t AS (
        |  SELECT event_id, vj,
        |    CASE json_type(vj::JSON)
        |      WHEN 'ARRAY' THEN 'ARRAY' WHEN 'OBJECT' THEN 'OBJECT'
        |      WHEN 'VARCHAR' THEN 'VARCHAR' WHEN 'BIGINT' THEN 'INTEGER'
        |      WHEN 'UBIGINT' THEN 'INTEGER' WHEN 'DOUBLE' THEN 'DECIMAL'
        |      WHEN 'BOOLEAN' THEN 'BOOLEAN' WHEN 'NULL' THEN 'NULL_VALUE'
        |      ELSE 'OTHER' END AS vt
        |  FROM e)
        |SELECT event_id, vt,
        |  vt = 'ARRAY' AS is_arr,
        |  vt = 'OBJECT' AS is_obj,
        |  vt = 'INTEGER' AS is_int,
        |  vt = 'VARCHAR' AS is_str,
        |  vt = 'BOOLEAN' AS is_bool,
        |  vt = 'DECIMAL' AS is_dec,
        |  vt = 'NULL_VALUE' AS is_nullv,
        |  CASE WHEN vt = 'ARRAY'
        |       THEN CAST(json_array_length(vj::JSON) AS INTEGER) END AS arr_len,
        |  CASE WHEN vt = 'OBJECT'
        |       THEN array_to_string(json_keys(vj::JSON), ',') END AS obj_keys,
        |  TRY_CAST(json_extract_string(vj::JSON, '$[0]') AS BIGINT) AS vg_first,
        |  TRY_CAST(json_extract_string(vj::JSON, '$.a') AS BIGINT) AS vg_a
        |FROM t""".stripMargin,

    "fn_string4" ->
      """WITH p AS (SELECT p_partkey, p_name AS b FROM part WHERE p_partkey % 6 = 0),
        |t AS (SELECT p_partkey, b,
        |        list_filter(str_split_regex(b, '[ ]+'), x -> x <> '') AS toks,
        |        list_filter(str_split_regex(b, '[ao ]+'), x -> x <> '') AS toks2,
        |        string_split(b, ' ') AS raw
        |      FROM p)
        |SELECT p_partkey,
        |  substr(b, 1, 2) || 'XY' || substr(b, 7) AS ins_mid,
        |  '<<' || b AS ins_prepend,
        |  b || '>>' AS ins_append,
        |  replace(replace(replace(replace(replace(b, 'a', 'A'), 'e', 'E'),
        |    'i', ''), 'o', ''), 'u', '') AS tr_del,
        |  replace(replace(b, 'o', '1'), 'l', '0') AS tr_swap,
        |  toks[2] AS stk2,
        |  toks2[3] AS stk_set,
        |  raw[len(raw)] AS sp_neg,
        |  CAST(CASE WHEN position('a' IN substr(b, 5)) = 0 THEN 0
        |       ELSE position('a' IN substr(b, 5)) + 4 END AS INTEGER) AS ci2,
        |  repeat(left(b, 2), 3) AS rpt,
        |  'a' || repeat(' ', 3) || 'b' AS spc,
        |  left(b, 100) AS lft_big,
        |  right(b, 100) AS rgt_big,
        |  substr(b, 1, 4) || '***' || substr(b, 8) AS ovl_rep
        |FROM t""".stripMargin
  )
}
