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
    }),

    // DATE/TIME/TIMESTAMP_FROM_PARTS with Snowflake out-of-range rollover
    // (datetime_array_kernels.py construct_timestamp_util:2029,
    // date_from_parts_util:2192, time_array_kernels.py:141). Derived parts
    // range over negative months/days and >24h hours so every carry path
    // fires; the two docstring examples ride along as constant columns.
    "fn_datetime5" -> ((s, d) => {
      val k = col("o_orderkey")
      val mo = (k % 30 - 6).cast("int")
      val dd = (k % 90 - 20).cast("int")
      val hh = (k % 50).cast("int")
      val mi = (k % 150).cast("int")
      val sec = (k % 100).cast("int")
      orders(s, d).filter(k % 10 === 0).select(
        k,
        dateFromParts(lit(2020), mo, dd).cast("timestamp").as("dfp"),
        dateFromParts(lit(2000), lit(0), lit(100)).cast("timestamp").as("dfp_doc1"),
        dateFromParts(lit(2004), lit(-1), lit(-1)).cast("timestamp").as("dfp_doc2"),
        timestampFromParts(lit(2020), mo, dd, hh, mi, sec).as("tfp"),
        timestampFromParts(lit(2015), lit(7), lit(4), lit(12), lit(150), lit(0))
          .as("tfp_doc"),
        // TIMESTAMP_TZ_FROM_PARTS (construct_timestamp_util:2029 tz path):
        // the parts are interpreted in the GIVEN zone, localized AFTER the
        // rollover arithmetic exactly like the reference's tz_localize
        // note; fixed offset so the oracle is plain interval arithmetic.
        to_utc_timestamp(timestampFromParts(lit(2020), mo, dd, hh, mi, sec),
          "+05:30").as("tzfp"),
        timeFromPartsStr(hh, mi - 75, sec).as("tstr"),
        timeFromPartsNs(lit(0), lit(0), lit(0), (k * 12345678901L) % 172800000000000L)
          .as("tns"),
        timeFromPartsNs(lit(25), lit(70), lit(70), lit(0)).as("tns_roll"))
    }),

    // LAST_DAY with a date-part argument (datetime_array_kernels.py
    // last_day_year:562 / last_day_quarter:566 / last_day_week:574 —
    // Spark's last_day is month-only, so week/quarter/year compose from
    // date_trunc + offset; week policy is ISO Monday-start in Spark,
    // DuckDB, and the reference default) plus the FIRST-of-part family
    // via bare truncation.
    "fn_datetime6" -> ((s, d) => {
      val dt = col("o_orderdate")
      orders(s, d).filter(col("o_orderkey") % 15 === 0).select(
        col("o_orderkey"),
        date_add(date_trunc("WEEK", dt).cast("date"), 6)
          .cast("timestamp").as("ld_week"),
        date_sub(add_months(date_trunc("QUARTER", dt).cast("date"), 3), 1)
          .cast("timestamp").as("ld_quarter"),
        make_date(year(dt), lit(12), lit(31)).cast("timestamp").as("ld_year"),
        date_trunc("WEEK", dt).cast("date").cast("timestamp").as("fd_week"),
        date_trunc("QUARTER", dt).cast("date").cast("timestamp").as("fd_quarter"),
        date_trunc("YEAR", dt).cast("date").cast("timestamp").as("fd_year"))
    }),

    // Datetime long-tail round 3 (r9 VERDICT item 2): TO_CHAR double-quoted
    // literal escapes through the rewritten sfFormatToSpark (incl. ""-escape
    // and embedded apostrophes), MySQL TO_SECONDS day-number arithmetic,
    // TIMESTAMP_FROM_DATE_AND_TIME over the TIME LongType-nanos convention,
    // GET_TIMEZONE_OFFSET, ISO-weeks-in-year (52/53 via the Dec-28 rule,
    // get_iso_weeks_between_years), negative-epoch unit inference
    // (number_to_datetime |n| rule), explicit-scale TO_TIMESTAMP(n, scale),
    // sub-second TIMESTAMPADD, TIME_SLICE at day/year grain (1970 anchor),
    // and day-time interval×integer multiply.
    "fn_datetime7" -> ((s, d) => {
      val k = col("o_orderkey")
      val dt = col("o_orderdate")
      val ts2 = timestamp_seconds(unix_timestamp(dt.cast("timestamp")) + (k % 86400))
      val dd = datediff(dt, lit("1970-01-01"))
      val yoff = year(dt) - 1970
      orders(s, d).filter(k % 20 === 0).select(
        k,
        toCharDt(dt, "YYYY \"year\" MM").as("tc_lit"),
        toCharDt(dt, "\"on \"\"day\"\" \"DD").as("tc_esc"),
        toCharDt(dt, "\"it's\" MON").as("tc_apos"),
        toCharDt(ts2, "HH24\"h\"MI\"m\"").as("tc_mixed"),
        ((dd.cast("long") + 719528L) * 86400L + (k % 86400)).as("tsec"),
        timestampFromDateAndTime(dt, (k % 86400) * 1000000000L + 123456789L)
          .as("tfdt"),
        tzOffsetMinutes(ts2, "+05:30").as("tzoff_ist"),
        tzOffsetMinutes(ts2, "-03:15").as("tzoff_neg"),
        weekofyear(make_date(year(dt), lit(12), lit(28))).as("iso_weeks_y"),
        numberToTs(lit(-40000000000L)).as("n2ts_negms"),
        numberToTsScale(k * 1000000L + 123L, 3).as("n2ts_s3"),
        numberToTsScale(k * 1000000000L + 987654321L, 9).as("n2ts_s9"),
        expr("timestampadd(MILLISECOND, o_orderkey % 1000, " +
          "cast(o_orderdate as timestamp))").as("add_ms"),
        expr("timestampadd(MICROSECOND, o_orderkey % 999983, " +
          "cast(o_orderdate as timestamp))").as("add_us"),
        date_add(lit("1970-01-01").cast("date"), dd - pmod(dd, lit(5)))
          .cast("timestamp").as("day_slice5"),
        make_date(lit(1970) + yoff - pmod(yoff, lit(2)), lit(1), lit(1))
          .cast("timestamp").as("year_slice2"),
        (dt.cast("timestamp") + expr("interval '1' day * (o_orderkey % 7)"))
          .as("imul_day"))
    }),

    // Datetime long-tail round 4 (r10 VERDICT item 8): the nanosecond-grain
    // family on the µs engine — ADD_INTERVAL_NANOSECONDS
    // (datetime_array_kernels.py:259), DATEDIFF(NANOSECOND) (diff_nanosecond
    // :487), TIMESTAMP_FROM_PARTS with the nanosecond argument rolling into
    // seconds (construct_timestamp:264) — plus quarter-boundary DATEDIFF
    // (diff_quarter:491, Snowflake counts QUARTER boundaries crossed, NOT
    // complete quarters, so it is computed as the (year*4+quarter) ordinal
    // difference in both engines) and the sub-second extraction kernels
    // get_millisecond/get_microsecond/get_nanosecond (:535-543). Nanos are
    // truncated to the µs grain by integer division; all ns operands are
    // kept non-negative so Spark `div` and DuckDB `//` agree exactly.
    "fn_datetime8" -> ((s, d) => {
      val k = col("o_orderkey")
      val dt = col("o_orderdate")
      val tsUsSql =
        "timestampadd(MICROSECOND, o_orderkey % 999983, cast(o_orderdate as timestamp))"
      val tsUs = expr(tsUsSql)
      // integral truncation (`div`), never float division — exact in both engines
      val nsDivUs = expr("((o_orderkey * 12345) % 3000000000) div 1000")
      val negDivUs = expr("(o_orderkey % 999999) div 1000")
      val usPart = pmod(unix_micros(tsUs), lit(1000000L))
      orders(s, d).filter(k % 20 === 0).select(
        k,
        tsUs.as("ts_us"),
        expr(s"pmod(unix_micros($tsUsSql), 1000000) div 1000").as("get_ms"),
        usPart.as("get_us"),
        (usPart * 1000).as("get_ns"),
        (lit(1995 * 4 + 2) - (year(dt) * 4 + quarter(dt))).cast("long").as("diff_q"),
        expr(s"timestampdiff(MICROSECOND, $tsUsSql, " +
          "timestamp'1995-06-17 00:00:00') * 1000").as("diff_ns"),
        timestamp_micros(unix_micros(tsUs) + nsDivUs).as("add_ns"),
        timestamp_micros(unix_micros(tsUs) - negDivUs).as("add_ns_neg"),
        timestamp_micros(
          unix_micros(timestampFromParts(lit(2020), lit(3), lit(1),
            lit(0), lit(0), lit(0))) + nsDivUs).as("tfp_ns"))
    }),

    // other_array_kernels long tail: the IS [NOT] TRUE/FALSE predicate
    // quartet over nullable booleans (is_true:…/is_not_false — null is
    // neither true nor false), BITNOT, arithmetic right-shift of
    // negatives, GET's 0-based/negative/out-of-range indexing
    // (arr_get), ARRAY_SLICE including from-the-end, ARRAY_REMOVE_AT
    // (nested_data_kernels), OBJECT_INSERT with update-flag overwrite
    // semantics (the insert-new path is fn_json2's `oins`), ORD/ASCII,
    // STRCMP's sign contract, and the substring-suffix form.
    "fn_other2" -> ((s, d) => {
      val k = col("p_partkey")
      val b = when(k % 3 === 0, lit(null).cast("boolean")).otherwise(k % 2 === 0)
      val arr = split(col("p_name"), " ")
      val m = map_from_arrays(
        array(lit("brand"), lit("type")),
        array(col("p_brand"), col("p_type")))
      def aj(c: org.apache.spark.sql.Column) = array_join(c, ",")
      part(s, d).filter(k % 8 === 0).select(
        k,
        b.eqNullSafe(true).as("is_t"),
        (!b.eqNullSafe(true)).as("is_nt"),
        b.eqNullSafe(false).as("is_f"),
        (!b.eqNullSafe(false)).as("is_nf"),
        bitwise_not(k % 256).as("bnot"),
        shiftright((-(k % 1000)).cast("int"), 2).as("bshr_neg"),
        shiftleft((k % 1000).cast("int"), 3).as("bshl"),
        get(arr, lit(1)).as("get0"),
        get(arr, lit(99)).as("get_oob"),
        try_element_at(arr, lit(-1)).as("get_neg"),
        aj(slice(arr, 2, 3)).as("aslice"),
        aj(slice(arr, -2, 2)).as("aslice_end"),
        aj(concat(slice(arr, 1, 1), slice(arr, 3, 1000))).as("aremove_at"),
        to_json(map_concat(map_filter(m, (key, _) => key =!= "type"),
          map(lit("type"), lit("X")))).as("oins_upd"),
        ascii(substring(col("p_name"), 1, 1)).as("ord_a"),
        when(col("p_name") < col("p_type"), -1)
          .when(col("p_name") > col("p_type"), 1).otherwise(0).as("strcmp"),
        substring(col("p_name"), 8, 1000000).as("suffix"))
    }),

    // The r8 kernel layer through the SQL surface: every function below
    // is resolved from the session FunctionRegistry (GraftExtensions ->
    // SnowflakeAliases), so Snowflake-dialect TEXT runs verbatim — the
    // same compositions the DSL entries pin, now reachable from
    // spark.sql. Names that would shadow a Spark builtin carry an sf_
    // prefix (sf_to_char, sf_regexp_substr, sf_last_day) so builtin
    // semantics are never silently replaced.
    "fn_snowflake_sql2" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_sf2")
      s.sql("""
        SELECT o_orderkey,
          date_from_parts(2020, CAST(o_orderkey % 30 - 6 AS INT),
            CAST(o_orderkey % 90 - 20 AS INT)) AS dfp,
          timestamp_from_parts(2020, 1, 1, CAST(o_orderkey % 50 AS INT),
            CAST(o_orderkey % 150 AS INT), 0) AS tfp,
          time_from_parts(25, 70, CAST(o_orderkey % 100 AS INT)) AS tns,
          time_from_parts_str(0, CAST(o_orderkey % 150 AS INT) - 75, 30) AS tstr,
          sf_to_char(o_orderdate, 'DD/MON/YYYY') AS tc,
          sf_try_to_date(concat(lpad(CAST(o_orderkey % 28 + 1 AS STRING), 2, '0'),
            '/02/2024'), 'DD/MM/YYYY') AS ttd,
          try_to_boolean(CASE WHEN o_orderkey % 3 = 0 THEN 'on'
                              WHEN o_orderkey % 3 = 1 THEN 'off'
                              ELSE 'maybe' END) AS ttb,
          sf_regexp_substr(o_orderpriority, '[0-9]+') AS rsub,
          charindex('-', o_orderpriority) AS rins,
          sf_regexp_count(o_orderpriority, '[aeiou]', 1, 'i') AS rcnt,
          sf_last_day(o_orderdate, 'quarter') AS ldq,
          sf_last_day(o_orderdate, 'week') AS ldw,
          hex_encode(o_orderstatus, 0) AS hexlc,
          try_hex_decode_string(CASE WHEN o_orderkey % 2 = 0
            THEN hex(o_orderstatus) ELSE 'XY!Z' END) AS thd,
          base64_encode(CAST(o_orderstatus AS BINARY)) AS b64,
          try_base64_decode_string(CASE WHEN o_orderkey % 2 = 0
            THEN base64(CAST(o_orderstatus AS BINARY)) ELSE '!!' END) AS tbd
        FROM orders_sf2 WHERE o_orderkey % 12 = 0""")
        .withColumn("dfp", col("dfp").cast("timestamp"))
        .withColumn("ldq", col("ldq").cast("timestamp"))
        .withColumn("ldw", col("ldw").cast("timestamp"))
    }),

    // r9 verdict item 6 — the registry completions, exercised as verbatim
    // SQL text: REGEXP_INSTR position/occurrence/option/flags, scaled
    // REGEXP_REPLACE incl. occurrence-targeted replacement with
    // Snowflake-style \N backreferences, and TRY_TO_DECIMAL(p, s) over
    // valid / garbage / overflowing inputs.
    "fn_snowflake_sql3" -> ((s, d) => {
      part(s, d).createOrReplaceTempView("part_sf3")
      s.sql("""
        WITH p AS (SELECT p_partkey,
          concat(p_name, ' ', lower(p_type)) AS nm FROM part_sf3
          WHERE p_partkey % 7 = 0)
        SELECT p_partkey,
          sf_regexp_instr(nm, '[aeiou]{2}') AS ri_first,
          sf_regexp_instr(nm, '[aeiou]{2}', 3, 2) AS ri_pos_occ,
          sf_regexp_instr(nm, '[aeiou]{2}', 1, 2, 1) AS ri_end,
          sf_regexp_instr(nm, 'zqx[0-9]+') AS ri_absent,
          sf_regexp_instr(nm, 'S[a-z]+', 1, 1, 0, 'i') AS ri_flags,
          sf_regexp_replace(nm, '[aeiou]', '*', 4) AS rr_from_pos,
          sf_regexp_replace(nm, '([a-z])([aeiou])', '<\\2\\1>', 1, 2) AS rr_occ2,
          sf_regexp_replace(nm, 'zzz', 'X', 1, 3) AS rr_absent,
          CAST(try_to_decimal(element_at(array('12.346','7.1289','-93.45','1e2',
            'abc','','42','0.004'), CAST(p_partkey % 8 AS INT) + 1), 10, 2)
            AS DOUBLE) AS td_mixed,
          CAST(try_to_decimal(CAST(p_partkey * 977 AS STRING), 5, 0)
            AS DOUBLE) AS td_overflow,
          CAST(try_to_decimal(CAST(p_partkey % 97 AS STRING)) AS DOUBLE) AS td_default
        FROM p""")
    }),

    // Crypto/encode kernels (crypto_funcs.py): SHA2 digest sizes, hex
    // encode/decode incl. the TRY path, BASE64_ENCODE line-wrapping and
    // alphabet-override args, TRY_BASE64_DECODE validation. SHA1/224/384/
    // 512 run over a fixed literal vocabulary because DuckDB 1.0 only
    // ships sha256 — the oracle pins reference-computed digests per word.
    "fn_crypto" -> ((s, d) => {
      val k = col("p_partkey")
      val w = element_at(array(
        lit("Robert"), lit("Rupert"), lit("Ashcraft"), lit("Tymczak"),
        lit("Pfister"), lit("Honeyman"), lit("Graft"), lit("Obrien")),
        (k % 8 + 1).cast("int"))
      val nameBin = col("p_name").cast("binary")
      val rnd16 = unhex(md5(col("p_name"))) // 16 high-entropy bytes
      val hexIn = when(k % 2 === 0, hex(col("p_name"))).otherwise(lit("XYZZ"))
      val b64In = when(k % 3 === 0, base64(nameBin)).otherwise(lit("not!!valid"))
      part(s, d).filter(k % 7 === 0).select(
        k,
        sha1(w).as("h_sha1"),
        sha2(w, 224).as("h_sha224"),
        sha2(w, 384).as("h_sha384"),
        sha2(w, 512).as("h_sha512"),
        lower(hex(col("p_name"))).as("hex_lc"),
        unhex(hex(col("p_name"))).cast("string").as("hex_rt"),
        tryHexDecodeString(hexIn).as("hex_try"),
        base64EncodeSf(rnd16, maxLineLength = 8).as("b64_lines"),
        base64EncodeSf(rnd16, alphabet = "$%").as("b64_alpha"),
        tryBase64DecodeString(b64In).as("b64_try"))
    }),

    // Inverse hyperbolic kernels (trig_array_kernels.py: acosh/asinh/
    // atanh — the last three uncovered rows of the trig module) plus
    // their round-trip identities. l_discount ∈ [0, 0.1] keeps every
    // input inside the principal domain (atanh needs |x|<1, acosh ≥1).
    // DuckDB ships no inverse hyperbolics, so the oracle pins the exact
    // log identities the kernels are defined by.
    "fn_trig2" -> ((s, d) => {
      val x = col("l_discount")
      lineitem(s, d).filter(col("l_orderkey") % 100 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        asinh(x).as("ash"),
        acosh(x + 1.0).as("ach"),
        atanh(x).as("ath"),
        sinh(asinh(x)).as("ash_rt"),
        tanh(atanh(x)).as("ath_rt"))
    }),

    // Semi-structured null-rule long tail (nested_data_kernels.py +
    // variadic_array_kernels.py): ARRAY_SIZE (null for non-array input),
    // TO_ARRAY vs ARRAY_CONSTRUCT null rules (TO_ARRAY(NULL)=NULL but
    // ARRAY_CONSTRUCT(NULL)=[NULL] — variadic_array_kernels.py:1420),
    // ARRAY_SLICE's 0-based end-exclusive window (nested_data_kernels.py
    // array_slice), JSON_EXTRACT_PATH_TEXT's dotted-path addressing
    // (json_array_kernels.py json_extract_path_text), TO_OBJECT round-trip,
    // and DAYOFWEEKISO (datetime_array_kernels.py dayofweekiso).
    "fn_semi3" -> ((s, d) => {
      val ev = events(s, d).filter(col("event_id") % 25 === 0)
      val vNull = when(col("event_id") % 3 === 0, col("event_type")) // sometimes-null scalar
      val arr = split(col("event_type"), "_") // small word array
      ev.select(
        col("event_id"),
        // ARRAY_SIZE: null-in → null-out (not -1, not 0)
        when(vNull.isNull, lit(null).cast("long"))
          .otherwise(size(array(vNull)).cast("long")).as("asz"),
        size(arr).cast("long").as("asz2"),
        // TO_ARRAY(NULL) = NULL; ARRAY_CONSTRUCT(NULL) = [NULL]
        when(vNull.isNull, lit(null))
          .otherwise(to_json(array(vNull))).as("to_arr"),
        to_json(array(vNull)).as("arr_con"),
        // ARRAY_SLICE(arr, 1, 3): 0-based, end-exclusive → Spark slice(2, 2)
        array_join(slice(arr, 2, 2), ",").as("aslice"),
        // JSON_EXTRACT_PATH_TEXT(props, 'k') — dotted path without '$.'
        get_json_object(col("props"), "$.k").as("jept"),
        // TO_OBJECT round-trip: JSON text → map → canonical text
        to_json(from_json(col("props"), lit("map<string,string>"))).as("to_obj"),
        // DAYOFWEEKISO: 1=Monday … 7=Sunday (weekday() is 0-based Monday)
        (weekday(col("ts").cast("date")) + 1).cast("long").as("dowiso"))
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
        |FROM t""".stripMargin,

    "fn_datetime5" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_orderkey % 30 - 6 AS INTEGER) AS mo,
        |    CAST(o_orderkey % 90 - 20 AS INTEGER) AS dd,
        |    CAST(o_orderkey % 50 AS INTEGER) AS hh,
        |    CAST(o_orderkey % 150 AS INTEGER) AS mi,
        |    CAST(o_orderkey % 100 AS INTEGER) AS sec
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |x AS (
        |  SELECT *,
        |    ((hh*3600 + (mi-75)*60 + sec) % 86400 + 86400) % 86400 AS w
        |  FROM o)
        |SELECT k AS o_orderkey,
        |  CAST(CAST(make_date(2020,1,1) + to_months(mo - 1) + to_days(dd - 1)
        |       AS DATE) AS TIMESTAMP) AS dfp,
        |  CAST(CAST(make_date(2000,1,1) + to_months(-1) + to_days(99)
        |       AS DATE) AS TIMESTAMP) AS dfp_doc1,
        |  CAST(CAST(make_date(2004,1,1) + to_months(-2) + to_days(-2)
        |       AS DATE) AS TIMESTAMP) AS dfp_doc2,
        |  CAST(make_date(2020,1,1) + to_months(mo - 1) + to_days(dd - 1) AS TIMESTAMP)
        |    + to_seconds(CAST(hh AS BIGINT)*3600 + mi*60 + sec) AS tfp,
        |  CAST(make_date(2015,1,1) + to_months(6) + to_days(3) AS TIMESTAMP)
        |    + to_seconds(CAST(12*3600 + 150*60 AS BIGINT)) AS tfp_doc,
        |  CAST(make_date(2020,1,1) + to_months(mo - 1) + to_days(dd - 1) AS TIMESTAMP)
        |    + to_seconds(CAST(hh AS BIGINT)*3600 + mi*60 + sec) - to_minutes(330) AS tzfp,
        |  lpad(CAST(w // 3600 AS VARCHAR), 2, '0') || ':' ||
        |    lpad(CAST((w % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
        |    lpad(CAST(w % 60 AS VARCHAR), 2, '0') AS tstr,
        |  ((k * 12345678901) % 172800000000000) % 86400000000000 AS tns,
        |  (CAST(25*3600 + 70*60 + 70 AS BIGINT) * 1000000000) % 86400000000000 AS tns_roll
        |FROM x""".stripMargin,

    "fn_datetime6" ->
      """SELECT o_orderkey,
        |  CAST(CAST(date_trunc('week', o_orderdate) + to_days(6) AS DATE) AS TIMESTAMP) AS ld_week,
        |  CAST(CAST(date_trunc('quarter', o_orderdate) + to_months(3) + to_days(-1) AS DATE) AS TIMESTAMP) AS ld_quarter,
        |  CAST(make_date(CAST(year(o_orderdate) AS INTEGER), 12, 31) AS TIMESTAMP) AS ld_year,
        |  CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS TIMESTAMP) AS fd_week,
        |  CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS TIMESTAMP) AS fd_quarter,
        |  CAST(CAST(date_trunc('year', o_orderdate) AS DATE) AS TIMESTAMP) AS fd_year
        |FROM orders WHERE o_orderkey % 15 = 0""".stripMargin,

    "fn_datetime7" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_orderdate AS dt,
        |    CAST(o_orderdate AS TIMESTAMP) + to_seconds(o_orderkey % 86400) AS ts2,
        |    date_diff('day', DATE '1970-01-01', o_orderdate) AS dd,
        |    year(o_orderdate) - 1970 AS yoff
        |  FROM orders WHERE o_orderkey % 20 = 0)
        |SELECT k AS o_orderkey,
        |  strftime(dt, '%Y year %m') AS tc_lit,
        |  strftime(dt, 'on "day" %d') AS tc_esc,
        |  strftime(dt, 'it''s %b') AS tc_apos,
        |  strftime(ts2, '%Hh%Mm') AS tc_mixed,
        |  CAST((dd + 719528) * 86400 + k % 86400 AS BIGINT) AS tsec,
        |  CAST(dt AS TIMESTAMP)
        |    + to_microseconds(((k % 86400) * 1000000000 + 123456789) // 1000) AS tfdt,
        |  CAST(330 AS BIGINT) AS tzoff_ist,
        |  CAST(-195 AS BIGINT) AS tzoff_neg,
        |  CAST(weekofyear(make_date(year(dt), 12, 28)) AS INTEGER) AS iso_weeks_y,
        |  epoch_ms(CAST(-40000000000 AS BIGINT)) AS n2ts_negms,
        |  make_timestamp((k * 1000000 + 123) * 1000) AS n2ts_s3,
        |  make_timestamp((k * 1000000000 + 987654321) // 1000) AS n2ts_s9,
        |  CAST(dt AS TIMESTAMP) + to_milliseconds(k % 1000) AS add_ms,
        |  CAST(dt AS TIMESTAMP) + to_microseconds(k % 999983) AS add_us,
        |  CAST(CAST(DATE '1970-01-01' + to_days(CAST(dd - dd % 5 AS INTEGER)) AS DATE) AS TIMESTAMP) AS day_slice5,
        |  CAST(make_date(1970 + yoff - yoff % 2, 1, 1) AS TIMESTAMP) AS year_slice2,
        |  CAST(dt AS TIMESTAMP) + to_days(CAST(k % 7 AS INTEGER)) AS imul_day
        |FROM o""".stripMargin,

    "fn_datetime8" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_orderdate AS TIMESTAMP) + to_microseconds(o_orderkey % 999983) AS ts_us,
        |    CAST(1995 * 4 + 2 - (year(o_orderdate) * 4 + quarter(o_orderdate)) AS BIGINT) AS diff_q,
        |    ((o_orderkey * 12345) % 3000000000) // 1000 AS ns_us,
        |    (o_orderkey % 999999) // 1000 AS neg_us
        |  FROM orders WHERE o_orderkey % 20 = 0)
        |SELECT k AS o_orderkey, ts_us,
        |  CAST((epoch_us(ts_us) % 1000000) // 1000 AS BIGINT) AS get_ms,
        |  CAST(epoch_us(ts_us) % 1000000 AS BIGINT) AS get_us,
        |  CAST((epoch_us(ts_us) % 1000000) * 1000 AS BIGINT) AS get_ns,
        |  diff_q,
        |  CAST((epoch_us(TIMESTAMP '1995-06-17 00:00:00') - epoch_us(ts_us)) * 1000 AS BIGINT) AS diff_ns,
        |  ts_us + to_microseconds(ns_us) AS add_ns,
        |  ts_us - to_microseconds(neg_us) AS add_ns_neg,
        |  TIMESTAMP '2020-03-01 00:00:00' + to_microseconds(ns_us) AS tfp_ns
        |FROM o""".stripMargin,

    "fn_other2" ->
      """WITH p AS (
        |  SELECT p_partkey AS k, p_name, p_brand, p_type,
        |    CASE WHEN p_partkey % 3 = 0 THEN NULL
        |         ELSE p_partkey % 2 = 0 END AS b,
        |    string_split(p_name, ' ') AS arr
        |  FROM part WHERE p_partkey % 8 = 0)
        |SELECT k AS p_partkey,
        |  coalesce(b = TRUE, FALSE) AS is_t,
        |  NOT coalesce(b = TRUE, FALSE) AS is_nt,
        |  coalesce(b = FALSE, FALSE) AS is_f,
        |  NOT coalesce(b = FALSE, FALSE) AS is_nf,
        |  ~(k % 256) AS bnot,
        |  CAST((-(k % 1000)) >> 2 AS INTEGER) AS bshr_neg,
        |  CAST((k % 1000) << 3 AS INTEGER) AS bshl,
        |  arr[2] AS get0,
        |  arr[100] AS get_oob,
        |  arr[-1] AS get_neg,
        |  array_to_string(arr[2:4], ',') AS aslice,
        |  array_to_string(arr[greatest(len(arr) - 1, 1):len(arr)], ',') AS aslice_end,
        |  array_to_string(arr[1:1] || arr[3:], ',') AS aremove_at,
        |  CAST(json_object('brand', p_brand, 'type', 'X') AS VARCHAR) AS oins_upd,
        |  CAST(ascii(substr(p_name, 1, 1)) AS INTEGER) AS ord_a,
        |  CASE WHEN p_name < p_type THEN -1
        |       WHEN p_name > p_type THEN 1 ELSE 0 END AS strcmp,
        |  substr(p_name, 8) AS suffix
        |FROM p""".stripMargin,

    "fn_snowflake_sql2" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_orderdate AS dt, o_orderstatus AS st,
        |    o_orderpriority AS pri,
        |    CAST(o_orderkey % 30 - 6 AS INTEGER) AS mo,
        |    CAST(o_orderkey % 90 - 20 AS INTEGER) AS dd
        |  FROM orders WHERE o_orderkey % 12 = 0),
        |x AS (SELECT *,
        |    ((0*3600 + (CAST(k % 150 AS INTEGER) - 75)*60 + 30) % 86400 + 86400) % 86400 AS w
        |  FROM o)
        |SELECT k AS o_orderkey,
        |  CAST(CAST(make_date(2020,1,1) + to_months(mo - 1) + to_days(dd - 1)
        |       AS DATE) AS TIMESTAMP) AS dfp,
        |  CAST(make_date(2020,1,1) AS TIMESTAMP)
        |    + to_seconds(CAST(k % 50 AS BIGINT)*3600 + (k % 150)*60) AS tfp,
        |  (CAST(25*3600 + 70*60 + (k % 100) AS BIGINT) * 1000000000) % 86400000000000 AS tns,
        |  lpad(CAST(w // 3600 AS VARCHAR), 2, '0') || ':' ||
        |    lpad(CAST((w % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
        |    lpad(CAST(w % 60 AS VARCHAR), 2, '0') AS tstr,
        |  strftime(dt, '%d/%b/%Y') AS tc,
        |  CAST(CAST(strptime(lpad(CAST(k % 28 + 1 AS VARCHAR), 2, '0') || '/02/2024',
        |    '%d/%m/%Y') AS DATE) AS TIMESTAMP) AS ttd,
        |  CASE WHEN k % 3 = 0 THEN TRUE WHEN k % 3 = 1 THEN FALSE END AS ttb,
        |  regexp_extract_all(pri, '[0-9]+')[1] AS rsub,
        |  CAST(position('-' IN pri) AS INTEGER) AS rins,
        |  CAST(len(regexp_extract_all(pri, '(?i)[aeiou]')) AS INTEGER) AS rcnt,
        |  CAST(CAST(date_trunc('quarter', dt) + to_months(3) + to_days(-1) AS DATE) AS TIMESTAMP) AS ldq,
        |  CAST(CAST(date_trunc('week', dt) + to_days(6) AS DATE) AS TIMESTAMP) AS ldw,
        |  lower(hex(st)) AS hexlc,
        |  CASE WHEN k % 2 = 0 THEN st END AS thd,
        |  to_base64(st::BLOB) AS b64,
        |  CASE WHEN k % 2 = 0 THEN st END AS tbd
        |FROM x""".stripMargin,

    // DuckDB 1.0 has no regexp_instr and its regexp_replace can't target
    // an occurrence — both are reconstructed from the same primitives the
    // engine composes: string_split_regex gives the text BETWEEN matches,
    // so the k-th match starts at pos + len(join(parts[1:k])) +
    // len(join(matches[1:k-1])).
    "fn_snowflake_sql3" ->
      """WITH b AS (
        |  SELECT p_partkey, p_name || ' ' || lower(p_type) AS nm
        |  FROM part WHERE p_partkey % 7 = 0),
        |p AS (
        |  SELECT p_partkey, nm,
        |    regexp_extract_all(nm, '[aeiou]{2}') AS m1,
        |    string_split_regex(nm, '[aeiou]{2}') AS s1,
        |    regexp_extract_all(substr(nm, 3), '[aeiou]{2}') AS m2,
        |    string_split_regex(substr(nm, 3), '[aeiou]{2}') AS s2,
        |    regexp_extract_all(nm, '(?i)S[a-z]+') AS mf,
        |    string_split_regex(nm, '(?i)S[a-z]+') AS sf,
        |    regexp_extract_all(nm, '([a-z])([aeiou])') AS mr,
        |    string_split_regex(nm, '([a-z])([aeiou])') AS sr
        |  FROM b)
        |SELECT p_partkey,
        |  CAST(CASE WHEN len(m1) >= 1
        |    THEN 1 + length(array_to_string(s1[1:1], '')) ELSE 0 END AS INTEGER) AS ri_first,
        |  CAST(CASE WHEN len(m2) >= 2
        |    THEN 3 + length(array_to_string(s2[1:2], ''))
        |       + length(array_to_string(m2[1:1], '')) ELSE 0 END AS INTEGER) AS ri_pos_occ,
        |  CAST(CASE WHEN len(m1) >= 2
        |    THEN 1 + length(array_to_string(s1[1:2], ''))
        |       + length(array_to_string(m1[1:1], '')) + length(m1[2]) ELSE 0 END AS INTEGER) AS ri_end,
        |  0 AS ri_absent,
        |  CAST(CASE WHEN len(mf) >= 1
        |    THEN 1 + length(array_to_string(sf[1:1], '')) ELSE 0 END AS INTEGER) AS ri_flags,
        |  substr(nm, 1, 3) ||
        |    regexp_replace(substr(nm, 4), '[aeiou]', '*', 'g') AS rr_from_pos,
        |  CASE WHEN len(mr) >= 2
        |    THEN sr[1] || mr[1] || sr[2] ||
        |      regexp_replace(mr[2], '^(?:([a-z])([aeiou]))$', '<\2\1>') ||
        |      substr(nm,
        |        length(sr[1] || mr[1] || sr[2]) + length(mr[2]) + 1)
        |    ELSE nm END AS rr_occ2,
        |  nm AS rr_absent,
        |  CAST(TRY_CAST(['12.346','7.1289','-93.45','1e2','abc','','42','0.004']
        |    [CAST(p_partkey % 8 AS INTEGER) + 1] AS DECIMAL(10,2)) AS DOUBLE) AS td_mixed,
        |  CAST(TRY_CAST(CAST(p_partkey * 977 AS VARCHAR) AS DECIMAL(5,0)) AS DOUBLE) AS td_overflow,
        |  CAST(TRY_CAST(CAST(p_partkey % 97 AS VARCHAR) AS DECIMAL(38,0)) AS DOUBLE) AS td_default
        |FROM p""".stripMargin,

    "fn_crypto" ->
      """WITH p AS (
        |  SELECT p_partkey AS k, p_name,
        |    ['Robert','Rupert','Ashcraft','Tymczak','Pfister','Honeyman',
        |     'Graft','Obrien'][CAST(p_partkey % 8 AS INTEGER) + 1] AS w,
        |    unhex(md5(p_name)) AS rnd16
        |  FROM part WHERE p_partkey % 7 = 0)
        |SELECT k AS p_partkey,
        |  CASE w
        |    WHEN 'Robert' THEN 'b7f73c5b66dca06b94aa7a7134c24e0159e1dd0a'
        |    WHEN 'Rupert' THEN '2968f1f9f9049808f5098ddc33968d3a133a988d'
        |    WHEN 'Ashcraft' THEN '291b89fe8657d98e8b17ff73d755d69f9f4569a3'
        |    WHEN 'Tymczak' THEN '03aa30387e9b7eec242c70dedf3b398897a49aeb'
        |    WHEN 'Pfister' THEN 'f55c9719db075dde825aa40c60b5159c3336f948'
        |    WHEN 'Honeyman' THEN 'd12ad60fb9ab3930905ea2aa4c45dbb953ff74a0'
        |    WHEN 'Graft' THEN 'd49848d6b44d57262f5223b5f269326055d2ef0e'
        |    WHEN 'Obrien' THEN 'ffce1211c077a769d40027fbf0d4830675c73ded'
        |  END AS h_sha1,
        |  CASE w
        |    WHEN 'Robert' THEN 'eb26be32bb78cb41db8ed8cda978941a2b01af786ca9c4de6fbbb2a3'
        |    WHEN 'Rupert' THEN '87426a12cafb97b325aa9061fddbe28c49ad256f76c3fb4cd69932ef'
        |    WHEN 'Ashcraft' THEN '3f8b2a416a3b5d017c1495472e7a0abd6678b2522f2067e1156a35e5'
        |    WHEN 'Tymczak' THEN 'bc7fd2c1a3753380da2367766f249a49b9caebaa5c03880b0684a294'
        |    WHEN 'Pfister' THEN '6f8467c7077f2c4e6ee76a7f4df64e3336be9f823132d1fa2591a2d6'
        |    WHEN 'Honeyman' THEN '02e56a77eebf7b0bd4be42221d6e4b60a9aae8608da85c56b430a19a'
        |    WHEN 'Graft' THEN 'f4fdb59ffd0c24f4e8c904089e9934b381eb772a73742ffb9ed09c8e'
        |    WHEN 'Obrien' THEN '27993cdf62c3b8751b3c2e18db55ee1337dd1ccbc47a2e5e705e6a92'
        |  END AS h_sha224,
        |  CASE w
        |    WHEN 'Robert' THEN '47db3fd5d1131e4287f01eed1f2626d7d545ed18e2a4474d9e940485f418159c1a5628fb5a3373c5512a422a3e294c71'
        |    WHEN 'Rupert' THEN 'a124ac8f1f13ab388dc7b63272fe34554231fb1efd7768442ed4b773b6291740c776e19afecd2b8167a09418bd1c1a19'
        |    WHEN 'Ashcraft' THEN '5ecf4848c5dfc057ff1e47d8d2c7b35ad274e362b61c2f42f8be999d12e23afba92808cda165770a7bed97aa21d67a0e'
        |    WHEN 'Tymczak' THEN '16313ad3bab6cf311914700e43d01be3b6f0cd1ea6ad784d3ae0c4762a83a03a8b942cf9c017fb79f4f4ef52d0679f97'
        |    WHEN 'Pfister' THEN 'e8b3b417ccfaee86bbe47eec800fed0b154be4b13dde53947dd35d7daf015c61dfe91cb0a5bc555f78605ab1e27f4d36'
        |    WHEN 'Honeyman' THEN '0ae9b62d9593ae22bdb8ada684c2ba413c55d92058f69ccbaef3ecf515f4a3bbaff7f71c0f1d8d0b7d6576f9a9c98006'
        |    WHEN 'Graft' THEN '8381d415787cf39a32ca986a22d17c2b39298177b65559b856bd4d9a306b26ed1b5cff20882f9a404fc9a7aad693515e'
        |    WHEN 'Obrien' THEN '5a273e6df82784df0a861f146714e42cbf1212c7c704936203e8809f067ba7ac92a187717e11d979a6e30366a304b401'
        |  END AS h_sha384,
        |  CASE w
        |    WHEN 'Robert' THEN '45c35c2cda6d6bc32a41f7e183f1f6687eef37818dcf62d858e706df26d5cb328cf1be60fea4a509885184387be96e6e233e60972607b7933e678b1ab4bd7bd8'
        |    WHEN 'Rupert' THEN '735f4ea72549c295fff81e2ee0dfb4d3413d40b69f3c1dc434dc8b1e38203dd6b45328fd44737b51a9fdfcb577f4b52dab7b5b78a15de1b1e821ecfd427e56a8'
        |    WHEN 'Ashcraft' THEN 'ee2842879a291f5bff2062339de328944759a4133a3de4f376997c81fe83e9fdf69968c0959d10348cef4725247d7999d42d9c31cb79fe4cb27aef4291779ad1'
        |    WHEN 'Tymczak' THEN 'ac510a437d027c91c56bcc17d8f42effc3411fd2471bd4edcd74973b3545f0d000f78da9c87bb66ccab6e47f1ff41b3e06bd79f38c11a0345dac699262d08f76'
        |    WHEN 'Pfister' THEN 'c5830dbcad8f2901ebd99882a597f33e8083494d2ad85faca978d46d82ef15d2fbd2897940f136f62e86795e8a412f34c88ee12e836dd378e7e1c218a12dcdc0'
        |    WHEN 'Honeyman' THEN '38cd47be9b7b800a5dbe079fd77bfd678090b411a652629de7191f21834ece6ecddd4cea3526a89829e1eaf965e2b4f6eff206a4a03a5dba87ffd789e629d4d7'
        |    WHEN 'Graft' THEN 'ca30352ece5171bab43436df0fbbabedb4d41ca0421f92265cb997fd939660fbc3954d3d3617b71c9c51e3c7d014c66900bc09a4fbc1298daab952c84bd01404'
        |    WHEN 'Obrien' THEN '243a26efc5c205abc5f575134d0fe5ee315eb8ea9b720705d185c4e5f6df5e0520f9786ff40fe4a2960b087576c4f05f4d8cf77da8f1c65a2a4f103e5d7175a8'
        |  END AS h_sha512,
        |  lower(hex(p_name)) AS hex_lc,
        |  p_name AS hex_rt,
        |  CASE WHEN k % 2 = 0 THEN p_name ELSE NULL END AS hex_try,
        |  regexp_replace(to_base64(rnd16), '(.{8})', '\1' || chr(10), 'g') AS b64_lines,
        |  translate(to_base64(rnd16), '+/', '$%') AS b64_alpha,
        |  CASE WHEN k % 3 = 0 THEN p_name ELSE NULL END AS b64_try
        |FROM p""".stripMargin,

    "fn_trig2" ->
      """SELECT l_orderkey, l_linenumber,
        |  ln(l_discount + sqrt(l_discount * l_discount + 1)) AS ash,
        |  ln((l_discount + 1) + sqrt((l_discount + 1) * (l_discount + 1) - 1)) AS ach,
        |  0.5 * ln((1 + l_discount) / (1 - l_discount)) AS ath,
        |  1.0 * l_discount AS ash_rt,
        |  1.0 * l_discount AS ath_rt
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,

    "fn_semi3" ->
      """WITH ev AS (
        |  SELECT *, CASE WHEN event_id % 3 = 0 THEN event_type END AS vn
        |  FROM events WHERE event_id % 25 = 0)
        |SELECT event_id,
        |  CAST(CASE WHEN vn IS NULL THEN NULL ELSE 1 END AS BIGINT) AS asz,
        |  len(string_split(event_type, '_')) AS asz2,
        |  CASE WHEN vn IS NULL THEN NULL
        |       ELSE '["' || vn || '"]' END AS to_arr,
        |  CASE WHEN vn IS NULL THEN '[null]'
        |       ELSE '["' || vn || '"]' END AS arr_con,
        |  coalesce(array_to_string(string_split(event_type, '_')[2:3], ','), '') AS aslice,
        |  json_extract_string(props, '$.k') AS jept,
        |  '{"k":"' || json_extract_string(props, '$.k') || '"}' AS to_obj,
        |  isodow(CAST(ts AS DATE)) AS dowiso
        |FROM ev""".stripMargin
  )
}
