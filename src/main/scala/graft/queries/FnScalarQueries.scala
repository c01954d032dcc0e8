package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar-kernel batteries, numeric/temporal families (SURVEY.md §2.8):
  * datetime (ref BodoSQL/bodosql/kernels/datetime_array_kernels.py, 205
  * fns), numeric (numeric_array_kernels.py, 99), trig
  * (trig_array_kernels.py, 35), conversion/try_* (
  * snowflake_conversion_array_kernels.py, 73), variadic/conditional
  * (variadic_array_kernels.py, other_array_kernels.py).
  *
  * Oracle notes (type parity): DuckDB year()/length()/ceil() return
  * BIGINT/DOUBLE where Spark returns INT/LONG — oracles CAST to match;
  * DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday; next_day/sinh/cosh/tanh/
  * width_bucket are emulated in the oracle.
  */
object FnScalarQueries extends QueryModule {

  override def queries: Map[String, QueryFn] = Map(
    "fn_datetime" -> ((s, d) => {
      val ts = col("o_orderdate")
      orders(s, d).filter(col("o_orderkey") % 10 === 0).select(
        col("o_orderkey"),
        year(ts).as("yr"),
        quarter(ts).as("qt"),
        month(ts).as("mo"),
        dayofmonth(ts).as("dy"),
        dayofyear(ts).as("doy"),
        dayofweek(ts).as("dow"),
        weekofyear(ts).as("woy"),
        // DATE results are surfaced as midnight timestamps: pandas renders
        // Spark DATE as python objects but DuckDB DATE as datetime64, so the
        // compare needs one dtype — semantics are unchanged.
        last_day(ts).cast("timestamp").as("ld"),
        next_day(ts, "MO").cast("timestamp").as("nd"),
        date_trunc("month", ts).as("dtm"),
        date_trunc("week", ts).as("dtw"),
        date_add(ts, 30).cast("timestamp").as("dadd"),
        add_months(ts, 3).cast("timestamp").as("amon"),
        datediff(ts, lit("1995-01-01")).as("dd"),
        date_format(ts, "yyyy-MM").as("fmt"),
        date_format(ts, "EEEE").as("dnm"),
        date_format(ts, "MMMM").as("mnm"),
        unix_timestamp(ts).as("ep"),
        make_date(year(ts), month(ts), lit(15)).cast("timestamp").as("mk"),
        to_date(date_format(ts, "dd/MM/yyyy"), "dd/MM/yyyy").cast("timestamp").as("tod"))
    }),

    // Week-policy battery (ref datetime_array_kernels.py weekiso family and
    // Snowflake WEEK_START / WEEK_OF_YEAR_POLICY session parameters): ISO
    // week/year/day, legacy 0-based DAYOFWEEK, short day/month names,
    // WEEK_START=Sunday and =Monday week numbers under policy "week 1
    // contains Jan 1" (identical integer arithmetic on both engines),
    // week-of-month, previous_day/next_day, and ISO week first/last day.
    "fn_datetime2" -> ((s, d) => {
      val dt = col("o_orderdate")
      val dow = dayofweek(dt)                                     // 1=Sun..7
      val diso = expr("extract(DAYOFWEEK_ISO FROM o_orderdate)")  // 1=Mon..7
      val doy = dayofyear(dt)
      val j1sun = dayofweek(trunc(dt, "year")) - 1                // Jan-1 dow, 0=Sun
      val j1mon = (dayofweek(trunc(dt, "year")) + 5) % 7          // Jan-1 dow, 0=Mon
      val m1sun = dayofweek(trunc(dt, "month")) - 1               // month-start dow
      val offPrevMon = (dow - 2 + 7) % 7                          // days back to Monday
      orders(s, d).filter(col("o_orderkey") % 10 === 0).select(
        col("o_orderkey"),
        weekofyear(dt).as("wiso"),
        expr("extract(YEAROFWEEK FROM o_orderdate)").cast("int").as("yiso"),
        diso.cast("int").as("diso"),
        (dow - 1).as("dow_sf0"),
        date_format(dt, "EEE").as("dnm3"),
        date_format(dt, "MMM").as("mnm3"),
        (floor((doy - 1 + j1sun) / 7).cast("int") + 1).as("wk_sun"),
        (floor((doy - 1 + j1mon) / 7).cast("int") + 1).as("wk_mon"),
        (floor((dayofmonth(dt) - 1 + m1sun) / 7).cast("int") + 1).as("wom"),
        date_sub(dt.cast("date"),
          when(offPrevMon === 0, 7).otherwise(offPrevMon)).cast("timestamp").as("pday_mon"),
        next_day(dt, "FR").cast("timestamp").as("nday_fri"),
        date_sub(dt.cast("date"), diso.cast("int") - 1).cast("timestamp").as("first_dow"),
        date_add(dt.cast("date"), lit(7) - diso.cast("int")).cast("timestamp").as("last_dow"))
    }),

    // Per-unit dateadd/datediff kernel family (ref datetime_array_kernels
    // add_interval_* / diff_* and SinceEpochFnTable.java): timestampadd
    // across quarter/week/hour/second, timestampdiff across
    // day/week/hour/minute/second/month/year, months_between fractional.
    // Both operands are midnight timestamps, and the oracle emulates
    // Spark's COMPLETE-PERIOD diff semantics explicitly (DuckDB's native
    // date_diff counts boundary crossings — different rule).
    "fn_datetime3" -> ((s, d) => {
      val a = col("o_orderdate")
      orders(s, d).filter(col("o_orderkey") % 25 === 0).select(
        col("o_orderkey"),
        expr("timestampadd(QUARTER, 2, o_orderdate)").as("aq"),
        expr("timestampadd(WEEK, -3, o_orderdate)").as("aw"),
        expr("timestampadd(HOUR, 36, o_orderdate)").as("ah"),
        expr("timestampadd(SECOND, 90061, o_orderdate)").as("asec"),
        expr("timestampdiff(DAY, o_orderdate, timestamp'1995-06-17 00:00:00')").as("dday"),
        expr("timestampdiff(WEEK, o_orderdate, timestamp'1995-06-17 00:00:00')").as("dweek"),
        expr("timestampdiff(HOUR, o_orderdate, timestamp'1995-06-17 00:00:00')").as("dhour"),
        expr("timestampdiff(MINUTE, o_orderdate, timestamp'1995-06-17 00:00:00')").as("dmin"),
        expr("timestampdiff(SECOND, o_orderdate, timestamp'1995-06-17 00:00:00')").as("dsec"),
        expr("timestampdiff(MONTH, o_orderdate, timestamp'1995-06-17 00:00:00')").as("dmon"),
        expr("timestampdiff(YEAR, o_orderdate, timestamp'1995-06-17 00:00:00')").as("dyear"),
        months_between(lit("1995-06-17").cast("timestamp"), a, roundOff = false).as("mb"))
    }),

    // TIME_SLICE family + per-part LAST_DAY + MySQL day-number kit +
    // DATE_FROM_PARTS overflow semantics (ref datetime_array_kernels.py
    // time_slice/last_day_{week,quarter,year}/to_days/from_days/
    // date_from_parts/weekday/makedate). Snowflake's DATE_FROM_PARTS
    // accepts out-of-range month/day and rolls them over — composed here
    // as month-then-day interval arithmetic from Jan 1, which is exactly
    // that semantic. Time slices are pure epoch/month-index arithmetic,
    // so both engines replay them exactly.
    "fn_datetime4" -> ((s, d) => {
      val ts = col("ts")
      val dt = to_date(ts)
      val ep = unix_timestamp(ts)                    // floor to whole seconds
      val slice4h = ep - pmod(ep, lit(14400L))       // 4-hour slice start
      val mIdx = year(dt) * 12 + month(dt) - 1       // month index since year 0
      val mSlice = mIdx - pmod(mIdx, lit(3))         // 3-month slice start
      events(s, d).filter(col("event_id") % 40 === 0).select(
        col("event_id"),
        timestamp_seconds(slice4h).as("slice4h_start"),
        timestamp_seconds(slice4h + 14400L).as("slice4h_end"),
        make_date((mSlice / 12).cast("int"), pmod(mSlice, lit(12)).cast("int") + 1, lit(1))
          .cast("timestamp").as("slice3m_start"),
        date_sub(add_months(trunc(dt, "quarter"), 3), 1).cast("timestamp").as("ld_quarter"),
        date_sub(make_date(year(dt) + 1, lit(1), lit(1)), 1).cast("timestamp").as("ld_year"),
        date_add(dt, lit(7) - expr("extract(DAYOFWEEK_ISO FROM to_date(ts))").cast("int"))
          .cast("timestamp").as("ld_week_iso"),
        (datediff(dt, lit("1970-01-01")) + 719528).as("to_days"),
        date_add(lit("1970-01-01").cast("date"),
          datediff(dt, lit("1970-01-01"))).cast("timestamp").as("from_days_rt"),
        date_add(add_months(make_date(year(dt), lit(1), lit(1)), month(dt) + 13),
          dayofmonth(dt) + 39).cast("timestamp").as("dfp_overflow"),
        pmod(dayofweek(dt) + 5, lit(7)).as("weekday0"),
        date_add(make_date(year(dt), lit(1), lit(1)), dayofyear(dt) - 1)
          .cast("timestamp").as("makedate_rt"))
    }),

    // Timezone-conversion kernels (ref datetime_array_kernels.py tz
    // conversions / Snowflake CONVERT_TIMEZONE): fixed-offset zones only —
    // the offline DuckDB has no ICU named-zone data, so offsets are the
    // portable subset, oracled as exact interval arithmetic. Covers
    // from_utc/to_utc round-trip, the 3-arg convert_timezone on
    // TIMESTAMP_NTZ, and a post-conversion field extract.
    "fn_timezone" -> ((s, d) => {
      val ts = col("ts")
      events(s, d).filter(col("event_id") % 50 === 0).select(
        col("event_id"),
        from_utc_timestamp(ts, "+05:30").as("ist"),
        to_utc_timestamp(from_utc_timestamp(ts, "+05:30"), "+05:30").as("rt"),
        from_utc_timestamp(ts, "-08:00").as("pst_fixed"),
        expr("convert_timezone('UTC', '+09:00', cast(ts AS timestamp_ntz))").as("jst_ntz"),
        hour(from_utc_timestamp(ts, "+05:30")).as("hr_ist"))
    }),

    // uint64 representation (SURVEY §1.2: Spark has no unsigned types —
    // the convention is DECIMAL(20,0), which holds the full uint64 range
    // exactly): construct values above int64 max, arithmetic and compare
    // stay exact, stringify round-trips. DuckDB oracles with HUGEINT.
    "fn_uint64" -> ((s, d) => {
      val u = lit("9223372036854775808").cast("decimal(20,0)") +
        col("o_orderkey").cast("decimal(20,0)")
      orders(s, d).filter(col("o_orderkey") % 100 === 0).select(
        col("o_orderkey"),
        u.cast("string").as("u64_str"),
        (u % 97).cast("long").as("u64_mod"),
        (u - lit("9223372036854775808").cast("decimal(20,0)")).cast("long").as("u64_back"),
        (u > lit("9223372036854775807").cast("decimal(20,0)")).as("gt_i64max"))
    }),

    "fn_numeric" -> ((s, d) => {
      lineitem(s, d).filter(col("l_orderkey") % 50 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("ab"),
        ceil(col("l_extendedprice")).as("ce"),
        floor(col("l_extendedprice")).as("fl"),
        round(col("l_extendedprice"), 0).as("rd"),
        round(col("l_discount") * col("l_tax"), 6).as("rd6"),
        signum(col("l_quantity") - 25).as("sg"),
        sqrt(col("l_quantity")).as("sq"),
        cbrt(col("l_quantity")).as("cb"),
        exp(col("l_discount")).as("ex"),
        log(col("l_quantity")).as("lnv"),
        log10(col("l_quantity")).as("l10"),
        log2(col("l_quantity")).as("l2"),
        pow(col("l_quantity"), 2.0).as("pw"),
        pmod(col("l_orderkey"), lit(7)).as("pm"),
        factorial(col("l_linenumber")).as("fact"),
        width_bucket(col("l_quantity"), lit(0.0), lit(50.0), lit(10)).as("wb"),
        when(col("l_tax") === 0.0, 0.0)
          .otherwise(col("l_quantity") / col("l_tax")).as("dv0"),
        col("l_orderkey").bitwiseAND(lit(255L)).as("ba"),
        col("l_orderkey").bitwiseOR(lit(4096L)).as("bo"),
        col("l_orderkey").bitwiseXOR(lit(1023L)).as("bx"),
        shiftleft(col("l_linenumber"), 3).as("shl"),
        shiftright(col("l_orderkey"), 2).as("shr"),
        bit_count(col("l_orderkey")).as("bc"))
    }),

    // Second numeric battery — the kernels the first one left out:
    // haversine (a literal reference kernel, numeric_array_kernels.py),
    // CONV base conversion, scaled ceil/floor and truncate-toward-zero,
    // float modulo, cotangent, bitwise NOT. Coordinates are synthesized
    // deterministically from fixture columns; both engines run the same
    // double formula (libm parity within the checker's 1e-9 rtol, same as
    // fn_trig).
    "fn_numeric2" -> ((s, d) => {
      val lat1 = (col("l_quantity") - lit(25)) * 1.7
      val lon1 = (col("l_extendedprice") % 360) - 180
      val lat2 = col("l_discount") * 500 - 25
      val lon2 = (col("l_tax") * 1000) % 360 - 180
      val dlat = radians(lat2 - lat1)
      val dlon = radians(lon2 - lon1)
      val a = pow(sin(dlat / 2), 2.0) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2.0)
      val x10 = col("l_extendedprice") * 10
      lineitem(s, d).filter(col("l_orderkey") % 60 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        (asin(sqrt(a)) * 2 * 6371.0).as("hav_km"),
        expr("conv(cast(l_orderkey AS STRING), 10, 16)").as("hex_c"),
        expr("conv(cast(l_orderkey % 64 AS STRING), 10, 2)").as("bin_c"),
        (ceil(x10) / 10).as("ceil1"),
        (floor(x10) / 10).as("floor1"),
        when(col("l_extendedprice") >= 0, floor(x10)).otherwise(ceil(x10))
          .divide(10).as("trunc1"),
        (col("l_extendedprice") % 7.5).as("fmod75"),
        expr("cot(l_discount + 0.01)").as("cot_v"),
        expr("~ l_orderkey").as("bnot"),
        expr("getbit(l_orderkey, 3)").cast("int").as("bit3"),
        (col("l_quantity") * col("l_quantity")).as("sq"))
    }),

    // IS_IN with explicit null policy (ref special_handling_array_kernels
    // is_in/null_as): SQL IN is three-valued — a non-matching probe against
    // a list containing NULL yields NULL, and a NULL probe always yields
    // NULL — while the pandas isin convention collapses unknown to false.
    // Both policies side by side over a nullable key.
    "fn_isin_null_policy" -> ((s, d) => {
      val k = when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_nationkey"))
      customer(s, d).filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), k.as("k"))
        .withColumn("in_3vl", expr("k IN (1, 2, 5, NULL)"))
        .withColumn("in_pandas", coalesce(expr("k IN (1, 2, 5, NULL)"), lit(false)))
        .withColumn("notin_3vl", expr("k NOT IN (1, 2, 5, NULL)"))
    }),

    "fn_trig" -> ((s, d) => {
      val x = col("l_discount")
      val y = col("l_tax") + 0.01
      lineitem(s, d).filter(col("l_orderkey") % 100 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        sin(x).as("sn"), cos(x).as("cs"), tan(x).as("tn"),
        asin(x).as("asn"), acos(x).as("acs"), atan(x).as("atn"),
        atan2(x, y).as("at2"),
        sinh(x).as("snh"), cosh(x).as("csh"), tanh(x).as("tnh"),
        degrees(x).as("deg"), radians(x * 100).as("rad"),
        lit(math.Pi).as("pi"))
    }),

    "fn_conversion" -> ((s, d) => {
      val pk = col("p_partkey")
      val mixedInt = when(pk % 3 === 0, concat(lit("x"), pk)).otherwise(pk.cast("string"))
      part(s, d).select(
        pk,
        pk.cast("string").as("s_int"),
        expr("try_cast(concat(CASE WHEN p_partkey % 3 = 0 THEN 'x' ELSE '' END, p_partkey) AS INT)").as("t_int"),
        mixedInt.as("mix_s"),
        expr("try_cast(concat('12.', p_partkey % 100) AS DOUBLE)").as("t_dbl"),
        expr("try_cast(CASE WHEN p_partkey % 2 = 0 THEN 'true' ELSE 'maybe' END AS BOOLEAN)").as("t_bool"),
        expr("try_cast(CASE WHEN p_partkey % 4 = 0 THEN 'not-a-date' " +
          "ELSE concat('2024-03-', lpad(cast(p_partkey % 28 + 1 AS STRING), 2, '0')) END AS DATE)")
          .cast("timestamp").as("t_date"),
        to_date(concat(lit("2024-02-"), lpad((pk % 28 + 1).cast("string"), 2, "0")),
          "yyyy-MM-dd").cast("timestamp").as("to_d"),
        col("p_retailprice").cast("int").as("trunc_i"),
        col("p_size").cast("double").as("widen_d"),
        col("p_size").cast("string").as("int_s"),
        // ANSI try_* arithmetic: null instead of error/overflow
        expr("try_divide(p_retailprice, p_size % 3)").as("t_div"),
        expr("try_add(p_partkey, 10)").as("t_add"),
        expr("try_multiply(p_size, 1000000)").as("t_mul"))
    }),

    // DECIMAL(p,s) kernel battery (SURVEY §1.2: Decimal128Type ≈
    // DecimalType near-1:1): all arithmetic runs in DecimalType — exact,
    // no float drift — and results are cast to double only at the output
    // boundary (DuckDB lowers DECIMAL to float64 in pandas).
    "fn_decimal" -> ((s, d) => {
      val dd = col("l_discount").cast("decimal(6,3)")
      val dt = col("l_tax").cast("decimal(6,3)")
      lineitem(s, d).filter(col("l_orderkey") % 40 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          dd.cast("double").as("dec_d"),
          (dd + dt).cast("double").as("dec_add"),
          (dd - dt).cast("double").as("dec_sub"),
          (dd * dt).cast("double").as("dec_mul"),
          (dd * 100).cast("double").as("dec_scale"))
    }),

    "fn_decimal_agg" -> ((s, d) => {
      val dd = col("l_discount").cast("decimal(6,3)")
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(sum(dd).cast("double").as("dsum"),
          min(dd).cast("double").as("dmin"),
          max(dd).cast("double").as("dmax"),
          count(dd).as("dcnt"))
    }),

    "fn_variadic" -> ((s, d) => {
      val seg = nullif_(col("c_mktsegment"), lit("MACHINERY"))
      customer(s, d).filter(col("c_custkey") % 4 === 0).select(
        col("c_custkey"),
        seg.as("seg_n"),
        coalesce(seg, lit("NONE")).as("co"),
        when(seg.isNotNull, "has").otherwise("none").as("nv2"),
        when(col("c_acctbal") > 5000, "hi").otherwise("lo").as("iff"),
        greatest(col("c_acctbal"), lit(0.0)).as("gr"),
        least(col("c_acctbal"), lit(1000.0)).as("ls"),
        col("c_mktsegment").eqNullSafe(seg).as("eqn"),
        (!col("c_mktsegment").eqNullSafe(seg)).as("isd"),
        coalesce(nullif_(col("c_acctbal"), lit(0.0)), lit(0.0)).as("zin"),
        when(col("c_mktsegment") === "BUILDING", 1)
          .when(col("c_mktsegment") === "MACHINERY", 2)
          .otherwise(0).as("dec"))
    })
  )

  /** Spark's nullif as a composition (nullif exists only in SQL surface). */
  private def nullif_(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    when(a === b, null).otherwise(a)

  override def oracle: Map[String, String] = Map(
    "fn_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qt,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dy,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
        |  CAST(last_day(o_orderdate) AS TIMESTAMP) AS ld,
        |  CAST(CAST(o_orderdate AS DATE) +
        |    CASE WHEN ((1 - dayofweek(CAST(o_orderdate AS DATE))) % 7 + 7) % 7 = 0 THEN 7
        |         ELSE CAST(((1 - dayofweek(CAST(o_orderdate AS DATE))) % 7 + 7) % 7 AS INTEGER) END
        |    AS TIMESTAMP) AS nd,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS dtm,
        |  CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS dtw,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS dadd,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS amon,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS dd,
        |  strftime(o_orderdate, '%Y-%m') AS fmt,
        |  dayname(o_orderdate) AS dnm,
        |  monthname(o_orderdate) AS mnm,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS ep,
        |  CAST(make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 15) AS TIMESTAMP) AS mk,
        |  CAST(CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE) AS TIMESTAMP) AS tod
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,

    "fn_datetime2" ->
      """SELECT o_orderkey,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS wiso,
        |  CAST(isoyear(o_orderdate) AS INTEGER) AS yiso,
        |  CAST(isodow(o_orderdate) AS INTEGER) AS diso,
        |  CAST(dayofweek(o_orderdate) AS INTEGER) AS dow_sf0,
        |  strftime(o_orderdate, '%a') AS dnm3,
        |  strftime(o_orderdate, '%b') AS mnm3,
        |  CAST((dayofyear(o_orderdate) - 1 + dayofweek(date_trunc('year', o_orderdate))) // 7 + 1 AS INTEGER) AS wk_sun,
        |  CAST((dayofyear(o_orderdate) - 1 + (dayofweek(date_trunc('year', o_orderdate)) + 6) % 7) // 7 + 1 AS INTEGER) AS wk_mon,
        |  CAST((day(o_orderdate) - 1 + dayofweek(date_trunc('month', o_orderdate))) // 7 + 1 AS INTEGER) AS wom,
        |  CAST(CAST(o_orderdate AS DATE) - CAST(CASE WHEN (dayofweek(o_orderdate) + 6) % 7 = 0 THEN 7
        |       ELSE (dayofweek(o_orderdate) + 6) % 7 END AS INTEGER) AS TIMESTAMP) AS pday_mon,
        |  CAST(CAST(o_orderdate AS DATE) + CAST(CASE WHEN ((5 - dayofweek(o_orderdate)) % 7 + 7) % 7 = 0 THEN 7
        |       ELSE ((5 - dayofweek(o_orderdate)) % 7 + 7) % 7 END AS INTEGER) AS TIMESTAMP) AS nday_fri,
        |  CAST(CAST(o_orderdate AS DATE) - CAST(isodow(o_orderdate) - 1 AS INTEGER) AS TIMESTAMP) AS first_dow,
        |  CAST(CAST(o_orderdate AS DATE) + CAST(7 - isodow(o_orderdate) AS INTEGER) AS TIMESTAMP) AS last_dow
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,

    // Spark complete-period diff semantics emulated explicitly: month diff
    // subtracts one when the end day-of-month hasn't been reached; year
    // diff when the end (month, day) hasn't; week = trunc(days/7).
    "fn_datetime3" ->
      """WITH t AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS a,
        |         TIMESTAMP '1995-06-17 00:00:00' AS r
        |  FROM orders WHERE o_orderkey % 25 = 0)
        |SELECT o_orderkey,
        |  a + INTERVAL 6 MONTH AS aq,
        |  a - INTERVAL 21 DAY AS aw,
        |  a + INTERVAL 36 HOUR AS ah,
        |  a + INTERVAL 90061 SECOND AS asec,
        |  date_diff('day', a, r) AS dday,
        |  CAST(trunc(date_diff('day', a, r) / 7.0) AS BIGINT) AS dweek,
        |  date_diff('day', a, r) * 24 AS dhour,
        |  date_diff('day', a, r) * 1440 AS dmin,
        |  date_diff('day', a, r) * 86400 AS dsec,
        |  CASE WHEN a <= r THEN
        |    12 * (year(r) - year(a)) + (month(r) - month(a))
        |      - CASE WHEN day(r) < day(a) THEN 1 ELSE 0 END
        |  ELSE
        |    -(12 * (year(a) - year(r)) + (month(a) - month(r))
        |      - CASE WHEN day(a) < day(r) THEN 1 ELSE 0 END)
        |  END AS dmon,
        |  CASE WHEN a <= r THEN
        |    (year(r) - year(a)) - CASE WHEN month(r) < month(a)
        |      OR (month(r) = month(a) AND day(r) < day(a)) THEN 1 ELSE 0 END
        |  ELSE
        |    -((year(a) - year(r)) - CASE WHEN month(a) < month(r)
        |      OR (month(a) = month(r) AND day(a) < day(r)) THEN 1 ELSE 0 END)
        |  END AS dyear,
        |  (year(r) - year(a)) * 12 + (month(r) - month(a)) +
        |    CASE WHEN day(r) = day(a)
        |           OR (day(r) = day(last_day(r)) AND day(a) = day(last_day(a))) THEN 0
        |         ELSE (day(r) - day(a)) / 31.0 END AS mb
        |FROM t""".stripMargin,

    // epoch floored to whole seconds matches Spark's unix_timestamp; date
    // arithmetic composed with make_date / to_months / integer day adds.
    "fn_datetime4" ->
      """WITH t AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS dt,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ep
        |  FROM events WHERE event_id % 40 = 0),
        |u AS (
        |  SELECT *,
        |    ep - ep % 14400 AS s4,
        |    (year(dt) * 12 + month(dt) - 1)
        |      - (year(dt) * 12 + month(dt) - 1) % 3 AS ms
        |  FROM t)
        |SELECT event_id,
        |  CAST(to_timestamp(s4) AS TIMESTAMP) AS slice4h_start,
        |  CAST(to_timestamp(s4 + 14400) AS TIMESTAMP) AS slice4h_end,
        |  CAST(make_date(CAST(ms // 12 AS INTEGER), CAST(ms % 12 + 1 AS INTEGER), 1)
        |       AS TIMESTAMP) AS slice3m_start,
        |  CAST(CAST(date_trunc('quarter', dt) AS DATE) + to_months(3) - to_days(1)
        |       AS TIMESTAMP) AS ld_quarter,
        |  CAST(make_date(CAST(year(dt) + 1 AS INTEGER), 1, 1) - to_days(1)
        |       AS TIMESTAMP) AS ld_year,
        |  CAST(dt + CAST(7 - isodow(dt) AS INTEGER) AS TIMESTAMP) AS ld_week_iso,
        |  CAST(date_diff('day', DATE '1970-01-01', dt) + 719528 AS INTEGER) AS to_days,
        |  CAST(DATE '1970-01-01' + CAST(date_diff('day', DATE '1970-01-01', dt) AS INTEGER)
        |       AS TIMESTAMP) AS from_days_rt,
        |  CAST(make_date(CAST(year(dt) AS INTEGER), 1, 1) + to_months(CAST(month(dt) + 13 AS INTEGER))
        |       + to_days(CAST(day(dt) + 39 AS INTEGER)) AS TIMESTAMP) AS dfp_overflow,
        |  CAST((dayofweek(dt) + 6) % 7 AS INTEGER) AS weekday0,
        |  CAST(make_date(CAST(year(dt) AS INTEGER), 1, 1)
        |       + CAST(dayofyear(dt) - 1 AS INTEGER) AS TIMESTAMP) AS makedate_rt
        |FROM u""".stripMargin,

    "fn_uint64" ->
      """SELECT o_orderkey,
        |  CAST(9223372036854775808::HUGEINT + o_orderkey AS VARCHAR) AS u64_str,
        |  CAST((9223372036854775808::HUGEINT + o_orderkey) % 97 AS BIGINT) AS u64_mod,
        |  CAST((9223372036854775808::HUGEINT + o_orderkey) - 9223372036854775808::HUGEINT AS BIGINT) AS u64_back,
        |  (9223372036854775808::HUGEINT + o_orderkey) > 9223372036854775807 AS gt_i64max
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,

    "fn_numeric" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS ab,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  round(l_extendedprice, 0) AS rd,
        |  round(l_discount * l_tax, 6) AS rd6,
        |  CAST(sign(l_quantity - 25) AS DOUBLE) AS sg,
        |  sqrt(l_quantity) AS sq,
        |  cbrt(l_quantity) AS cb,
        |  exp(l_discount) AS ex,
        |  ln(l_quantity) AS lnv,
        |  log10(l_quantity) AS l10,
        |  log2(l_quantity) AS l2,
        |  pow(l_quantity, 2.0) AS pw,
        |  ((l_orderkey % 7) + 7) % 7 AS pm,
        |  CAST(factorial(l_linenumber) AS BIGINT) AS fact,
        |  CAST(CASE WHEN l_quantity < 0 THEN 0
        |            WHEN l_quantity >= 50 THEN 11
        |            ELSE CAST(floor(l_quantity / 5.0) AS BIGINT) + 1 END AS BIGINT) AS wb,
        |  CASE WHEN l_tax = 0.0 THEN 0.0 ELSE l_quantity / l_tax END AS dv0,
        |  l_orderkey & 255 AS ba,
        |  l_orderkey | 4096 AS bo,
        |  xor(l_orderkey, 1023) AS bx,
        |  CAST(l_linenumber << 3 AS INTEGER) AS shl,
        |  l_orderkey >> 2 AS shr,
        |  CAST(bit_count(l_orderkey) AS INTEGER) AS bc
        |FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin,

    "fn_timezone" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |           WHERE event_id % 50 = 0)
        |SELECT event_id,
        |  ts + INTERVAL 330 MINUTE AS ist,
        |  ts AS rt,
        |  ts - INTERVAL 480 MINUTE AS pst_fixed,
        |  ts + INTERVAL 540 MINUTE AS jst_ntz,
        |  CAST(hour(ts + INTERVAL 330 MINUTE) AS INTEGER) AS hr_ist
        |FROM e""".stripMargin,

    // hex/bin emulated via printf/ltrim (DuckDB's hex() zero-pads integers);
    // Spark ceil(double) is BIGINT so the /10 is double on both sides.
    "fn_numeric2" ->
      """SELECT l_orderkey, l_linenumber,
        |  2 * 6371.0 * asin(sqrt(
        |    pow(sin(radians((l_discount*500 - 25) - (l_quantity - 25)*1.7) / 2), 2)
        |    + cos(radians((l_quantity - 25)*1.7)) * cos(radians(l_discount*500 - 25))
        |      * pow(sin(radians(((l_tax*1000) % 360 - 180) - ((l_extendedprice % 360) - 180)) / 2), 2)
        |  )) AS hav_km,
        |  upper(printf('%x', l_orderkey)) AS hex_c,
        |  CASE WHEN l_orderkey % 64 = 0 THEN '0'
        |       ELSE trim(LEADING '0' FROM bin(l_orderkey % 64)) END AS bin_c,
        |  ceil(l_extendedprice * 10) / 10 AS ceil1,
        |  floor(l_extendedprice * 10) / 10 AS floor1,
        |  trunc(l_extendedprice * 10) / 10 AS trunc1,
        |  l_extendedprice % 7.5 AS fmod75,
        |  cot(l_discount + 0.01) AS cot_v,
        |  ~ l_orderkey AS bnot,
        |  CAST((l_orderkey >> 3) & 1 AS INTEGER) AS bit3,
        |  l_quantity * l_quantity AS sq
        |FROM lineitem WHERE l_orderkey % 60 = 0""".stripMargin,

    "fn_isin_null_policy" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS k,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END IN (1, 2, 5, NULL) AS in_3vl,
        |  coalesce(CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END IN (1, 2, 5, NULL),
        |           false) AS in_pandas,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END NOT IN (1, 2, 5, NULL) AS notin_3vl
        |FROM customer WHERE c_custkey % 3 = 0""".stripMargin,

    "fn_trig" ->
      """SELECT l_orderkey, l_linenumber,
        |  sin(l_discount) AS sn, cos(l_discount) AS cs, tan(l_discount) AS tn,
        |  asin(l_discount) AS asn, acos(l_discount) AS acs, atan(l_discount) AS atn,
        |  atan2(l_discount, l_tax + 0.01) AS at2,
        |  (exp(l_discount) - exp(-l_discount)) / 2 AS snh,
        |  (exp(l_discount) + exp(-l_discount)) / 2 AS csh,
        |  (exp(l_discount) - exp(-l_discount)) / (exp(l_discount) + exp(-l_discount)) AS tnh,
        |  degrees(l_discount) AS deg, radians(l_discount * 100) AS rad,
        |  1.0 * pi() AS pi
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,

    "fn_conversion" ->
      """SELECT p_partkey,
        |  CAST(p_partkey AS VARCHAR) AS s_int,
        |  TRY_CAST((CASE WHEN p_partkey % 3 = 0 THEN 'x' ELSE '' END || CAST(p_partkey AS VARCHAR)) AS INTEGER) AS t_int,
        |  CASE WHEN p_partkey % 3 = 0 THEN 'x' || CAST(p_partkey AS VARCHAR)
        |       ELSE CAST(p_partkey AS VARCHAR) END AS mix_s,
        |  TRY_CAST('12.' || CAST(p_partkey % 100 AS VARCHAR) AS DOUBLE) AS t_dbl,
        |  TRY_CAST(CASE WHEN p_partkey % 2 = 0 THEN 'true' ELSE 'maybe' END AS BOOLEAN) AS t_bool,
        |  CAST(TRY_CAST(CASE WHEN p_partkey % 4 = 0 THEN 'not-a-date'
        |       ELSE '2024-03-' || lpad(CAST(p_partkey % 28 + 1 AS VARCHAR), 2, '0') END AS DATE) AS TIMESTAMP) AS t_date,
        |  strptime('2024-02-' || lpad(CAST(p_partkey % 28 + 1 AS VARCHAR), 2, '0'), '%Y-%m-%d') AS to_d,
        |  CAST(trunc(p_retailprice) AS INTEGER) AS trunc_i,
        |  CAST(p_size AS DOUBLE) AS widen_d,
        |  CAST(p_size AS VARCHAR) AS int_s,
        |  CASE WHEN p_size % 3 = 0 THEN NULL
        |       ELSE p_retailprice / (p_size % 3) END AS t_div,
        |  p_partkey + 10 AS t_add,
        |  CAST(p_size AS INTEGER) * 1000000 AS t_mul
        |FROM part""".stripMargin,

    "fn_decimal" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_discount AS DECIMAL(6,3)) AS DOUBLE) AS dec_d,
        |  CAST(CAST(l_discount AS DECIMAL(6,3)) + CAST(l_tax AS DECIMAL(6,3)) AS DOUBLE) AS dec_add,
        |  CAST(CAST(l_discount AS DECIMAL(6,3)) - CAST(l_tax AS DECIMAL(6,3)) AS DOUBLE) AS dec_sub,
        |  CAST(CAST(l_discount AS DECIMAL(6,3)) * CAST(l_tax AS DECIMAL(6,3)) AS DOUBLE) AS dec_mul,
        |  CAST(CAST(l_discount AS DECIMAL(6,3)) * 100 AS DOUBLE) AS dec_scale
        |FROM lineitem WHERE l_orderkey % 40 = 0""".stripMargin,

    "fn_decimal_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_discount AS DECIMAL(6,3))) AS DOUBLE) AS dsum,
        |  CAST(min(CAST(l_discount AS DECIMAL(6,3))) AS DOUBLE) AS dmin,
        |  CAST(max(CAST(l_discount AS DECIMAL(6,3))) AS DOUBLE) AS dmax,
        |  count(l_discount) AS dcnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "fn_variadic" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'MACHINERY') AS seg_n,
        |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'NONE') AS co,
        |  CASE WHEN nullif(c_mktsegment, 'MACHINERY') IS NOT NULL THEN 'has' ELSE 'none' END AS nv2,
        |  CASE WHEN c_acctbal > 5000 THEN 'hi' ELSE 'lo' END AS iff,
        |  greatest(c_acctbal, 0.0) AS gr,
        |  least(c_acctbal, 1000.0) AS ls,
        |  c_mktsegment IS NOT DISTINCT FROM nullif(c_mktsegment, 'MACHINERY') AS eqn,
        |  c_mktsegment IS DISTINCT FROM nullif(c_mktsegment, 'MACHINERY') AS isd,
        |  coalesce(nullif(c_acctbal, 0.0), 0.0) AS zin,
        |  CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'MACHINERY' THEN 2 ELSE 0 END AS dec
        |FROM customer WHERE c_custkey % 4 = 0""".stripMargin
  )
}
