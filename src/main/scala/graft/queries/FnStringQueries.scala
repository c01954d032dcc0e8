package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.JaroWinkler

/** Scalar-kernel batteries, string-shaped families (SURVEY.md §2.8):
  * string (ref BodoSQL/bodosql/kernels/string_array_kernels.py, 108 fns),
  * regexp (regexp_array_kernels.py, 16), crypto/hash (crypto_funcs.py,
  * hash_array_kernels.py), parse_url (parse_url_array_kernel.py).
  *
  * One row-level battery query per family: each output column exercises one
  * kernel over fixture strings, and the DuckDB oracle computes the same
  * value (emulating the few functions DuckDB lacks, e.g. initcap). The
  * custom `jaro_winkler` Catalyst expression covers the kernel Spark lacks
  * (string_array_kernels.py:125).
  *
  * All pure narrow projections — codegen'd, scan-pipelined, shuffle-free.
  */
object FnStringQueries extends QueryModule {

  override def queries: Map[String, QueryFn] = Map(
    "fn_string" -> ((s, d) => {
      JaroWinkler.register(s) // no-op on GraftExtensions sessions
      val padded = concat(lit("  "), col("p_name"), lit("  "))
      part(s, d).select(
        col("p_partkey"),
        length(col("p_name")).as("len"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        initcap(col("p_type")).as("ic"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("lp"),
        rpad(col("p_brand"), 12, "*").as("rp"),
        trim(padded).as("tr"),
        ltrim(padded).as("ltr"),
        rtrim(padded).as("rtr"),
        reverse(col("p_name")).as("rev"),
        substring(col("p_name"), 2, 5).as("sub"),
        expr("left(p_name, 4)").as("lft"),
        expr("right(p_name, 3)").as("rgt"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("rep"),
        repeat(col("p_brand"), 2).as("rpt"),
        concat_ws("|", col("p_name"), col("p_brand"), col("p_type")).as("cw"),
        split_part(col("p_name"), lit(" "), lit(2)).as("sp"),
        instr(col("p_name"), "e").as("pos"),
        translate(col("p_name"), "aeiou", "12345").as("trn"),
        ascii(col("p_name")).as("asc"),
        expr("char(65 + p_partkey % 26)").as("ch"),
        levenshtein(col("p_name"), lit("small ring")).as("lev"),
        // bounded variant (editdistance-with-max: -1 beyond the threshold)
        levenshtein(col("p_name"), lit("small ring"), 4).as("lev4"),
        expr("jaro_winkler(p_name, 'small ring')").as("jw"),
        col("p_name").startsWith("small").as("sw"),
        col("p_name").endsWith("t").as("ew"),
        col("p_name").contains("id").as("ct"))
    }),

    "fn_regexp" -> ((s, d) => {
      customer(s, d).filter(col("c_custkey") % 3 === 0).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("rext"),
        // serialized to a canonical string: the driver's checker can't hash
        // array cells (per-match semantics unchanged)
        array_join(regexp_extract_all(col("c_mktsegment"), lit("[AEIOU]+"), lit(0)), ",").as("rall"),
        regexp_replace(col("c_mktsegment"), "[AEIOU]", "*").as("rrep"),
        col("c_mktsegment").rlike("^(MACHINERY|FURNITURE)$").as("rlk"),
        regexp_count(col("c_name"), lit("0")).as("rcnt"),
        regexp_instr(col("c_mktsegment"), lit("[IOU]")).as("rins"),
        regexp_substr(col("c_mktsegment"), lit("[A-Z]*RY")).as("rsub"))
    }),

    "fn_hash" -> ((s, d) => {
      part(s, d).filter(col("p_partkey") % 5 === 0).select(
        col("p_partkey"),
        md5(col("p_name")).as("m5"),
        sha2(col("p_name"), 256).as("sh2"),
        upper(hex(col("p_name"))).as("hx"),
        base64(col("p_name").cast("binary")).as("b64"),
        unbase64(base64(col("p_name").cast("binary"))).cast("string").as("b64rt"),
        bit_length(col("p_name")).as("bl"),
        octet_length(col("p_name")).as("ol"))
    }),

    // Second string battery: printf-style formatting, overlay/INSERT,
    // substring_index, space, elt, locate-with-start.
    "fn_string2" -> ((s, d) => {
      part(s, d).filter(col("p_partkey") % 3 === 0).select(
        col("p_partkey"),
        format_string("%s-%05d", col("p_brand"), col("p_partkey")).as("fmt"),
        overlay(col("p_name"), lit("XX"), lit(2), lit(3)).as("ovl"),
        substring_index(col("p_name"), " ", 1).as("sidx"),
        concat(col("p_type"), expr("space(3)"), col("p_brand")).as("spc"),
        expr("elt(1 + cast(p_partkey % 2 AS INT), 'even', 'odd')").as("elt_v"),
        locate("a", col("p_name"), 3).as("loc3"))
    }),

    // Third string battery (charset-trim family + tokenization kernels):
    // LTRIM/RTRIM/TRIM with explicit character sets (Snowflake signature),
    // STRTOK_TO_ARRAY (canonical joined form — checker-safe), negative-index
    // substring, and RTRIMMED_LENGTH.
    "fn_string3" -> ((s, d) => {
      part(s, d).filter(col("p_partkey") % 6 === 0).select(
        col("p_partkey"),
        expr("trim(LEADING 'sprd' FROM p_name)").as("lt_cs"),
        expr("trim(TRAILING 'aeiou' FROM p_name)").as("rt_cs"),
        expr("trim(BOTH 'sdm' FROM p_name)").as("tb_cs"),
        array_join(split(col("p_type"), " "), "|").as("strtok_arr"),
        substring(col("p_name"), -4, 3).as("sub_neg"),
        length(rtrim(concat(col("p_brand"), lit("   ")))).as("rtrim_len"))
    }),

    // LIKE family (ref like_array_kernels.py, 10 fns): LIKE / ILIKE /
    // ESCAPE / LIKE ANY / LIKE ALL / NOT LIKE.
    // Regexp long tail (ref regexp_array_kernels.py — Snowflake flag and
    // group arguments): inline (?i) case-insensitivity, group extraction
    // beyond group 1, backreference replace across ALL occurrences
    // (Spark's $n syntax; DuckDB needs \n plus the 'g' option), substr/
    // instr over the first leftmost match, and a flagged count.
    "fn_regexp2" -> ((s, d) => {
      customer(s, d).filter(col("c_custkey") % 4 === 0).select(
        col("c_custkey"),
        regexp_like(col("c_mktsegment"), lit("(?i)^mach")).as("ci_like"),
        regexp_extract(col("c_name"), "(Customer)#(\\d+)", 2).as("grp2"),
        regexp_replace(col("c_name"), lit("(Customer)#(\\d+)"), lit("$2-$1")).as("backref"),
        regexp_substr(col("c_mktsegment"), lit("(?i)[a-z]{3}")).as("ci_sub"),
        regexp_instr(col("c_name"), lit("[1-9]")).as("first_digit_pos"),
        regexp_count(col("c_mktsegment"), lit("(?i)[aeiou]")).as("ci_vowels"))
    }),

    "fn_like" -> ((s, d) => {
      part(s, d).select(
        col("p_partkey"),
        col("p_name").like("%ring%").as("lk"),
        col("p_name").ilike("SMALL%").as("il"),
        col("p_brand").like("Brand#1_").as("lk_us"),
        expr("p_name LIKE 'x!%%' ESCAPE '!'").as("lk_esc"),
        (col("p_name").like("small%") || col("p_name").like("red%")).as("lk_any"),
        (col("p_name").like("%a%") && col("p_name").like("%e%")).as("lk_all"),
        (!col("p_type").like("%ECO%")).as("not_lk"))
    }),

    "fn_url" -> ((s, d) => {
      val url = concat(
        lit("https://"), col("source"), lit(".example.com/docs/"), col("lang"),
        lit("/"), col("doc_id"), lit("?id="), col("doc_id"),
        lit("&lang="), col("lang"), lit("#sec1"))
      documents(s, d).select(
        col("doc_id"),
        parse_url(url, lit("PROTOCOL")).as("proto"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("REF")).as("ref"),
        parse_url(url, lit("QUERY"), lit("lang")).as("qlang"))
    }),

    // Snowflake-dialect names through plain spark.sql — the
    // SnowflakeAliases layer (functions/SnowflakeAliases.scala) resolves
    // iff/div0/square/bit*/bool*/charindex/editdistance/insert/strtok as
    // Catalyst compositions, so reference SQL text runs verbatim.
    // editdistance's 3-arg form keeps Snowflake cap-at-max semantics while
    // running Spark's banded kernel underneath.
    "fn_snowflake_sql" -> ((s, d) => {
      graft.Tables.part(s, d).createOrReplaceTempView("part_sf")
      s.sql("""
        SELECT p_partkey,
          iff(p_size > 25, 'big', 'small') AS sz,
          div0(p_retailprice, p_partkey % 5) AS d0,
          square(p_size) AS sq,
          bitand(p_partkey, 255) AS ba,
          bitor(p_partkey, 16) AS bo,
          bitxor(p_partkey, 85) AS bx,
          booland(p_size - 10, p_partkey % 3) AS bla,
          boolor(p_size - p_size, p_partkey % 2) AS blo,
          boolxor(p_partkey % 2, p_size % 2) AS blx,
          boolnot(p_partkey % 2) AS bln,
          charindex('a', p_name) AS ci,
          charindex('a', p_name, 5) AS ci5,
          editdistance(p_name, 'promo brushed steel') AS ed,
          iff(editdistance(p_name, 'promo brushed steel', 5) < 0, 5,
              editdistance(p_name, 'promo brushed steel', 5)) AS ed5,
          insert(p_name, 2, 3, 'XYZ') AS ins,
          strtok(p_type, ' -', 2) AS tok
        FROM part_sf WHERE p_partkey % 7 = 0""")
    })
  )

  override def oracle: Map[String, String] = Map(
    // charindex-with-start and INSERT are emulated (DuckDB lacks
    // locate-with-start and OVERLAY); strtok via regex split + filter.
    "fn_snowflake_sql" ->
      """SELECT p_partkey,
        |  CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS sz,
        |  CASE WHEN p_partkey % 5 = 0 THEN 0.0
        |       ELSE p_retailprice / (p_partkey % 5) END AS d0,
        |  p_size * p_size AS sq,
        |  p_partkey & 255 AS ba,
        |  p_partkey | 16 AS bo,
        |  xor(p_partkey, 85) AS bx,
        |  (p_size - 10) <> 0 AND (p_partkey % 3) <> 0 AS bla,
        |  (p_size - p_size) <> 0 OR (p_partkey % 2) <> 0 AS blo,
        |  ((p_partkey % 2) <> 0) <> ((p_size % 2) <> 0) AS blx,
        |  (p_partkey % 2) = 0 AS bln,
        |  CAST(position('a' IN p_name) AS INTEGER) AS ci,
        |  CAST(CASE WHEN position('a' IN substring(p_name, 5)) = 0 THEN 0
        |       ELSE position('a' IN substring(p_name, 5)) + 4 END AS INTEGER) AS ci5,
        |  CAST(levenshtein(p_name, 'promo brushed steel') AS INTEGER) AS ed,
        |  CAST(least(levenshtein(p_name, 'promo brushed steel'), 5) AS INTEGER) AS ed5,
        |  substring(p_name, 1, 1) || 'XYZ' || substring(p_name, 5) AS ins,
        |  list_filter(string_split_regex(p_type, '[ -]'), x -> x <> '')[2] AS tok
        |FROM part WHERE p_partkey % 7 = 0""".stripMargin,

    // DuckDB 1.0 regexp notes: matches options 'i'; replace needs 'g' to
    // hit all occurrences and \n backrefs; case-insensitive substr
    // emulated with an explicit [a-zA-Z] class (same output, original
    // case); instr via position-of-first-match (leftmost-match argument:
    // an earlier literal occurrence would itself be the leftmost match);
    // count via len(regexp_extract_all).
    "fn_regexp2" ->
      """SELECT c_custkey,
        |  regexp_matches(c_mktsegment, '^mach', 'i') AS ci_like,
        |  regexp_extract(c_name, '(Customer)#(\d+)', 2) AS grp2,
        |  regexp_replace(c_name, '(Customer)#(\d+)', '\2-\1', 'g') AS backref,
        |  regexp_extract(c_mktsegment, '[a-zA-Z]{3}') AS ci_sub,
        |  CAST(CASE WHEN regexp_extract(c_name, '[1-9]') = '' THEN 0
        |       ELSE position(regexp_extract(c_name, '[1-9]') IN c_name) END
        |       AS INTEGER) AS first_digit_pos,
        |  CAST(len(regexp_extract_all(c_mktsegment, '[aeiouAEIOU]')) AS INTEGER) AS ci_vowels
        |FROM customer WHERE c_custkey % 4 = 0""".stripMargin,

    "fn_string" ->
      """SELECT p_partkey,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  upper(p_name) AS up,
        |  lower(p_type) AS lo,
        |  array_to_string(list_transform(string_split(p_type, ' '),
        |    w -> upper(w[1]) || lower(w[2:])), ' ') AS ic,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS lp,
        |  rpad(p_brand, 12, '*') AS rp,
        |  trim('  ' || p_name || '  ') AS tr,
        |  ltrim('  ' || p_name || '  ') AS ltr,
        |  rtrim('  ' || p_name || '  ') AS rtr,
        |  reverse(p_name) AS rev,
        |  substring(p_name, 2, 5) AS sub,
        |  left(p_name, 4) AS lft,
        |  right(p_name, 3) AS rgt,
        |  replace(p_name, ' ', '_') AS rep,
        |  repeat(p_brand, 2) AS rpt,
        |  p_name || '|' || p_brand || '|' || p_type AS cw,
        |  split_part(p_name, ' ', 2) AS sp,
        |  CAST(instr(p_name, 'e') AS INTEGER) AS pos,
        |  translate(p_name, 'aeiou', '12345') AS trn,
        |  CAST(ascii(p_name) AS INTEGER) AS asc,
        |  chr(CAST(65 + p_partkey % 26 AS INTEGER)) AS ch,
        |  CAST(levenshtein(p_name, 'small ring') AS INTEGER) AS lev,
        |  CAST(CASE WHEN levenshtein(p_name, 'small ring') <= 4
        |       THEN levenshtein(p_name, 'small ring') ELSE -1 END AS INTEGER) AS lev4,
        |  jaro_winkler_similarity(p_name, 'small ring') AS jw,
        |  starts_with(p_name, 'small') AS sw,
        |  ends_with(p_name, 't') AS ew,
        |  contains(p_name, 'id') AS ct
        |FROM part""".stripMargin,

    "fn_regexp" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, 'Customer#(\d+)', 1) AS rext,
        |  array_to_string(regexp_extract_all(c_mktsegment, '[AEIOU]+'), ',') AS rall,
        |  regexp_replace(c_mktsegment, '[AEIOU]', '*', 'g') AS rrep,
        |  regexp_matches(c_mktsegment, '^(MACHINERY|FURNITURE)$') AS rlk,
        |  CAST(len(regexp_extract_all(c_name, '0')) AS INTEGER) AS rcnt,
        |  CAST(CASE WHEN regexp_matches(c_mktsegment, '[IOU]')
        |       THEN instr(c_mktsegment, regexp_extract(c_mktsegment, '[IOU]', 0))
        |       ELSE 0 END AS INTEGER) AS rins,
        |  nullif(regexp_extract(c_mktsegment, '[A-Z]*RY', 0), '') AS rsub
        |FROM customer WHERE c_custkey % 3 = 0""".stripMargin,

    "fn_hash" ->
      """SELECT p_partkey,
        |  md5(p_name) AS m5,
        |  sha256(p_name) AS sh2,
        |  upper(hex(p_name)) AS hx,
        |  to_base64(p_name::BLOB) AS b64,
        |  CAST(from_base64(to_base64(p_name::BLOB)) AS VARCHAR) AS b64rt,
        |  CAST(bit_length(p_name) AS INTEGER) AS bl,
        |  CAST(octet_length(p_name::BLOB) AS INTEGER) AS ol
        |FROM part WHERE p_partkey % 5 = 0""".stripMargin,

    "fn_string3" ->
      """SELECT p_partkey,
        |  ltrim(p_name, 'sprd') AS lt_cs,
        |  rtrim(p_name, 'aeiou') AS rt_cs,
        |  trim(p_name, 'sdm') AS tb_cs,
        |  array_to_string(string_split(p_type, ' '), '|') AS strtok_arr,
        |  substring(p_name, -4, 3) AS sub_neg,
        |  CAST(length(rtrim(p_brand || '   ')) AS INTEGER) AS rtrim_len
        |FROM part WHERE p_partkey % 6 = 0""".stripMargin,

    "fn_string2" ->
      """SELECT p_partkey,
        |  printf('%s-%05d', p_brand, p_partkey) AS fmt,
        |  left(p_name, 1) || 'XX' || substring(p_name, 5) AS ovl,
        |  string_split(p_name, ' ')[1] AS sidx,
        |  p_type || '   ' || p_brand AS spc,
        |  CASE WHEN 1 + p_partkey % 2 = 1 THEN 'even' ELSE 'odd' END AS elt_v,
        |  CAST(CASE WHEN instr(substring(p_name, 3), 'a') = 0 THEN 0
        |       ELSE instr(substring(p_name, 3), 'a') + 2 END AS INTEGER) AS loc3
        |FROM part WHERE p_partkey % 3 = 0""".stripMargin,

    "fn_like" ->
      """SELECT p_partkey,
        |  p_name LIKE '%ring%' AS lk,
        |  p_name ILIKE 'SMALL%' AS il,
        |  p_brand LIKE 'Brand#1_' AS lk_us,
        |  p_name LIKE 'x!%%' ESCAPE '!' AS lk_esc,
        |  (p_name LIKE 'small%' OR p_name LIKE 'red%') AS lk_any,
        |  (p_name LIKE '%a%' AND p_name LIKE '%e%') AS lk_all,
        |  (p_type NOT LIKE '%ECO%') AS not_lk
        |FROM part""".stripMargin,

    // The oracle constructs ground-truth URL parts from the same columns —
    // testing Spark's parse_url against the known construction.
    "fn_url" ->
      """SELECT doc_id,
        |  'https' AS proto,
        |  source || '.example.com' AS host,
        |  '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
        |  'id=' || CAST(doc_id AS VARCHAR) || '&lang=' || lang AS query,
        |  'sec1' AS ref,
        |  lang AS qlang
        |FROM documents""".stripMargin
  )
}
