package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Long-tail Snowflake kernel surface (VERDICT r7 item 2): the TO_*
  * conversion family with format arguments, the REGEXP_* family with
  * position/occurrence/flags/group arguments, and number-to-datetime
  * auto-scaling — each composed from codegen'd Spark builtins, never a
  * UDF, so the whole battery stays inside whole-stage codegen.
  *
  * Reference: BodoSQL/bodosql/kernels/snowflake_conversion_array_kernels.py
  * (to_char:945, convert_snowflake_date_format_str_to_py_format:1309,
  * number_to_datetime:1340, to_boolean_util:94, to_number_helper:1858) and
  * regexp_array_kernels.py (regexp_substr:291, regexp_instr:141,
  * regexp_count:105, regexp_replace:235).
  */
object SnowflakeFns {

  // ---- Snowflake date/time format codes -> Spark DateTimeFormatter codes --

  /** Token map mirroring the reference's format_map (same token set,
    * Spark targets instead of strftime). Scanned longest-token-first at
    * each position, so a produced target (MMM) can never be re-matched by
    * a shorter source token (MM). */
  private val sfDateTokens: Seq[(String, String)] = Seq(
    "YYYY" -> "yyyy", "YY" -> "yy", "MMMM" -> "MMMM", "MON" -> "MMM",
    "MM" -> "MM", "DD" -> "dd", "DY" -> "EEE", "HH24" -> "HH",
    "HH12" -> "hh", "MI" -> "mm", "SS" -> "ss", "AM" -> "a", "PM" -> "a")

  def sfFormatToSpark(fmt: String): String = {
    val up = fmt.toUpperCase
    val sb = new StringBuilder
    var i = 0
    while (i < up.length) {
      sfDateTokens.find { case (from, _) => up.startsWith(from, i) } match {
        case Some((from, to)) => sb.append(to); i += from.length
        case None => sb.append(up.charAt(i)); i += 1
      }
    }
    sb.toString
  }

  /** TO_CHAR(datetime, 'YYYY-MM-DD …') with Snowflake format codes. */
  def toCharDt(c: Column, sfFmt: String): Column =
    date_format(c, sfFormatToSpark(sfFmt))

  /** TRY_TO_DATE(string, 'DD/MM/YYYY' …): non-parsing input -> null,
    * surfaced as a midnight timestamp (the repo-wide DATE dtype rule). */
  def tryToDate(c: Column, sfFmt: String): Column =
    try_to_timestamp(c, lit(sfFormatToSpark(sfFmt))).cast("date").cast("timestamp")

  // ---- TO_BOOLEAN / TRY_TO_BOOLEAN: the full Snowflake token set --------

  private val trueTokens = Seq("true", "t", "yes", "y", "on", "1")
  private val falseTokens = Seq("false", "f", "no", "n", "off", "0")

  /** String form; unknown tokens -> null (TRY semantics — the strict form
    * is the same expression guarded by raise_error upstream). */
  def tryToBooleanStr(c: Column): Column = {
    val t = lower(trim(c))
    when(t.isin(trueTokens: _*), lit(true))
      .when(t.isin(falseTokens: _*), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** Numeric form: nonzero -> true (Snowflake TO_BOOLEAN(number)). */
  def toBooleanNum(c: Column): Column =
    when(c.isNull, lit(null).cast("boolean")).otherwise(c =!= 0)

  // ---- number -> datetime auto-scaling (TO_DATE/TO_TIMESTAMP(number)) ---

  /** Magnitude-scaled epoch interpretation: seconds below one year of
    * milliseconds, then milli/micro/nano — the reference's
    * number_to_datetime thresholds verbatim. */
  def numberToTs(n: Column): Column = {
    val nl = n.cast("long")
    when(nl < 31536000000L, timestamp_seconds(nl))
      .when(nl < 31536000000000L, timestamp_millis(nl))
      .when(nl < 31536000000000000L, timestamp_micros(nl))
      .otherwise(timestamp_micros((nl / 1000).cast("long")))
  }

  // ---- REGEXP_* with position / occurrence / flags / group --------------

  /** Inline-flag wrapping: Snowflake regex_parameters i/s/m ('c' is the
    * default case-sensitive mode). */
  private def wrap(pattern: String, flags: String): String = {
    val inline = "ism".filter(flags.contains(_))
    if (inline.isEmpty) pattern else s"(?$inline)$pattern"
  }

  private val Tail = 1 << 24 // substring length cap standing in for "to end"

  /** REGEXP_SUBSTR(subject, pattern, position, occurrence, flags, group):
    * the occurrence-th match (or capture group) at-or-after the 1-based
    * position; null when absent — composed as substring +
    * regexp_extract_all + null-safe get, all codegen'd. */
  def regexpSubstrSf(subject: Column, pattern: String, position: Int = 1,
                     occurrence: Int = 1, flags: String = "",
                     group: Int = 0): Column = {
    val sub = substring(subject, position, Tail)
    val all = regexp_extract_all(sub, lit(wrap(pattern, flags)), lit(group))
    get(all, lit(occurrence - 1))
  }

  /** REGEXP_INSTR(subject, pattern, position, occurrence, option, flags):
    * 1-based position IN THE ORIGINAL SUBJECT of the occurrence-th match
    * start (option=0) or one past its end (option=1); 0 when absent.
    * Position recovery without a custom expression: split() yields the
    * text BETWEEN matches, so the k-th match starts at
    * position + Σ len(parts[1..k]) + Σ len(matches[1..k-1]). */
  def regexpInstrSf(subject: Column, pattern: String, position: Int = 1,
                    occurrence: Int = 1, option: Int = 0,
                    flags: String = ""): Column = {
    val w = wrap(pattern, flags)
    val sub = substring(subject, position, Tail)
    val matches = regexp_extract_all(sub, lit(w), lit(0))
    val parts = split(sub, w)
    val k = occurrence
    val sumLen = (c: Column) =>
      aggregate(c, lit(0), (acc, x) => acc + length(x))
    val start = lit(position) + sumLen(slice(parts, 1, k)) +
      (if (k > 1) sumLen(slice(matches, 1, k - 1)) else lit(0))
    val res = if (option == 0) start else start + length(get(matches, lit(k - 1)))
    when(size(matches) >= k, res).otherwise(lit(0)).cast("int")
  }

  /** REGEXP_COUNT(subject, pattern, position, flags). */
  def regexpCountSf(subject: Column, pattern: String, position: Int = 1,
                    flags: String = ""): Column =
    size(regexp_extract_all(substring(subject, position, Tail),
      lit(wrap(pattern, flags)), lit(0))).cast("int")

  /** REGEXP_REPLACE(subject, pattern, replacement, position): replaces all
    * matches at-or-after the position, leaving the prefix untouched. */
  def regexpReplaceSf(subject: Column, pattern: String, replacement: String,
                      position: Int = 1, flags: String = ""): Column =
    concat(substring(subject, 1, position - 1),
      regexp_replace(substring(subject, position, Tail),
        lit(wrap(pattern, flags)), lit(replacement)))

  // ---- string kernel edges ----------------------------------------------

  /** Snowflake INSERT(base, pos, len, ins) == ANSI OVERLAY: replace `len`
    * chars of `base` starting at 1-based `pos` with `ins`. */
  def insertSf(base: Column, pos: Int, len: Int, ins: Column): Column =
    overlay(base, ins, lit(pos), lit(len))

  /** Snowflake STRTOK(s, delimSet, part): every CHARACTER of delimSet
    * splits; empty tokens collapse; 1-based part; null when absent. */
  def strtokSf(s: Column, delimSet: String, part: Int): Column = {
    // escape only character-class metacharacters — a blanket backslash
    // would turn letters into escape codes (\a = BEL) in both engines
    val cls = "[" + delimSet.flatMap(ch =>
      if ("[]^-\\".contains(ch)) s"\\$ch" else ch.toString) + "]+"
    val toks = filter(split(s, cls), t => length(t) > 0)
    get(toks, lit(part - 1))
  }
}
