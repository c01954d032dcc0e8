package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

/** Snowflake-dialect function names Spark 4 lacks, registered as pure
  * Catalyst compositions so reference SQL runs verbatim (ref
  * BodoSQL/bodosql/kernels/: numeric_array_kernels.py bitand/div0/square,
  * other_array_kernels.py booland/boolor/boolxor/boolnot/iff,
  * string_array_kernels.py charindex/editdistance/insert/strtok).
  * Spark 4.1 already ships the rest of the dialect surface (len, dayname,
  * monthname, nvl2, zeroifnull, nullifzero, equal_null, decode,
  * to_varchar, regexp_like, startswith/endswith/contains) — only the
  * genuinely missing names are aliased, checked against SHOW FUNCTIONS.
  *
  * Every alias is an unresolved-expression composition: the analyzer's
  * type coercion then applies the same implicit casts a builtin gets, and
  * everything stays inside whole-stage codegen (no UDFs).
  */
object SnowflakeAliases {

  def install(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, usage: String)(b: PartialFunction[Seq[Expression], Expression]): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name),
        (args: Seq[Expression]) => b.applyOrElse(args, (a: Seq[Expression]) =>
          throw new IllegalArgumentException(s"$name expects $usage, got ${a.size} args"))))

    // conditional / boolean family (numeric operands, nonzero = true;
    // three-valued null propagation falls out of And/Or/EqualTo)
    reg("iff", "(cond, a, b)") { case Seq(c, a, b) => If(c, a, b) }
    reg("booland", "(x, y)") { case Seq(x, y) =>
      And(Not(EqualTo(x, Literal(0))), Not(EqualTo(y, Literal(0)))) }
    reg("boolor", "(x, y)") { case Seq(x, y) =>
      Or(Not(EqualTo(x, Literal(0))), Not(EqualTo(y, Literal(0)))) }
    reg("boolxor", "(x, y)") { case Seq(x, y) =>
      Not(EqualTo(Not(EqualTo(x, Literal(0))), Not(EqualTo(y, Literal(0))))) }
    reg("boolnot", "(x)") { case Seq(x) => EqualTo(x, Literal(0)) }

    // numeric
    reg("div0", "(x, y)") { case Seq(x, y) =>
      If(EqualTo(y, Literal(0)), Literal(0d), Divide(x, y)) }
    reg("square", "(x)") { case Seq(x) => Multiply(x, x) }
    reg("bitand", "(x, y)") { case Seq(x, y) => BitwiseAnd(x, y) }
    reg("bitor", "(x, y)") { case Seq(x, y) => BitwiseOr(x, y) }
    reg("bitxor", "(x, y)") { case Seq(x, y) => BitwiseXor(x, y) }

    // string
    reg("charindex", "(substr, str[, start])") {
      case Seq(sub, str) => new StringLocate(sub, str)
      case Seq(sub, str, start) => StringLocate(sub, str, start) }
    reg("editdistance", "(a, b[, max])") {
      case Seq(a, b) => Levenshtein(a, b)
      case Seq(a, b, k) => Levenshtein(a, b, Some(k)) }
    // Snowflake INSERT(base, pos, len, repl) == OVERLAY(base PLACING repl
    // FROM pos FOR len)
    reg("insert", "(base, pos, len, repl)") {
      case Seq(base, pos, len, repl) => Overlay(base, repl, pos, len) }
    // STRTOK(str, delims, part): split on ANY delimiter character, skip
    // empty tokens, 1-based part; null when part exceeds the token count.
    // The delimiter set becomes a regex character class with class
    // metacharacters escaped; a literal delimiter folds to a constant.
    reg("strtok", "(str, delims, part)") { case Seq(s, d, p) =>
      val esc = RegExpReplace(d, Literal("([\\^\\-\\]\\[\\\\])"), Literal("\\\\$1"), Literal(1))
      val cls = Concat(Seq(Literal("["), esc, Literal("]")))
      // try_element_at: part beyond the token count is NULL (Snowflake
      // semantics), not an ANSI out-of-bounds error
      new TryElementAt(ArrayRemove(StringSplit(s, cls, Literal(-1)), Literal("")), p) }

    // ---- r8 long-tail kernels, SQL-callable (SURVEY §7.2-M5's "register
    // under functionRegistry" for the SnowflakeFns layer). Builders are
    // PURE CATALYST expression trees (a Column-bridge attempt left
    // UnresolvedFunction nodes inside ColumnNodeExpression, which the
    // analyzer treats as a resolved leaf — so registry builders must not
    // go through org.apache.spark.sql.functions). Format/pattern/part
    // arguments must be LITERALS — the same constant-argument
    // restriction the reference's kernels impose via numba literal
    // requirements. Names that would shadow a Spark builtin (to_char,
    // regexp_substr, last_day) get sf_-prefixed spellings instead, so
    // builtin behavior is never silently replaced; REGEXP_INSTR's
    // position-arithmetic form stays DSL-only (SnowflakeFns.regexpInstrSf).
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    def litStr(e: Expression, name: String): String = e match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$name requires a literal string argument, got $other")
    }
    def litInt(e: Expression, name: String): Int = e match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$name requires a literal integer argument, got $other")
    }
    def i(e: Expression): Expression = Cast(e, IntegerType)
    def l(e: Expression): Expression = Cast(e, LongType)
    // DATE_FROM_PARTS rollover: months from January of y, days from the 1st
    def dfp(y: Expression, mo: Expression, d: Expression): Expression =
      DateAdd(
        AddMonths(MakeDate(i(y), Literal(1), Literal(1)), i(Subtract(l(mo), Literal(1L)))),
        i(Subtract(l(d), Literal(1L))))
    def secondsOf(h: Expression, mi: Expression, s: Expression): Expression =
      Add(Add(Multiply(l(h), Literal(3600L)), Multiply(l(mi), Literal(60L))), l(s))
    val DayNs = 86400L * 1000000000L
    def wrapNs(tot: Expression): Expression =
      Remainder(Add(Remainder(tot, Literal(DayNs)), Literal(DayNs)), Literal(DayNs))

    reg("date_from_parts", "(year, month, day)") { case Seq(y, mo, d) =>
      dfp(y, mo, d) }
    reg("timestamp_from_parts", "(y, mo, d, h, mi, s)") {
      case Seq(y, mo, d, h, mi, s) =>
        SecondsToTimestamp(Add(l(Cast(dfp(y, mo, d), TimestampType)),
          secondsOf(h, mi, s))) }
    // TIME surface = ns-of-day long / 'HH:MM:SS' string (fn_time's model;
    // Spark has no TIME type)
    reg("time_from_parts", "(h, mi, s[, ns])") {
      case Seq(h, mi, s) =>
        wrapNs(Multiply(secondsOf(h, mi, s), Literal(1000000000L)))
      case Seq(h, mi, s, ns) =>
        wrapNs(Add(Multiply(secondsOf(h, mi, s), Literal(1000000000L)), l(ns))) }
    reg("time_from_parts_str", "(h, mi, s)") { case Seq(h, mi, s) =>
      val sec = IntegralDivide(
        wrapNs(Multiply(secondsOf(h, mi, s), Literal(1000000000L))),
        Literal(1000000000L))
      def two(e: Expression) = StringLPad(Cast(e, StringType), Literal(2), Literal("0"))
      Concat(Seq(
        two(IntegralDivide(sec, Literal(3600L))), Literal(":"),
        two(IntegralDivide(Remainder(sec, Literal(3600L)), Literal(60L))), Literal(":"),
        two(Remainder(sec, Literal(60L))))) }

    reg("sf_to_char", "(dt, 'fmt')") { case Seq(dt, f) =>
      DateFormatClass(Cast(dt, TimestampType),
        Literal(SnowflakeFns.sfFormatToSpark(litStr(f, "sf_to_char")))) }
    // sf_ prefix: Spark 4 ships its own try_to_date builtin with DIFFERENT
    // format semantics — shadowing it would silently change behavior (and
    // warn into every session log)
    reg("sf_try_to_date", "(str, 'fmt')") { case Seq(s, f) =>
      Cast(Cast(TryEval(new ParseToTimestamp(s,
        Literal(SnowflakeFns.sfFormatToSpark(litStr(f, "sf_try_to_date"))))),
        DateType), TimestampType) }
    reg("try_to_boolean", "(str)") { case Seq(s) =>
      // trim() mirrors the DSL kernel (tryToBooleanStr): ' true ' is true
      val low = Lower(new StringTrim(Cast(s, StringType)))
      def inSet(toks: Seq[String]) = In(low, toks.map(Literal(_)))
      CaseWhen(Seq(
        inSet(Seq("true", "t", "yes", "y", "on", "1")) -> Literal(true),
        inSet(Seq("false", "f", "no", "n", "off", "0")) -> Literal(false)), None) }

    reg("sf_regexp_substr", "(subject, 'pat'[, pos[, occ[, 'flags'[, group]]]])") {
      case sub +: pat +: rest =>
        val n = "sf_regexp_substr"
        val pos = if (rest.length > 0) litInt(rest(0), n) else 1
        val occ = if (rest.length > 1) litInt(rest(1), n) else 1
        val flags = if (rest.length > 2) litStr(rest(2), n) else ""
        val group = if (rest.length > 3) litInt(rest(3), n) else 0
        // same i/s/m handling as the DSL kernels (SnowflakeFns.wrap)
        val wrapped = SnowflakeFns.wrap(litStr(pat, n), flags)
        new TryElementAt(
          RegExpExtractAll(Substring(sub, Literal(pos), Literal(Int.MaxValue)),
            Literal(wrapped), Literal(group)),
          Literal(occ)) }
    reg("sf_regexp_count", "(subject, 'pat'[, pos[, 'flags']])") {
      case sub +: pat +: rest =>
        val n = "sf_regexp_count"
        val pos = if (rest.length > 0) litInt(rest(0), n) else 1
        val flags = if (rest.length > 1) litStr(rest(1), n) else ""
        val wrapped = SnowflakeFns.wrap(litStr(pat, n), flags)
        Size(RegExpExtractAll(Substring(sub, Literal(pos), Literal(Int.MaxValue)),
          Literal(wrapped), Literal(0))) }

    // ---- r9 verdict item 6: the remaining REGEXP_* spellings + scaled
    // TRY_TO_DECIMAL. Position arithmetic is the same split-between-
    // matches recovery the DSL kernel uses (regexpInstrSf), expressed
    // lambda-free: prefix length = length(array_join(slice(...), '')) —
    // so the whole tree stays inside whole-stage codegen.
    def joinLen(arr: Expression, k: Int): Expression =
      Length(ArrayJoin(Slice(arr, Literal(1), Literal(k)), Literal(""), None))
    def rejectZeroWidth(w: String, n: String): Unit =
      require(!java.util.regex.Pattern.compile(w).matcher("").find(),
        s"$n: pattern '$w' can match the empty string; zero-width matches " +
          "break split-based position recovery")

    reg("sf_regexp_instr", "(subject, 'pat'[, pos[, occ[, option[, 'flags']]]])") {
      case sub +: pat +: rest =>
        val n = "sf_regexp_instr"
        val pos = if (rest.length > 0) litInt(rest(0), n) else 1
        val occ = if (rest.length > 1) litInt(rest(1), n) else 1
        val option = if (rest.length > 2) litInt(rest(2), n) else 0
        val flags = if (rest.length > 3) litStr(rest(3), n) else ""
        require(occ >= 1 && (option == 0 || option == 1),
          s"$n: occurrence >= 1 and option in {0, 1}")
        val w = SnowflakeFns.wrap(litStr(pat, n), flags)
        rejectZeroWidth(w, n)
        val subE = Substring(sub, Literal(pos), Literal(Int.MaxValue))
        val matches = RegExpExtractAll(subE, Literal(w), Literal(0))
        val parts = StringSplit(subE, Literal(w), Literal(-1))
        val start = Add(Add(Literal(pos), joinLen(parts, occ)),
          if (occ > 1) joinLen(matches, occ - 1) else Literal(0))
        val res = if (option == 0) start
          else Add(start, Length(new TryElementAt(matches, Literal(occ))))
        CaseWhen(Seq(
          (GreaterThanOrEqual(Size(matches), Literal(occ)),
            Cast(res, IntegerType))), Literal(0)) }

    reg("sf_regexp_replace", "(subject, 'pat'[, 'repl'[, pos[, occ[, 'flags']]]])") {
      case sub +: pat +: rest =>
        val n = "sf_regexp_replace"
        val repl = SnowflakeFns.sfReplacementToJava(
          if (rest.length > 0) litStr(rest(0), n) else "")
        val pos = if (rest.length > 1) litInt(rest(1), n) else 1
        val occ = if (rest.length > 2) litInt(rest(2), n) else 0
        val flags = if (rest.length > 3) litStr(rest(3), n) else ""
        require(occ >= 0, s"$n: occurrence 0 (all) or >= 1")
        val w = SnowflakeFns.wrap(litStr(pat, n), flags)
        val prefix = Substring(sub, Literal(1), Literal(pos - 1))
        val subE = Substring(sub, Literal(pos), Literal(Int.MaxValue))
        if (occ == 0)
          Concat(Seq(prefix,
            RegExpReplace(subE, Literal(w), Literal(repl), Literal(1))))
        else {
          // replace ONLY the occ-th match: recover its start with the
          // instr arithmetic, re-apply the pattern anchored to exactly
          // the matched text (keeps group numbering for backrefs; exact
          // for patterns without lookaround), splice. Occurrence absent
          // -> subject unchanged, Snowflake semantics.
          rejectZeroWidth(w, n)
          val matches = RegExpExtractAll(subE, Literal(w), Literal(0))
          val parts = StringSplit(subE, Literal(w), Literal(-1))
          val startRel = Add(Add(Literal(1), joinLen(parts, occ)),
            if (occ > 1) joinLen(matches, occ - 1) else Literal(0))
          val mtext = new TryElementAt(matches, Literal(occ))
          val replaced = RegExpReplace(mtext,
            Literal("^(?:" + w + ")$"), Literal(repl), Literal(1))
          val spliced = Concat(Seq(prefix,
            Substring(subE, Literal(1), Subtract(startRel, Literal(1))),
            replaced,
            Substring(subE, Add(startRel, Length(mtext)), Literal(Int.MaxValue))))
          CaseWhen(Seq(
            (GreaterThanOrEqual(Size(matches), Literal(occ)), spliced)),
            Cast(sub, StringType))
        } }

    reg("try_to_decimal", "(expr[, precision[, scale]])") {
      case e +: rest =>
        val n = "try_to_decimal"
        val p = if (rest.length > 0) litInt(rest(0), n) else 38
        val sc = if (rest.length > 1) litInt(rest(1), n) else 0
        require(p >= 1 && p <= 38 && sc >= 0 && sc <= p,
          s"$n: precision 1-38, scale 0-precision, got ($p, $sc)")
        Cast(e, DecimalType(p, sc), None, EvalMode.TRY) }

    reg("sf_last_day", "(date, 'part')") { case Seq(d, part) =>
      litStr(part, "sf_last_day").toLowerCase match {
        case "month" => LastDay(d)
        case "week" => DateAdd(TruncDate(d, Literal("week")), Literal(6))
        case "quarter" =>
          DateAdd(AddMonths(TruncDate(d, Literal("quarter")), Literal(3)), Literal(-1))
        case "year" => MakeDate(Year(d), Literal(12), Literal(31))
        case other => throw new IllegalArgumentException(
          s"sf_last_day part must be month|week|quarter|year, got $other")
      } }

    reg("base64_encode", "(bin[, max_line_length[, 'alphabet']])") {
      case bin +: rest =>
        val n = "base64_encode"
        val lineLen = if (rest.length > 0) litInt(rest(0), n) else 0
        val alphabet = if (rest.length > 1) litStr(rest(1), n) else ""
        require(alphabet.length <= 3,
          s"base64_encode: alphabet is up to 3 chars (62nd, 63rd, padding), got '$alphabet'")
        require(alphabet.distinct.length == alphabet.length &&
          alphabet.forall(c => !c.isLetterOrDigit && c != '\n' && c != '\r'),
          s"base64_encode: alphabet chars must be distinct, non-alphanumeric, non-newline: '$alphabet'")
        val b = Base64(bin)
        val withAlpha = if (alphabet.isEmpty) b
          else StringTranslate(b, Literal("+/=".take(alphabet.length)), Literal(alphabet))
        if (lineLen <= 0) withAlpha
        else RegExpReplace(withAlpha, Literal(s"(.{$lineLen})"), Literal("$1\n"), Literal(1)) }
    reg("try_base64_decode_string", "(str)") { case Seq(s) =>
      If(RLike(s,
        Literal("^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$")),
        Cast(new UnBase64(s), StringType), Literal.create(null, StringType)) }
    reg("hex_encode", "(str[, case])") {
      case Seq(s) => Upper(Hex(s))
      case Seq(s, cs) => if (litInt(cs, "hex_encode") == 0) Lower(Hex(s)) else Upper(Hex(s)) }
    reg("try_hex_decode_string", "(str)") { case Seq(s) =>
      Cast(Unhex(s), StringType) }
  }
}
