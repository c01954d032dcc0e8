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
  }
}
