package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JAROWINKLER_SIMILARITY as a native Catalyst expression — the reference
  * ships it as a BodoSQL kernel (BodoSQL/bodosql/kernels/
  * string_array_kernels.py:125 `jarowinkler_similarity`) and Spark has no
  * builtin. Semantics follow the standard Winkler variant (prefix weight
  * 0.1 over at most 4 chars, boost only when jaro > 0.7, 0.0 when either
  * side is empty) — verified value-identical to DuckDB's
  * `jaro_winkler_similarity`, which the oracle uses.
  *
  * Null-safe binary expression with codegen (`doGenCode` emits a static
  * call into the JVM kernel), so a projection battery containing
  * `jaro_winkler` stays inside one WholeStageCodegen span instead of
  * falling back to interpreted eval for the whole stage.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  private def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0; i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transposition count is halved with FLOOR (t/2 integer division) —
    // matches DuckDB/rapidfuzz; t/2.0 would diverge on odd t.
    (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
  }

  def similarity(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j > 0.7) {
      val n = math.min(math.min(s1.length, s2.length), 4)
      var p = 0
      while (p < n && s1.charAt(p) == s2.charAt(p)) p += 1
      j + p * 0.1 * (1 - j)
    } else j
  }

  /** Register `jaro_winkler(s1, s2)` for sessions built WITHOUT
    * GraftExtensions (which injects it at session build). Truly
    * idempotent: skipped when the extension already provided it. */
  def register(spark: SparkSession): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler")
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "jaro_winkler", (args: Seq[Expression]) => JaroWinkler(args(0), args(1)),
        "built-in")
  }
}
