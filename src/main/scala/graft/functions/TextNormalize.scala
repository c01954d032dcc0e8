package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-normalization kernels for the training-data cleaning
  * pipeline — NFC / NFKC normalization and accent stripping as native
  * codegen'd Catalyst expressions (Spark has no builtin normalizer; the
  * reference's cleaning story lives in its string kernel library,
  * BodoSQL/bodosql/kernels/string_array_kernels.py).
  *
  * Web-scraped corpora mix composed and decomposed codepoints ("café" as
  * 4 or 5 codepoints), compatibility forms (ligature ﬁ, fullwidth digits),
  * and accent variants; without canonicalization the SAME text hashes to
  * different dedup buckets and tokenizes differently. NFC is the standard
  * storage form, NFKC the standard pre-tokenization fold, strip_accents
  * the classic matching fold (DuckDB ships nfc_normalize/strip_accents
  * natively — those two are oracle-checked; NFKC is pinned by ScalaTest
  * vectors since DuckDB lacks it).
  *
  * All three are null-safe unary expressions whose codegen emits one
  * static JVM call, so surrounding projections stay in a single
  * WholeStageCodegen span. java.text.Normalizer is the JDK's ICU-derived
  * implementation of UAX #15 — pure function, thread-safe, no allocation
  * beyond the result.
  */
abstract class NormalizeBase extends UnaryExpression {
  /** JVM kernel name on graft.functions.TextNormalize (codegen target). */
  protected def kernel: String

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextNormalize.dispatch(kernel,
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextNormalize.$kernel($c.toString()))")
}

case class NfcNormalize(child: Expression) extends NormalizeBase {
  override protected def kernel: String = "nfc"
  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class NfkcNormalize(child: Expression) extends NormalizeBase {
  override protected def kernel: String = "nfkc"
  override def prettyName: String = "nfkc_normalize"
  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends NormalizeBase {
  override protected def kernel: String = "stripAccents"
  override def prettyName: String = "strip_accents"
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object TextNormalize {
  import java.text.Normalizer

  def nfc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFC)
  def nfkc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFKC)

  /** NFD-decompose, drop combining marks (Unicode category Mn), keep the
    * base characters — café → cafe, naïve → naive. Matches DuckDB's
    * strip_accents on Latin text; the result is left decomposed-free by
    * construction (marks removed, bases are unaffected by NFD). */
  def stripAccents(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val b = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) b.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    b.toString
  }

  private[graft] def dispatch(kernel: String, s: String): String = kernel match {
    case "nfc"          => nfc(s)
    case "nfkc"         => nfkc(s)
    case "stripAccents" => stripAccents(s)
  }
}
