package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for the document-cleaning front of a
  * training-data pipeline: canonical composition (NFC) and diacritic
  * stripping. Spark ships neither as a builtin; both are narrow per-row
  * string transforms, so they belong in whole-stage codegen (a UDF here
  * would break the scan stage's codegen span at exactly the 100 TB hot
  * path). Both are standard Unicode algorithms (java.text.Normalizer),
  * so other engines' implementations (e.g. DuckDB's utf8proc
  * `nfc_normalize` / `strip_accents`) produce identical bytes — the
  * cross-engine property the q99 oracle adjudicates.
  */
abstract class UnicodeNormalizeBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
}

/** Canonical composition (NFC): combining sequences (`e` + U+0301)
  * compose to their precomposed form (`é`). Idempotent; pure per-row.
  */
case class NfcNormalizeExpr(child: Expression) extends UnicodeNormalizeBase {
  protected override def nullSafeEval(input: Any): Any =
    NormalizeFns.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeFns.nfc($c)")
  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}

/** Diacritic stripping: NFD-decompose, drop combining marks, recompose.
  * `é` → `e`, `ü` → `u`; non-mark letters (`ß`) pass through — the same
  * contract as utf8proc's strip_accents.
  */
case class StripAccentsExpr(child: Expression) extends UnicodeNormalizeBase {
  protected override def nullSafeEval(input: Any): Any =
    NormalizeFns.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeFns.stripAccents($c)")
  override protected def withNewChildInternal(
      newChild: Expression): StripAccentsExpr = copy(child = newChild)
}

object NormalizeFns {
  /** ASCII fast path: normalization is identity on pure-ASCII bytes, and
    * at corpus scale most rows ARE ascii — skip the String round-trip.
    */
  private def isAscii(s: UTF8String): Boolean = {
    val b = s.getBytes
    var i = 0
    while (i < b.length) {
      if (b(i) < 0) return false
      i += 1
    }
    true
  }

  def nfc(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  private val Marks = "\\p{M}+".r

  def stripAccents(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(Normalizer.normalize(
      Marks.replaceAllIn(
        Normalizer.normalize(s.toString, Normalizer.Form.NFD), ""),
      Normalizer.Form.NFC))
}
