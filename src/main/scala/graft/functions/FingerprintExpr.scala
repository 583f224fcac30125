package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Fused polynomial rolling-hash document fingerprint:
  * `(acc * 31 + codepoint) % 1e9+7` left-folded over the character stream.
  *
  * The composed form (`aggregate(split(text, ''), …)`) materializes one
  * single-character STRING per character per document and folds them with an
  * interpreted lambda — the per-row hot loop at 100 TB of documents (the
  * same pattern [[ShingleHashExpr]] was built to kill). This expression
  * decodes UTF-8 code points straight off the document's bytes inside
  * whole-stage codegen: no array, no per-character allocation.
  *
  * Bit-parity with the composed form (FingerprintSpec): Spark's
  * `split(s, '')` splits between code points (surrogate pairs stay whole)
  * and `ascii(c)` returns the leading code point, so folding decoded code
  * points in byte order is the identical sequence — and matches the DuckDB
  * oracle's `string_split(text, '') → ascii(c)` replay
  * (queries/TextQueries.scala q26).
  */
case class FingerprintExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    FingerprintExpr.hash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FingerprintExpr.hash($c.getBytes())")

  override protected def withNewChildInternal(
      newChild: Expression): FingerprintExpr = copy(child = newChild)
}

object FingerprintExpr {
  private final val P = 1000000007L

  /** Decode UTF-8 code points in place and fold the rolling hash — one pass,
    * zero allocation. Malformed lead bytes fall back to their raw value for
    * one byte (cannot occur for Spark-produced UTF8Strings, which are valid
    * UTF-8).
    */
  def hash(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xff
      var cp = b
      var len = 1
      if (b >= 0x80) {
        if ((b & 0xe0) == 0xc0) { cp = b & 0x1f; len = 2 }
        else if ((b & 0xf0) == 0xe0) { cp = b & 0x0f; len = 3 }
        else if ((b & 0xf8) == 0xf0) { cp = b & 0x07; len = 4 }
      }
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (bytes(i + j) & 0x3f)
        j += 1
      }
      acc = (acc * 31 + cp) % P
      i += len
    }
    acc
  }
}
