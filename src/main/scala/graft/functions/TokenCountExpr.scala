package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_token_count(text)` — the number of BPE-ish regex segments
  * `[a-z]+|[0-9]+|[^a-z0-9\s]` in `lower(text)`, counted without
  * materializing them.
  *
  * The composed form `size(regexp_extract_all(lower(text), ...))` allocates
  * one String per match (thousands per document) plus the ArrayData holding
  * them, only for `size()` to throw the array away — measured as the single
  * most expensive per-row loop in the r3 bench (q25, 11.7 s at sf0.1). This
  * expression runs the equivalent three-class scanner (letter run / digit
  * run / single non-space symbol) in one pass inside whole-stage codegen;
  * the only allocation is the per-document lowercased copy (same Unicode
  * `Locale.ROOT` lowering the composed form applies, kept so parity is
  * exact even for case mappings that cross classes, e.g. Kelvin sign → k).
  *
  * Bit-parity with the composed form is asserted by TokenCountSpec on the
  * real documents corpus plus adversarial fixtures (surrogates, combining
  * marks, all-whitespace) — and the DuckDB oracle replays the same regex
  * (RE2 `\s` = Java `\s` = the six ASCII separators on this corpus).
  */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_count requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    TokenCountExpr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenCountExpr.count($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenCountExpr = copy(child = newChild)
}

object TokenCountExpr {

  /** Exactly the Java regex `\s` class: [ \t\n\x0B\f\r]. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Count matches of `[a-z]+|[0-9]+|[^a-z0-9\s]` over the Locale.ROOT
    * lowercase of `text`. Alternation order makes letter/digit runs maximal
    * and every other non-whitespace CODE POINT (a surrogate pair is one
    * match, as in both Java regex and RE2) a single match.
    */
  def count(text: UTF8String): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var cnt = 0L
    var i = 0
    val n = s.length
    // 0 = none/ws/other, 1 = in [a-z] run, 2 = in [0-9] run
    var run = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') {
        if (run != 1) { cnt += 1; run = 1 }
        i += 1
      } else if (c >= '0' && c <= '9') {
        if (run != 2) { cnt += 1; run = 2 }
        i += 1
      } else if (isWs(c)) {
        run = 0
        i += 1
      } else {
        cnt += 1
        run = 0
        i += (if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
      }
    }
    cnt
  }
}
