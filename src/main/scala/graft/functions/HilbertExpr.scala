package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point — the locality layout key that
  * dominates Z-order for range scans (a Z-curve takes long diagonal jumps
  * between quadrants; the Hilbert curve is continuous, so an axis-aligned
  * query box touches fewer, longer index runs — the reason production
  * table formats offer hilbert-clustering beside z-ordering).
  *
  * Fixed 16-bit-per-dimension domain (x, y ∈ [0, 65536)); inputs are
  * masked into range. The standard xy2d walk — per level `s` (high bit
  * down): quadrant digit `(3·rx) ⊕ ry` weighted by `s²`, then the
  * reflect/swap rotation — in pure integer arithmetic, so a SQL engine
  * can replay it as a fold over the 16 levels (the DuckDB oracle carries
  * (x, y, d) through `list_reduce` — q228). Reflection uses `s−1−x`;
  * the full-grid `n−1−x` variant is identical because later levels read
  * only bits below `s` and the two reflections agree mod `s`.
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert requires (bigint, bigint), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndexExpr.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.HilbertIndexExpr.xy2d($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexExpr {
  final val Bits = 16
  final val Side = 1L << Bits // 65536

  /** The integer Hilbert walk; exactly mirrored by the SQL fold. */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & (Side - 1)
    var y = y0 & (Side - 1)
    var d = 0L
    var s = Side >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
