package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_minhash(hsh, numHashes)` — the full MinHash signature of a
  * document's shingle-hash set as one array, computed per row.
  *
  * The r1–r3 formulation exploded the hash sets to (doc, h) rows and ran a
  * 128-column wide `min(...)` hash-aggregate: correct and partial-agg
  * friendly, but (a) 128 named aggregate expressions cost ~3 s of codegen
  * plan-compile per run (BASELINE.md q18 ledger), and (b) the aggregation
  * shuffles |docs| wide rows even though the input was already one row per
  * doc. Since [[ShingleHashExpr]] already yields the per-doc hash set as an
  * array, the signature is a pure scalar function of that array — this
  * expression computes all lanes in one fused loop inside whole-stage
  * codegen: no explode, no shuffle, one plan node.
  *
  * Lane arithmetic is IDENTICAL to the aggregate form (and the DuckDB
  * oracle replay): lane i = min over h of `(laneA(i) * (h % P) + laneB(i))
  * % P` with P = 1e9+7 — [[graft.ext.Dedup.laneA]]/[[graft.ext.Dedup.laneB]]
  * keep a*h+b inside int64. Bit-parity with the wide-agg form is asserted
  * by SignatureParitySpec. Null/empty hash sets yield null (the aggregate
  * form produced no row for a doc with no shingles; callers filter nulls).
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires an array<bigint> argument, got " +
        other.simpleString)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    SignatureMath.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c => s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $res =
       |  graft.functions.SignatureMath.minhash($c, $numHashes);
       |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigExpr = copy(child = newChild)
}

/** `graft_simhash(hsh)` — the 16-bit SimHash signature of a shingle-hash
  * set: bit j of the result is set iff the +1/−1 votes of bit j across the
  * set sum positive. Same fused-scalar rationale as [[MinHashSigExpr]]
  * (replaces a 16-column vote aggregate over exploded rows); bit-parity
  * with the aggregate form in SignatureParitySpec. Null/empty sets → null.
  */
case class SimHashSigExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires an array<bigint> argument, got " +
        other.simpleString)
  }

  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any = {
    val r = SignatureMath.simhash(input.asInstanceOf[ArrayData])
    if (r == SignatureMath.SimhashEmpty) null else Long.box(r)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sig")
    // -1L is SignatureMath.SimhashEmpty (a real signature is 16-bit)
    nullSafeCodeGen(ctx, ev, c => s"""
       |long $res = graft.functions.SignatureMath.simhash($c);
       |if ($res == -1L) {
       |  ${ev.isNull} = true;
       |} else { ${ev.value} = $res; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashSigExpr = copy(child = newChild)
}

object SignatureMath {

  private final val P = 1000000007L

  /** Sentinel for "empty set" from [[simhash]] (a real signature is a
    * 16-bit value, so −1 is unreachable).
    */
  final val SimhashEmpty: Long = -1L

  /** Lane parameter tables, cached per numHashes (the expression is built
    * with a literal lane count, so in practice this holds one entry).
    */
  private val laneCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def lanes(numHashes: Int): (Array[Long], Array[Long]) =
    laneCache.computeIfAbsent(numHashes, n => {
      val a = new Array[Long](n)
      val b = new Array[Long](n)
      var i = 0
      while (i < n) {
        a(i) = graft.ext.Dedup.laneA(i)
        b(i) = graft.ext.Dedup.laneB(i)
        i += 1
      }
      (a, b)
    })

  /** All MinHash lanes of one hash set in a fused loop; null for an empty
    * set (no shingles → no signature, matching the aggregate form's absent
    * group).
    */
  def minhash(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val (a, b) = lanes(numHashes)
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val hm = hashes.getLong(j) % P
      var i = 0
      while (i < numHashes) {
        val v = (a(i) * hm + b(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 16-bit SimHash of one hash set; [[SimhashEmpty]] for an empty set. */
  def simhash(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    if (n == 0) return SimhashEmpty
    val votes = new Array[Int](16)
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var bit = 0
      while (bit < 16) {
        if (((h >> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      j += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 16) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}
