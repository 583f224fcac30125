package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `Array[Float]` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, …))`) is evaluated interpreted — per-element
  * lambda dispatch plus a materialized intermediate array. This expression
  * compiles to a tight primitive loop inside whole-stage codegen: no
  * allocation, no virtual calls — the SURVEY §7.3 "custom Expression only
  * where it benches meaningfully" case.
  *
  * Semantics are IDENTICAL to the HOF version: left-fold in array order of
  * `(double) a[i] * (double) b[i]` — bit-compatible with the DuckDB oracle's
  * `list_reduce` replay. Null if either array is null; mismatched lengths
  * fold over the shorter prefix; null elements contribute 0 (embeddings are
  * non-null in practice).
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** 60-bit md5 hash of a string column, computed directly from the digest
  * bytes: identical value to `conv(substr(md5(s),1,15),16,10)` (first 15 hex
  * chars = first 60 bits = first 8 bytes big-endian >>> 4) without the hex
  * string allocation and base-16 reparse — the dedup signature path runs
  * this once per (doc, shingle) row, so the constant matters.
  */
case class Md5Hash60(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_md5_60 requires a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  protected override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Hash60.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digestTl =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes) as an unsigned long. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digestTl.get()
    md.reset()
    val d = md.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}

object VectorExpressions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$fn $arg must be a literal, got $other")
  }

  /** Name → builder for every native expression in this module — the
    * single source for both session-level registration ([[register]]) and
    * the `spark.sql.extensions` path ([[graft.GraftExtensions]]).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (exprs => FloatDot(exprs(0), exprs(1))),
    "graft_md5_60" -> (exprs => Md5Hash60(exprs.head)),
    "graft_fingerprint" -> (exprs => FingerprintExpr(exprs.head)),
    "graft_token_count" -> (exprs => TokenCountExpr(exprs.head)),
    "graft_minhash" -> (exprs => MinHashSigExpr(exprs.head,
      litInt(exprs(1), "graft_minhash", "numHashes"))),
    "graft_simhash" -> (exprs => SimHashSigExpr(exprs.head)),
    "graft_shingle_hashes" -> (exprs => ShingleHashExpr(exprs.head,
      litInt(exprs(1), "graft_shingle_hashes", "k"))),
    "graft_misra_gries" -> (exprs => MisraGriesAgg(exprs.head,
      litInt(exprs(1), "graft_misra_gries", "k"))),
    "graft_top_k" -> (exprs => TopKAgg(exprs(0), exprs(1),
      litInt(exprs(2), "graft_top_k", "k"))),
    // Spark's own codegen'd probe expression, re-exposed so a library
    // user (and [[graft.ext.BloomPrune]]) can probe a sketch built with
    // the public DataFrameStatFunctions.bloomFilter API
    "graft_bloom_might_contain" -> (exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1))),
    "graft_nfc" -> (exprs => NfcNormalizeExpr(exprs.head)),
    "graft_strip_accents" -> (exprs => StripAccentsExpr(exprs.head)),
    "graft_hilbert" -> (exprs => HilbertIndexExpr(exprs(0), exprs(1))))

  /** Idempotently register the native expressions in the session's
    * function registry (no-op — and no re-registration warning — when a
    * name is already bound, e.g. via [[graft.GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      val registry = spark.sessionState.functionRegistry
      if (!registry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
