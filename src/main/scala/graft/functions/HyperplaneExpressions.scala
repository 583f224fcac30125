package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused signed-random-projection (hyperplane) hashing over an
  * `Array[Float]` embedding column — the codegen'd replacement for the
  * composed form in [[graft.ext.Similarity.hyperplaneBucketComposed]],
  * which evaluates `numPlanes` interpreted `aggregate(zip_with(...))`
  * lambdas per row (one per plane) with a materialized intermediate array
  * each. These expressions make ONE pass over the vector per plane inside
  * whole-stage codegen.
  *
  * Bit-parity contract with the composed form (HyperplaneParitySpec):
  * per-plane dots are IEEE-double left folds in array order of
  * `(double) vec[d] * plane[d]` — identical fold order to both the HOF
  * form and the DuckDB oracle's `list_reduce` replay, so bucket ids are
  * bit-identical across all three.
  *
  * Null semantics: a null array → null result (vs the HOF form's bucket 0 —
  * a null vector then drops out of candidate joins instead of colliding in
  * bucket 0); any null ELEMENT → all-zero buckets, matching the HOF form
  * where a null element nulls every plane fold and `IF(NULL > 0, …)`
  * contributes no bit. A length mismatch vs `dim` throws per-row — the
  * plan-level replacement for the driver-side dim probes lshTopK used to
  * run (a silent mismatch would collapse vectors into bucket 0 = an
  * unpruned join).
  */
object HyperplaneMath {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Array[Double]]()

  /** Flattened deterministic md5-derived matrix (row i, dim d) at i*dim+d —
    * the k/1000 rationals of [[graft.ext.Similarity.mdComponent]] (exact
    * decimal literals in any engine). Tag "plane" = the LSH hyperplanes,
    * "ivf" = the IVF coarse-quantizer centroids.
    */
  def flatMatrix(tag: String, n: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((tag, n, dim), { _ =>
      val a = new Array[Double](n * dim)
      var i = 0
      while (i < n) {
        var d = 0
        while (d < dim) {
          a(i * dim + d) = graft.ext.Similarity.mdComponent(tag, i, d)
          d += 1
        }
        i += 1
      }
      a
    })

  def flatPlanes(numPlanes: Int, dim: Int): Array[Double] =
    flatMatrix("plane", numPlanes, dim)

  private def checkArr(arr: ArrayData, dim: Int, who: String): Boolean = {
    if (arr.numElements() != dim) {
      throw new IllegalArgumentException(
        s"$who: expected $dim-element vector, got ${arr.numElements()}")
    }
    var d = 0
    var anyNull = false
    while (d < dim && !anyNull) {
      if (arr.isNullAt(d)) anyNull = true
      d += 1
    }
    anyNull
  }

  private def planeDot(
      arr: ArrayData, planes: Array[Double], p: Int, dim: Int): Double = {
    var acc = 0.0
    var d = 0
    while (d < dim) {
      acc += arr.getFloat(d).toDouble * planes(p * dim + d)
      d += 1
    }
    acc
  }

  /** `numPlanes`-bit bucket: bit p set iff dot(vec, plane p) > 0. */
  def bucket(
      arr: ArrayData, planes: Array[Double], numPlanes: Int, dim: Int): Long = {
    if (checkArr(arr, dim, "graft_hyperplane_bucket")) return 0L
    var b = 0L
    var p = 0
    while (p < numPlanes) {
      if (planeDot(arr, planes, p, dim) > 0) b |= 1L << p
      p += 1
    }
    b
  }

  /** `numBands` band buckets of `bandBits` planes each; band b uses planes
    * [b*bandBits, (b+1)*bandBits). One array pass per plane, one output row
    * per band after posexplode — the banded-LSH candidate generator.
    */
  def bands(
      arr: ArrayData, planes: Array[Double], bandBits: Int,
      numBands: Int, dim: Int): ArrayData = {
    val out = new Array[Long](numBands)
    if (!checkArr(arr, dim, "graft_hyperplane_bands")) {
      var b = 0
      while (b < numBands) {
        var sig = 0L
        var j = 0
        while (j < bandBits) {
          if (planeDot(arr, planes, b * bandBits + j, dim) > 0) sig |= 1L << j
          j += 1
        }
        out(b) = sig
        b += 1
      }
    }
    new GenericArrayData(out)
  }

  /** IVF cell list: the `numProbes` centroid indices with the highest
    * dot(vec, centroid), ordered by descending dot with ties broken by the
    * lower centroid index — deterministic and exactly replayable in SQL via
    * a lexicographic sort on (-dot, index). Element 0 is the vector's home
    * cell (the inverted-list assignment); queries probe the full prefix.
    */
  def ivfCells(
      arr: ArrayData, centroids: Array[Double], numCentroids: Int, dim: Int,
      numProbes: Int): ArrayData = {
    val anyNull = checkArr(arr, dim, "graft_ivf_cells")
    val dots = new Array[Double](numCentroids)
    if (!anyNull) {
      var c = 0
      while (c < numCentroids) {
        dots(c) = planeDot(arr, centroids, c, dim)
        c += 1
      }
    }
    val order = (0 until numCentroids).sortBy(c => (-dots(c), c))
    new GenericArrayData(
      Array.tabulate[Long](numProbes)(j => order(j).toLong))
  }

  /** Multi-probe buckets: the base bucket plus `numProbes - 1` buckets with
    * the lowest-|margin| bits flipped (margin = the plane dot; the planes
    * most likely to have mis-bucketed the vector). Flip order: ascending
    * (|dot|, plane index) — deterministic and exactly replayable in SQL via
    * a lexicographic list sort.
    */
  def probes(
      arr: ArrayData, planes: Array[Double], numPlanes: Int, dim: Int,
      numProbes: Int): ArrayData = {
    val anyNull = checkArr(arr, dim, "graft_hyperplane_probes")
    val dots = new Array[Double](numPlanes)
    var base = 0L
    var p = 0
    while (p < numPlanes) {
      dots(p) = if (anyNull) 0.0 else planeDot(arr, planes, p, dim)
      if (dots(p) > 0) base |= 1L << p
      p += 1
    }
    val order = (0 until numPlanes).sortBy(p => (math.abs(dots(p)), p))
    val out = new Array[Long](numProbes)
    out(0) = base
    var j = 1
    while (j < numProbes) {
      out(j) = base ^ (1L << order(j - 1))
      j += 1
    }
    new GenericArrayData(out)
  }
}

sealed trait HyperplaneExpr extends UnaryExpression {
  def name: String
  def numPlanesTotal: Int
  def dim: Int

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires an array<float> argument, got ${other.simpleString}")
  }

  protected lazy val planes: Array[Double] =
    HyperplaneMath.flatPlanes(numPlanesTotal, dim)
}

/** `graft_hyperplane_bucket(vec, numPlanes, dim)` → long. */
case class HyperplaneBucket(child: Expression, numPlanes: Int, dim: Int)
    extends HyperplaneExpr {
  override def name: String = "graft_hyperplane_bucket"
  override def numPlanesTotal: Int = numPlanes
  override def dataType: DataType = LongType

  protected override def nullSafeEval(input: Any): Any =
    HyperplaneMath.bucket(
      input.asInstanceOf[ArrayData], planes, numPlanes, dim)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneMath.bucket($c, $planesRef, $numPlanes, $dim)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBucket = copy(child = newChild)
}

/** `graft_hyperplane_bands(vec, bandBits, numBands, dim)` → array<long>. */
case class HyperplaneBands(
    child: Expression, bandBits: Int, numBands: Int, dim: Int)
    extends HyperplaneExpr {
  override def name: String = "graft_hyperplane_bands"
  override def numPlanesTotal: Int = bandBits * numBands
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  protected override def nullSafeEval(input: Any): Any =
    HyperplaneMath.bands(
      input.asInstanceOf[ArrayData], planes, bandBits, numBands, dim)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneMath.bands($c, $planesRef, $bandBits, " +
        s"$numBands, $dim)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBands = copy(child = newChild)
}

/** `graft_hyperplane_probes(vec, numPlanes, dim, numProbes)` → array<long>. */
case class HyperplaneProbes(
    child: Expression, numPlanes: Int, dim: Int, numProbes: Int)
    extends HyperplaneExpr {
  override def name: String = "graft_hyperplane_probes"
  override def numPlanesTotal: Int = numPlanes
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  protected override def nullSafeEval(input: Any): Any =
    HyperplaneMath.probes(
      input.asInstanceOf[ArrayData], planes, numPlanes, dim, numProbes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneMath.probes($c, $planesRef, $numPlanes, " +
        s"$dim, $numProbes)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneProbes = copy(child = newChild)
}

/** `graft_ivf_cells(vec, numCentroids, dim, numProbes)` → array<long>. */
case class IvfCells(
    child: Expression, numCentroids: Int, dim: Int, numProbes: Int)
    extends HyperplaneExpr {
  override def name: String = "graft_ivf_cells"
  override def numPlanesTotal: Int = numCentroids
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected lazy val planes: Array[Double] =
    HyperplaneMath.flatMatrix("ivf", numCentroids, dim)

  protected override def nullSafeEval(input: Any): Any =
    HyperplaneMath.ivfCells(
      input.asInstanceOf[ArrayData], planes, numCentroids, dim, numProbes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("centroids", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneMath.ivfCells($c, $planesRef, " +
        s"$numCentroids, $dim, $numProbes)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): IvfCells = copy(child = newChild)
}

object HyperplaneExpressions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v, _) => v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** Name → builder, shared by [[register]] and
    * [[graft.GraftExtensions]].
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_hyperplane_bucket" -> (exprs => HyperplaneBucket(exprs.head,
      litInt(exprs(1), "graft_hyperplane_bucket", "numPlanes"),
      litInt(exprs(2), "graft_hyperplane_bucket", "dim"))),
    "graft_hyperplane_bands" -> (exprs => HyperplaneBands(exprs.head,
      litInt(exprs(1), "graft_hyperplane_bands", "bandBits"),
      litInt(exprs(2), "graft_hyperplane_bands", "numBands"),
      litInt(exprs(3), "graft_hyperplane_bands", "dim"))),
    "graft_ivf_cells" -> (exprs => IvfCells(exprs.head,
      litInt(exprs(1), "graft_ivf_cells", "numCentroids"),
      litInt(exprs(2), "graft_ivf_cells", "dim"),
      litInt(exprs(3), "graft_ivf_cells", "numProbes"))),
    "graft_hyperplane_probes" -> (exprs => HyperplaneProbes(exprs.head,
      litInt(exprs(1), "graft_hyperplane_probes", "numPlanes"),
      litInt(exprs(2), "graft_hyperplane_probes", "dim"),
      litInt(exprs(3), "graft_hyperplane_probes", "numProbes"))))

  /** Idempotently register `graft_hyperplane_bucket`, `_bands`,
    * `_probes`, `graft_ivf_cells` (no-op when already bound).
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      val registry = spark.sessionState.functionRegistry
      if (!registry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
