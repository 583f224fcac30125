package graft

import graft.functions.HilbertIndexExpr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[HilbertIndexExpr]]: parity of the signed textbook walk against the
  * normalized (non-negative, div/mod) variant the SQL oracle folds,
  * injectivity, and the codegen'd expression against the static method.
  */
class HilbertSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** The normalized walk exactly as the q228 DuckDB oracle folds it. */
  private def xy2dNorm(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = HilbertIndexExpr.Side >> 1
    while (s > 0) {
      val rx = (x / s) % 2
      val ry = (y / s) % 2
      d += s * s * ((3 * rx) ^ ry)
      val lowx = x % s; val lowy = y % s
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - lowy; y = s - 1 - lowx }
        else { x = lowy; y = lowx }
      } else { x = lowx; y = lowy }
      s >>= 1
    }
    d
  }

  test("signed walk == normalized oracle walk on random points") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20000) {
      val x = rnd.nextLong().abs % HilbertIndexExpr.Side
      val y = rnd.nextLong().abs % HilbertIndexExpr.Side
      assert(HilbertIndexExpr.xy2d(x, y) == xy2dNorm(x, y), s"($x, $y)")
    }
  }

  test("index is injective on a dense subgrid") {
    val ds = (for { x <- 0 until 128; y <- 0 until 128 }
      yield HilbertIndexExpr.xy2d(x.toLong, y.toLong)).toSet
    assert(ds.size == 128 * 128)
  }

  test("hilbert buckets bound both coordinates (the locality claim)") {
    // points on a 256-step lattice: every 2^24-index bucket with >= 2
    // points must span at most a quarter of the plane in EACH dimension —
    // a Z-order bucket crossing the main diagonal jump spans the whole x
    // range; the Hilbert curve's continuity forbids that
    val pts = for { x <- 0 until 65536 by 1024; y <- 0 until 65536 by 1024 }
      yield (x.toLong, y.toLong, HilbertIndexExpr.xy2d(x.toLong, y.toLong))
    val bad = pts.groupBy(_._3 >> 24).filter(_._2.size >= 2).filter {
      case (_, ps) =>
        val xs = ps.map(_._1); val ys = ps.map(_._2)
        (xs.max - xs.min) > 32768 || (ys.max - ys.min) > 32768
    }
    assert(bad.isEmpty, s"buckets spanning > half the plane: ${bad.keys}")
  }

  test("codegen'd expression matches the static method") {
    graft.functions.VectorExpressions.register(spark)
    val rows = (0 until 500)
      .map(i => (i * 131L % 65536, i * 977L % 65536)).toDF("x", "y")
    val got = rows.withColumn("h", expr("graft_hilbert(x, y)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, h) =>
      assert(h == HilbertIndexExpr.xy2d(x, y))
    }
  }
}
