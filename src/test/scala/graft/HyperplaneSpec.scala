package graft

import graft.ext.Similarity
import graft.functions.HyperplaneExpressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Parity + behavior specs for the fused hyperplane expressions, and the
  * multi-probe / banded-LSH recall story on a planted-neighbor fixture
  * (random corpora are LSH-hostile: nearest neighbors at cosine ~0.5 spread
  * evenly over buckets, so recall claims are only meaningful with planted
  * structure — mirroring real near-dup corpora).
  */
class HyperplaneSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val Dim = 64
  private val NumPlanes = 8

  /** Deterministic md5-derived component in [-1, 1] — same construction as
    * Similarity.planeComponent, namespaced by tag (fixture data must not
    * collide with the plane family).
    */
  private def comp(tag: String, i: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$tag$i:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
  }

  private def vec(tag: String, i: Int): Array[Float] =
    Array.tabulate(Dim)(d => comp(tag, i, d).toFloat)

  test("fused hyperplane bucket is bit-identical to the composed HOF form") {
    HyperplaneExpressions.register(spark)
    val rnd = new Random(13)
    val df = (0 until 300).map { i =>
      (i.toLong, Array.fill(Dim)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "v")
    val bad = df.select(
      Similarity.hyperplaneBucket("v", NumPlanes, Dim).as("fused"),
      Similarity.hyperplaneBucketComposed("v", NumPlanes, Dim).as("composed"))
      .filter(col("fused") =!= col("composed")).count()
    assert(bad == 0L)
  }

  test("bands match a driver-side left-fold replay; probes = base + lowest-margin flips") {
    HyperplaneExpressions.register(spark)
    val bandBits = 4
    val numBands = 12
    val planes = Similarity.planes(bandBits * numBands, Dim)
    val rnd = new Random(17)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(Dim)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "v")

    def dot(v: Array[Float], plane: Seq[Double]): Double = {
      var acc = 0.0
      var d = 0
      while (d < Dim) { acc += v(d).toDouble * plane(d); d += 1 }
      acc
    }

    val gotBands = df.select(col("id"),
      expr(s"graft_hyperplane_bands(v, $bandBits, $numBands, $Dim)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, v) =>
      val expected = (0 until numBands).map { b =>
        (0 until bandBits).foldLeft(0L) { (sig, j) =>
          if (dot(v, planes(b * bandBits + j)) > 0) sig | (1L << j) else sig
        }
      }
      assert(gotBands(id) == expected, s"band mismatch for id=$id")
    }

    val gotProbes = df.select(col("id"),
      expr(s"graft_hyperplane_probes(v, $NumPlanes, $Dim, 4)").as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, v) =>
      val dots = (0 until NumPlanes).map(p =>
        dot(v, Similarity.planes(NumPlanes, Dim)(p)))
      val base = dots.zipWithIndex.foldLeft(0L) { case (acc, (d, p)) =>
        if (d > 0) acc | (1L << p) else acc
      }
      val order = (0 until NumPlanes).sortBy(p => (math.abs(dots(p)), p))
      val expected = Seq(base, base ^ (1L << order(0)),
        base ^ (1L << order(1)), base ^ (1L << order(2)))
      assert(gotProbes(id) == expected, s"probe mismatch for id=$id")
      assert(gotProbes(id).distinct.size == 4) // probes never collide
    }
  }

  test("dim mismatch fails per-row inside the plan (no silent bucket-0 collapse)") {
    HyperplaneExpressions.register(spark)
    val df = Seq((1L, Array.fill(32)(0.5f))).toDF("id", "v")
    val e = intercept[Exception] {
      df.select(expr(s"graft_hyperplane_bucket(v, $NumPlanes, $Dim)")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("expected 64-element vector")))
  }

  test("null element zeroes all buckets (HOF parity); null array is null") {
    HyperplaneExpressions.register(spark)
    val df = Seq(
      (1L, Array[java.lang.Float](0.5f, null) ++
        Array.fill[java.lang.Float](62)(0.25f)),
      (2L, null)
    ).toDF("id", "v")
    val got = df.select(col("id"),
      expr(s"graft_hyperplane_bucket(v, $NumPlanes, $Dim)").as("b"),
      Similarity.hyperplaneBucketComposed("v", NumPlanes, Dim).as("hof"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).contains(0L)) // any null element → bucket 0, like the HOF
    assert(got(2L).isEmpty) // null array → null (drops from candidate joins)
  }

  /** Planted-neighbor fixture: 100 queries, each with one high-cosine
    * (≈0.95–0.98) planted neighbor in a 500-vector corpus of otherwise
    * random (max cos ≈ 0.62) vectors. Brute-force top-1 is always the
    * planted neighbor, so recall@1 vs brute force = the fraction of
    * queries whose planted neighbor survives bucketing.
    */
  private lazy val fixture: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) = {
    val planted = (0 until 100).map { i =>
      val q = vec("fixq", i)
      val n = vec("fixn", i)
      (i.toLong, Array.tabulate(Dim)(d => q(d) + 0.25f * n(d)))
    }
    val distractors = (0 until 400).map(j => (1000L + j, vec("fixd", j)))
    val corpus = (planted ++ distractors).toDF("vec_id", "embedding")
    val queries = (0 until 100).map(i => (5000L + i, vec("fixq", i)))
      .toDF("vec_id", "embedding")
    (corpus, queries)
  }

  private def recallAt1(numProbes: Int): Double = {
    val (corpus, queries) = fixture
    val top = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
      k = 1, numPlanes = NumPlanes, dim = Dim, numProbes = numProbes)
    val hits = top.filter(col("query_id") - 5000L === col("neighbor_id"))
      .count()
    hits / 100.0
  }

  test("multi-probe recovers recall single-probe loses (planted neighbors)") {
    val r1 = recallAt1(1)
    val r2 = recallAt1(2)
    val r4 = recallAt1(4)
    // deterministic fixture + md5 planes → these are exact, not flaky;
    // measured 0.52 / 0.70 / 0.82 — asserted with slack for refactors that
    // legitimately perturb float rounding
    assert(r1 <= 0.65, s"single-probe recall unexpectedly high: $r1")
    assert(r2 > r1, s"2-probe recall $r2 did not improve on 1-probe $r1")
    assert(r4 > r2, s"4-probe recall $r4 did not improve on 2-probe $r2")
    assert(r4 >= 0.75, s"4-probe recall too low: $r4")
  }

  test("IVF cells match a driver-side (-dot, index) sort replay") {
    HyperplaneExpressions.register(spark)
    val cents = Similarity.centroids(16, Dim)
    val rnd = new Random(31)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.fill(Dim)(rnd.nextFloat() * 2 - 1))
    }
    val got = rows.toDF("id", "v")
      .select(col("id"), expr(s"graft_ivf_cells(v, 16, $Dim, 16)").as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, v) =>
      val dots = cents.map { cent =>
        var acc = 0.0
        var d = 0
        while (d < Dim) { acc += v(d).toDouble * cent(d); d += 1 }
        acc
      }
      val expected = (0 until 16).sortBy(c => (-dots(c), c)).map(_.toLong)
      assert(got(id) == expected, s"cell order mismatch for id=$id")
    }
  }

  test("IVF top-k recall beats single-cell on planted neighbors; probes monotone") {
    val (corpus, queries) = fixture
    def recall(numProbes: Int): Double = {
      val top = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
        k = 1, numCentroids = 16, dim = Dim, numProbes = numProbes)
      top.filter(col("query_id") - 5000L === col("neighbor_id"))
        .count() / 100.0
    }
    val r1 = recall(1)
    val r2 = recall(2)
    val r4 = recall(4)
    assert(r2 >= r1 && r4 >= r2, s"probe recall not monotone: $r1 $r2 $r4")
    assert(r2 >= 0.8, s"2-probe IVF recall too low: $r2")
  }

  test("banded near-dup at high threshold equals the exact form (the efficient regime)") {
    val (corpus, queries) = fixture
    val all = corpus.unionByName(queries)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineNearDupPairs(
      all, "vec_id", "embedding", threshold = 0.9))
    val banded = pairs(Similarity.cosineNearDupPairsBucketed(
      all, "vec_id", "embedding", threshold = 0.9,
      bandBits = 8, numBands = 16, dim = Dim))
    // at cos ≥ 0.9, 16 bands × 8 bits: per-band catch ≈ p^8 (p ≈ 0.9),
    // miss ≈ (1 - p^8)^16 ≈ 1e-4 per pair — and deterministically zero here
    assert(banded == exact)
    assert(exact.size == 100) // exactly the planted (query, neighbor) pairs
    assert(exact.forall { case (a, b) => b - 5000L == a })
  }
}
