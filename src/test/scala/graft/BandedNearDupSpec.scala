package graft

import graft.ext.Similarity
import graft.functions.{HyperplaneExpressions, VectorExpressions}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The high-threshold banding regime (cosine ≥ 0.9) on a planted-dup
  * fixture: the test corpus's real pairs top out at ~0.6 cosine (q53's
  * docstring), so the regime the banded operator was built for — few
  * candidates, full recall — is pinned here instead of a vacuous oracle
  * row. Deterministic: seeded fixture + md5-derived planes.
  */
class BandedNearDupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val Dim = 64
  private val N = 400
  private val Planted = 20

  /** N random unit-ish vectors plus `Planted` jittered near-copies whose
    * cosine with their base is ≥ ~0.95.
    */
  private lazy val corpus = {
    val rnd = new Random(47)
    val base = (0 until N).map { i =>
      (i.toLong, Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val dups = (0 until Planted).map { j =>
      val (_, v) = base(j)
      val noisy = v.map(x => x + (rnd.nextDouble() * 0.06 - 0.03).toFloat)
      ((N + j).toLong, noisy)
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("banded 8x16 catches every planted >=0.9 pair with few candidates") {
    VectorExpressions.register(spark)
    HyperplaneExpressions.register(spark)
    val exact = Similarity.cosineNearDupPairs(
      corpus, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // sanity: the fixture actually planted high-cosine pairs
    assert(exact.size >= Planted)

    val banded = Similarity.cosineNearDupPairsBucketed(
      corpus, "vec_id", "embedding", threshold = 0.9,
      bandBits = 8, numBands = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(banded == exact) // full recall, exact precision

    // candidate join touches a small fraction of the n² pair space
    val sigs = corpus.select(col("vec_id").as("id"),
      posexplode(expr(s"graft_hyperplane_bands(embedding, 8, 16, $Dim)"))
        .as(Seq("band", "sig")))
    val nCand = sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select("x.id", "y.id").distinct().count()
    val total = (N + Planted).toLong * (N + Planted - 1) / 2
    assert(nCand < total / 10,
      s"candidates $nCand not < 10% of $total pairs")
  }
}
