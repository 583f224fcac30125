package graft

import graft.ext.Similarity

import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.kCenterGreedy]]: farthest-point coreset selection.
  * Oracle twin: q295.
  */
class KCenterSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // four well-separated blobs on the axes of R^4, 5 points each with a
  // small deterministic jitter in one off-axis coordinate
  private lazy val blobs = {
    val pts = for {
      b <- 0 until 4
      i <- 0 until 5
    } yield {
      val v = Array.fill(4)(0f)
      v(b) = 10f
      v((b + 1) % 4) = i * 0.1f
      ((b * 5 + i).toLong, v)
    }
    pts.toDF("vec_id", "embedding")
  }

  test("k picks cover all well-separated blobs, one each") {
    val got = Similarity.kCenterGreedy(blobs, "vec_id", "embedding", 4)
      .collect().map(_.getLong(1))
    assert(got.length == 4)
    assert(got.map(_ / 5).toSet == Set(0L, 1L, 2L, 3L),
      s"picks ${got.toSeq} must hit every blob once")
    assert(got.head == 0L, "seed is the lowest id")
  }

  test("the second pick is the brute-force farthest point from the seed") {
    val rows = blobs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // the operator's |a|²+|b|²−2a·b form with the same left-fold order —
    // the (x−y)² form can differ in the last ulp and flip the 1e-6 fix
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def d2(a: Array[Float], b: Array[Float]): Double =
      dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
    val far = rows.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (math.floor(d2(rows(0L), v) * 1e6 + 0.5), id) }
      .maxBy { case (d, id) => (d, -id) }
    val got = Similarity.kCenterGreedy(blobs, "vec_id", "embedding", 2)
      .collect().sortBy(_.getLong(0))
    assert(got(1).getLong(1) == far._2)
    assert(got(1).getLong(2) == far._1.toLong)
  }

  test("picked frontier distances are non-increasing over rounds") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
    val got = Similarity.kCenterGreedy(emb, "vec_id", "embedding", 6)
      .collect().sortBy(_.getLong(0)).map(_.getLong(2)).drop(1)
    assert(got.zip(got.tail).forall { case (a, b) => a >= b },
      got.toSeq.toString)
  }

  test("selection is partition-invariant") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter($"vec_id" < 120)
    def run(parts: Int) = Similarity.kCenterGreedy(
      emb.repartition(parts), "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSeq
    assert(run(2) == run(13))
  }
}
