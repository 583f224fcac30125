package graft

import graft.ext.Similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Similarity.pqTopK]]: product-quantization ADC retrieval.
  * Deterministic end to end (fixed corpus, md5 codebook, fixed-point
  * distances), so recall and exactness are hard assertions. Oracle twin:
  * q180.
  */
class PqSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ADC candidates recall real neighbors on the gate corpus") {
    val queries = emb.filter(col("vec_id") < 20)
    val truth = pairs(Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k = 3))
    val pq = pairs(Similarity.pqTopK(
      emb, queries, "vec_id", "embedding", k = 3, candidates = 50))
    val recall = (truth & pq).size.toDouble / truth.size
    info(s"recall@3 candidates=50 trained=$recall")
    // measured 0.38 on the fixed corpus: a refactor that breaks encode,
    // training, or the ADC sum collapses this toward the random baseline
    // (candidates/n ≈ 0.1)
    assert(recall >= 0.3, s"PQ recall collapsed: $recall")
    // training matters most where the budget is tight: at 10 candidates
    // the trained codebook retrieves ~2× the untrained one (0.12 vs 0.07
    // measured) — assert the gap where it is robust
    val u10 = pairs(Similarity.pqTopK(
      emb, queries, "vec_id", "embedding", k = 3, candidates = 10,
      train = false))
    val t10 = pairs(Similarity.pqTopK(
      emb, queries, "vec_id", "embedding", k = 3, candidates = 10))
    val (ur, tr) = ((truth & u10).size.toDouble / truth.size,
      (truth & t10).size.toDouble / truth.size)
    info(s"recall@3 candidates=10: untrained=$ur trained=$tr")
    assert(tr > ur, s"training did not improve tight-budget recall: $tr <= $ur")
    // every reported cosine is EXACT (re-rank runs on float vectors):
    // reported pairs must score identically to brute force on those pairs
    val bf = Similarity.bruteForceTopK(
        emb, queries, "vec_id", "embedding", k = 499)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val joined = Similarity.pqTopK(
        emb, queries, "vec_id", "embedding", k = 3, candidates = 50)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim").as("pq_cos"))
      .join(bf, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("pq_cos") =!= col("cos_sim")).count() == 0)
  }

  test("retrieval is deterministic across partitionings") {
    val queries = emb.filter(col("vec_id") < 5)
    val a = Similarity.pqTopK(
      emb.repartition(3), queries, "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    val b = Similarity.pqTopK(
      emb.repartition(17), queries, "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("rerank curve rows equal independent single-budget runs") {
    val queries = emb.filter(col("vec_id") < 20)
    val truth = pairs(Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k = 3))
    val curve = Similarity.pqRerankCurve(
      emb, queries, "vec_id", "embedding", k = 3,
      budgets = Seq(10, 50))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    for (b <- Seq(10, 50)) {
      val single = pairs(Similarity.pqTopK(
        emb, queries, "vec_id", "embedding", k = 3, candidates = b))
      assert(curve(b.toLong) == ((single.size.toLong,
        (truth & single).size.toLong)),
        s"curve row at budget $b diverges from the single-budget run")
    }
    // nested budgets: recall can only grow with the candidate budget
    assert(curve(50L)._2 >= curve(10L)._2)
  }

  test("codebook is the declared shape with bounded components") {
    val cb = Similarity.pqCodebook(8, 16, 8)
    assert(cb.size == 8 * 16)
    assert(cb.forall { case (_, _, v) =>
      v.size == 8 && v.forall(x => x >= -1.0 && x <= 1.0)
    })
    // distinct namespaces: sub-space 0 and 1 differ
    assert(cb.filter(_._1 == 0).map(_._3) != cb.filter(_._1 == 1).map(_._3))
  }
}
