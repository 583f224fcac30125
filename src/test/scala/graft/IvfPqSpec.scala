package graft

import graft.ext.Similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Similarity.ivfPqTopK]]: the FAISS IVFPQ composition —
  * Lloyd cells prune the scan, residual PQ codes compress it, ADC ranks
  * candidates, exact cosine re-ranks. Deterministic end to end, so recall
  * and exactness are hard assertions. Oracle twin: q274.
  */
class IvfPqSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF-PQ recalls real neighbors and reports exact cosines") {
    val queries = emb.filter(col("vec_id") < 20)
    val truth = pairs(Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", k = 3))
    val got = Similarity.ivfPqTopK(
      emb, queries, "vec_id", "embedding", k = 3, candidates = 50)
    val recall = (truth & pairs(got)).size.toDouble / truth.size
    info(s"ivfpq recall@3 probes=2 candidates=50 = $recall")
    // the IVF probe bounds recall by cell coverage; a broken residual
    // encode / ADC sum / probe collapses this toward candidates/n ≈ 0.1
    assert(recall >= 0.3, s"IVF-PQ recall collapsed: $recall")
    // reported cosines are EXACT (re-rank runs on float vectors)
    val bf = Similarity.bruteForceTopK(
        emb, queries, "vec_id", "embedding", k = 499)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val joined = got
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim").as("ivfpq_cos"))
      .join(bf, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("ivfpq_cos") =!= col("cos_sim")).count() == 0)
    assert(joined.count() == pairs(got).size.toLong,
      "every reported pair must exist in the exhaustive ranking")
  }

  test("candidates never come from unprobed cells") {
    // with numProbes = numCentroids every cell is probed, so widening
    // probes can only ADD candidates; the 1-probe answer must be a
    // subset property on the ADC candidate STAGE — observable at the
    // final top-k as: all 1-probe neighbors share a probed cell with
    // their query. Verify via the assignment directly.
    val queries = emb.filter(col("vec_id") < 10)
    val got = Similarity.ivfPqTopK(
      emb, queries, "vec_id", "embedding", k = 3, numProbes = 1,
      candidates = 20)
    // recompute the same frozen quantizer assignment
    val cent = graft.ext.Similarity.lloydCentroids(
      emb, "vec_id", "embedding", 16, 64)
    val homes = Similarity.assignCells(
        emb, "vec_id", "embedding", cent, probes = 1)
      .select(col("vec_id"), col("__cell").as("cell"))
    val qh = homes.withColumnsRenamed(
      Map("vec_id" -> "query_id", "cell" -> "qcell"))
    val nh = homes.withColumnsRenamed(
      Map("vec_id" -> "neighbor_id", "cell" -> "ncell"))
    val bad = got.join(qh, "query_id").join(nh, "neighbor_id")
      .filter(col("qcell") =!= col("ncell"))
    assert(bad.count() == 0,
      "a 1-probe candidate escaped its query's home cell")
  }

  test("retrieval is deterministic across partitionings") {
    val queries = emb.filter(col("vec_id") < 5)
    val a = Similarity.ivfPqTopK(
      emb.repartition(3), queries, "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    val b = Similarity.ivfPqTopK(
      emb.repartition(17), queries, "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("residual codebook namespace is distinct from plain PQ") {
    val plain = Similarity.pqCodebook(8, 16, 8)
    val resid = Similarity.pqCodebook(8, 16, 8, tag = "ivfpq")
    assert(plain != resid)
    assert(resid.size == 8 * 16)
  }
}
