package graft

import graft.ext.{Asset, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("mapPartitions decode is deterministic and schema-stable") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")
    val decoded = Multimodal.decode(
      Multimodal.assetsFromText(docs, "doc_id", "text"))
    val rows = decoded.collect().sortBy(_.asset_id)
    assert(rows.map(_.n_bytes).toSeq == Seq(11L, 5L))
    assert(rows.forall(r => r.width >= 1 && r.width <= 64))
    assert(rows.forall(_.features.length == 16))
    // deterministic: re-running decode yields identical features
    val again = Multimodal.decode(
      Multimodal.assetsFromText(docs, "doc_id", "text"))
      .collect().sortBy(_.asset_id)
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
    // histogram is a probability mass (sums to ~1)
    assert(rows.forall(r => math.abs(r.features.sum - 1f) < 1e-3))
  }

  test("feature table feeds the ANN operator shape") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val ft = Multimodal.featureTable(spark,
      Multimodal.decode(Multimodal.assetsFromText(docs, "doc_id", "text")))
    assert(ft.columns.toSeq == Seq("vec_id", "embedding"))
    val topk = graft.ext.Similarity.bruteForceTopK(
      ft, ft.filter($"vec_id" === 1L), "vec_id", "embedding", k = 1)
    val r = topk.collect()
    assert(r.length == 1 && r.head.getAs[Long]("neighbor_id") == 2L)
  }
}
