package graft

import graft.ext.Similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.semanticDedup]] survivor-rule semantics, verified against
  * an independently-computed brute-force (crossJoin) formulation, plus the
  * threshold boundary cases and partition-layout determinism.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("kept flag matches brute-force all-pairs survivor rule") {
    graft.functions.HyperplaneExpressions.register(spark)
    graft.functions.VectorExpressions.register(spark)
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", 0.4)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
    // independent formulation: ALL pairs via crossJoin, then require same
    // cell + cosine ≥ τ + lower id
    val c = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      expr("element_at(graft_ivf_cells(embedding, 16, 64, 1), 1)").as("cell"))
    val dropped = c.as("a").crossJoin(c.select(col("id").as("id2"),
        col("v").as("v2"), col("cell").as("cell2")))
      .filter(col("id") < col("id2") && col("cell") === col("cell2"))
      .filter(expr("graft_dot(v, v2)") /
        (sqrt(expr("graft_dot(v, v)")) * sqrt(expr("graft_dot(v2, v2)")))
        >= 0.4)
      .select("id2").as[Long].collect().toSet
    assert(out.nonEmpty)
    out.foreach { case (id, kept) =>
      assert(kept == !dropped.contains(id), s"vec $id")
    }
    assert(dropped.nonEmpty, "fixture must contain same-cell near-dups")
  }

  test("threshold above 1 keeps everything") {
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", 1.5)
    assert(out.filter(!col("kept")).count() == 0)
  }

  test("threshold below -1 keeps exactly one survivor per cell") {
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", -1.5)
    val kept = out.filter(col("kept"))
      .groupBy("cell").count().select("count").as[Long].collect()
    assert(kept.forall(_ == 1L))
    // and each survivor is the cell's min id
    val minIds = out.groupBy("cell").agg(min("vec_id").as("m"))
      .select("m").as[Long].collect().toSet
    val keptIds = out.filter(col("kept")).select("vec_id")
      .as[Long].collect().toSet
    assert(keptIds == minIds)
  }

  test("result is identical under repartitioning") {
    val a = Similarity.semanticDedup(emb, "vec_id", "embedding", 0.4)
      .collect().toSet
    val b = Similarity.semanticDedup(emb.repartition(13),
      "vec_id", "embedding", 0.4).collect().toSet
    assert(a == b)
  }
}
