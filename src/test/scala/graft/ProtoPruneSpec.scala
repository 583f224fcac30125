package graft

import graft.ext.Similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Similarity.prototypicalityPrune]]: Sorscher-style
  * keep-the-hard-examples pruning, stratified per Lloyd cell. Oracle
  * twin: q279.
  */
class ProtoPruneSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  private lazy val out = Similarity.prototypicalityPrune(
    emb, "vec_id", "embedding", keepHardestPct = 30)

  test("per-cell quota is exactly the ceiling of 30%") {
    val got = out.groupBy("cell")
      .agg(count(lit(1)).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("k"))
      .withColumn("want", expr("(n * 30 + 99) div 100"))
    assert(got.filter(col("k") =!= col("want")).count() == 0)
    // and nothing is emptied or fully kept (30% is strictly partial for
    // any cell with >= 2 members)
    assert(got.filter(col("n") >= 2 && col("k") === col("n")).count() == 0)
  }

  test("kept rows are the least prototypical of their cell") {
    val keptMax = out.filter(col("kept"))
      .groupBy("cell").agg(max("proto_cos").as("kmax"))
    val prunedMin = out.filter(!col("kept"))
      .groupBy("cell").agg(min("proto_cos").as("pmin"))
    val bad = keptMax.join(prunedMin, "cell")
      .filter(col("kmax") > col("pmin"))
    assert(bad.count() == 0,
      "a kept row was MORE prototypical than a pruned row in its cell")
  }

  test("keepHardestPct = 100 keeps everything") {
    val all = Similarity.prototypicalityPrune(
      emb, "vec_id", "embedding", keepHardestPct = 100)
    assert(all.filter(!col("kept")).count() == 0)
    assert(all.count() == emb.count())
  }

  test("prune decisions are partition-invariant") {
    def run(parts: Int) = Similarity.prototypicalityPrune(
      emb.repartition(parts), "vec_id", "embedding", keepHardestPct = 30)
      .collect().map(_.toSeq).toSet
    assert(run(3) == run(17))
  }
}
