package graft

import graft.ext.Similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Similarity.marginMiningPairs]]: ratio-margin aligned-pair
  * mining (Artetxe & Schwenk 2019). Oracle twin: q286.
  */
class MarginMiningSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("hub suppression: raw-cosine best loses to the margin best") {
    // hub target 100 is VERY close to every source (cos .958/.995/.995
    // — its top-2 neighborhood sum ~1.99 inflates its denominator);
    // target 101 is a source-0 specialist at cos .908. Raw cosine for
    // source 0 ranks the hub first (.958 > .908); the ratio margin
    // flips it (.908/(1.866+1.655)=.258 > .958/(1.866+1.99)=.248).
    val src = vecs(Seq(
      0L -> Array(1f, 0.30f, 0f, 0f),
      1L -> Array(1f, 0f, 0.1f, 0f),
      2L -> Array(1f, 0f, 0f, 0.1f)))
    val tgt = vecs(Seq(
      100L -> Array(1f, 0f, 0f, 0f),        // hub
      101L -> Array(0.75f, 0.66f, 0f, 0f),  // source-0 specialist
      102L -> Array(0f, 0f, 1f, 0.2f)))
    // pin the premise: raw cosine really does prefer the hub
    val rawBest = src.as("s").crossJoin(tgt.as("t"))
      .filter(col("s.vec_id") === 0)
      .withColumn("c", expr(
        """aggregate(zip_with(s.embedding, t.embedding, (a,b)->a*b),
          |0D, (acc,x)->acc+x) /
          |(sqrt(aggregate(s.embedding, 0D, (a,x)->a+x*x)) *
          | sqrt(aggregate(t.embedding, 0D, (a,x)->a+x*x)))""".stripMargin))
      .orderBy(col("c").desc).select(col("t.vec_id")).first().getLong(0)
    assert(rawBest == 100L, "premise: hub must win on raw cosine")
    val got = Similarity.marginMiningPairs(src, tgt, "vec_id",
      "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 101L)
  }

  test("mutual flag marks exactly the reciprocal best pairs") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val got = Similarity.marginMiningPairs(
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", k = 4).cache()
    try {
      // recompute backward-best independently: for each target, the
      // (src,tgt) row with max margin. mutual == fwd pick ∩ bwd pick.
      val fwd = got.select("src_id", "tgt_id", "mutual").collect()
      // independent backward-best: swap the roles — the margin table is
      // symmetric in (src,tgt) at the same k, so the swapped call's
      // forward best IS the original call's backward best.
      val swapped = Similarity.marginMiningPairs(
        emb.filter(col("vec_id") % 2 === 1),
        emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", k = 4)
        .select(col("tgt_id").as("s"), col("src_id").as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      fwd.foreach { r =>
        val claim = r.getBoolean(2)
        assert(claim == swapped.contains(r.getLong(0) -> r.getLong(1)),
          s"mutual flag mismatch for ${r.getLong(0)}->${r.getLong(1)}")
      }
      assert(fwd.exists(_.getBoolean(2)), "no mutual pair in the sample")
    } finally got.unpersist()
  }

  test("exactly one row per source with a defined margin") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") < 40)
    val got = Similarity.marginMiningPairs(
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", k = 3)
    assert(got.groupBy("src_id").count().filter(col("count") =!= 1)
      .isEmpty)
    assert(got.count() == 20)
  }

  test("mining is partition-invariant") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") < 50)
    def run(parts: Int) = Similarity.marginMiningPairs(
      emb.filter(col("vec_id") % 2 === 0).repartition(parts),
      emb.filter(col("vec_id") % 2 === 1).repartition(parts),
      "vec_id", "embedding", k = 4)
      .collect().map(_.toSeq).toSet
    assert(run(2) == run(13))
  }
}
