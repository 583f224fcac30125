package graft

import graft.ext.Similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Similarity.truncationRecallAudit]]: prefix-dimension
  * retrieval recall vs full-dimension truth. Oracle twin: q280.
  */
class TruncationRecallSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("the full-dimension rung is the 1.0 sanity row") {
    val got = Similarity.truncationRecallAudit(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      k = 3, prefixes = Seq(16, 64))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    assert(got(64L) == ((30L, 1000000L)))
    assert(got(16L)._1 == 30L)
  }

  test("energy concentrated in the prefix makes prefix recall perfect") {
    // vectors whose components beyond dim 8 are all zero: prefix-8
    // cosine equals full cosine, so the 8 rung must recall everything
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(d =>
        if (d < 8) rnd.nextFloat() * 2f - 1f else 0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.truncationRecallAudit(
      df, df.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, prefixes = Seq(8, 64))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(8L) == 1000000L)
    assert(got(64L) == 1000000L)
  }

  test("audit is partition-invariant") {
    def run(parts: Int) = Similarity.truncationRecallAudit(
      emb.repartition(parts), emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 3, prefixes = Seq(8, 32, 64))
      .collect().map(_.toSeq).toSet
    assert(run(2) == run(11))
  }
}
