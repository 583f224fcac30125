package graft

import graft.ext.Dedup
import graft.functions.VectorExpressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Bit-parity of the fused per-doc signature expressions (graft_minhash /
  * graft_simhash) against the r3 wide-aggregate reference formulations, on
  * random corpora and the real documents table.
  */
class SignatureParitySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def hashSets(df: org.apache.spark.sql.DataFrame) =
    Dedup.withShingleHashSets(df, "doc_id", "text", k = 3)

  private def randomDocs(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "data", "spark", "train", "dedup", "123", "x")
    (0 until n).map(i => (i.toLong,
      Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("fused minhash equals the 128-lane aggregate signature") {
    VectorExpressions.register(spark)
    val sets = hashSets(randomDocs(200, 41)).cache()
    val fused = sets.select(col("doc_id"),
      expr("graft_minhash(hsh, 128)").as("sig"))
    val agg = Dedup.minhashSignatureAgg(sets, 128)
    val bad = fused.as("f").join(agg.as("a"), "doc_id")
      .filter(col("f.sig") =!= col("a.sig")).count()
    val n = sets.count()
    assert(fused.count() == n && agg.count() == n && bad == 0L)
    sets.unpersist()
    ()
  }

  test("fused simhash equals the 16-vote aggregate signature") {
    VectorExpressions.register(spark)
    val sets = hashSets(randomDocs(200, 43)).cache()
    val fused = sets.select(col("doc_id"),
      expr("graft_simhash(hsh)").as("sig"))
    val agg = Dedup.simhashSignatureAgg(sets)
    val bad = fused.as("f").join(agg.as("a"), "doc_id")
      .filter(col("f.sig") =!= col("a.sig")).count()
    assert(bad == 0L)
    sets.unpersist()
    ()
  }

  test("parity holds on the real documents corpus") {
    VectorExpressions.register(spark)
    val sets = hashSets(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))).cache()
    val badMin = sets.select(col("doc_id"),
      expr("graft_minhash(hsh, 128)").as("sig"))
      .join(Dedup.minhashSignatureAgg(sets, 128)
        .withColumnRenamed("sig", "ref"), "doc_id")
      .filter(col("sig") =!= col("ref")).count()
    val badSim = sets.select(col("doc_id"),
      expr("graft_simhash(hsh)").as("sig"))
      .join(Dedup.simhashSignatureAgg(sets)
        .withColumnRenamed("sig", "ref"), "doc_id")
      .filter(col("sig") =!= col("ref")).count()
    assert(badMin == 0L && badSim == 0L)
    sets.unpersist()
    ()
  }

  test("empty hash set yields null signatures") {
    VectorExpressions.register(spark)
    val r = Seq(Array.empty[Long]).toDF("hsh")
      .select(expr("graft_minhash(hsh, 128)"),
        expr("graft_simhash(hsh)")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
