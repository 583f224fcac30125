package graft

import graft.ext.TextStats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured relative error of the HLL++ vocabulary estimate (q56) against
  * the exact distinct count, per language, on the gate corpora. HLL is
  * deterministic for fixed input, so these are hard bounds for this data —
  * the generic guarantee is the rsd parameter (0.02 ≈ 2% standard error).
  */
class VocabApproxSpec extends AnyFunSuite with SparkSpec {

  private def errors(dir: String): Seq[(String, Long, Long, Double)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(TextStats.tokensCol("text")).as("tok"))
      .groupBy("lang")
      .agg(countDistinct("tok").as("exact"),
        approx_count_distinct("tok", 0.02).as("approx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.abs(r.getLong(2) - r.getLong(1)).toDouble / r.getLong(1)))
      .toSeq

  test("HLL vocab estimate is within 5% of exact per language") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val errs = errors(dir)
      assert(errs.nonEmpty)
      errs.foreach { case (lang, exact, approx, err) =>
        info(f"$dir $lang exact=$exact approx=$approx err=${err * 100}%.2f%%")
        assert(err <= 0.05,
          s"$dir $lang: approx $approx vs exact $exact (err $err)")
      }
    }
  }
}
