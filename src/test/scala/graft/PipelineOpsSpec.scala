package graft

import graft.ext.{Similarity, TextStats}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Training-pipeline utility operators: int8 quantization and
  * deterministic stratified sampling.
  */
class PipelineOpsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("int8 quantization: values in [-127,127], dequant error ≤ scale/2, zeros edge") {
    val rnd = new Random(37)
    val rows = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))) :+
      (999L, Array.fill(64)(0f)) // all-zero vector
    val df = rows.toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1).toArray, r.getDouble(2)))).toMap
    rows.foreach { case (id, v) =>
      val (qv, scale) = (q(id)._1, q(id)._2)
      assert(qv.length == 64)
      assert(qv.forall(x => x >= -127 && x <= 127))
      if (id == 999L) {
        assert(qv.forall(_ == 0) && scale == 0.0)
      } else {
        // dequantization error bounded by half a quantization step
        // (+ the 9dp rounding of the carried scale)
        v.zip(qv).foreach { case (orig, quant) =>
          assert(math.abs(orig - quant * scale) <= scale / 2 + 1e-6,
            s"id=$id orig=$orig quant=$quant scale=$scale")
        }
      }
    }
  }

  test("redact replaces emails and URLs with placeholders and counts them") {
    val df = Seq(
      (1L, "contact bob.smith+x@example.co.uk or see https://a.io/b?q=1 now"),
      (2L, "no pii here at all"),
      (3L, "two mails: a@b.io c@d.org and http://plain.example")
    ).toDF("doc_id", "text")
    val r = TextStats.redact(df, "text")
      .select("doc_id", "n_emails", "n_urls", "redacted")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((1L, 1L, "contact <EMAIL> or see <URL> now")))
    assert(r(2L) == ((0L, 0L, "no pii here at all")))
    assert(r(3L) == ((2L, 1L, "two mails: <EMAIL> <EMAIL> and <URL>")))
  }

  test("stratified sample: deterministic, per-stratum rates, unknown strata dropped") {
    val rnd = new Random(41)
    val langs = Seq("en", "es", "de")
    val docs = (0 until 6000).map(i => (i.toLong, langs(rnd.nextInt(3))))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 0.3, "es" -> 0.1)
    def run(): Map[String, Long] =
      TextStats.stratifiedSample(docs, "doc_id", "lang", rates)
        .groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = run()
    assert(run() == counts) // identical on re-run: no RNG state
    assert(!counts.contains("de")) // absent stratum → rate 0
    val n = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform; 6000 docs / 3 langs → ±5 percentage points
    assert(math.abs(counts("en").toDouble / n("en") - 0.3) < 0.05)
    assert(math.abs(counts("es").toDouble / n("es") - 0.1) < 0.05)
    // the kept SET is stable, not just the counts: ids survive re-runs
    val ids1 = TextStats.stratifiedSample(docs, "doc_id", "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextStats.stratifiedSample(docs, "doc_id", "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // a different salt draws a different (but equally deterministic) mix
    val other = TextStats.stratifiedSample(docs, "doc_id", "lang", rates,
      salt = "mix2").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != ids1)
  }
}
