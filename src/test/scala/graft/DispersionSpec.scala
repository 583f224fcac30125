package graft

import graft.ext.TextStats

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.TextStats.termDispersion]]: Gries DP burstiness in exact
  * integer ppm, absent parts folded closed-form. Oracle twin: q315.
  */
class DispersionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(
      rows: Seq[(String, String)], minCount: Long = 1L, topK: Int = 50,
      parts: Int = 3) =
    TextStats.termDispersion(
        rows.toDF("source", "text").repartition(parts),
        textCol = "text", partCol = "source",
        minCount = minCount, topK = topK)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("proportional term scores 0; concentrated term scores its DP exactly") {
    // parts A and B both 4 tokens → e = (1/2, 1/2)
    // "ev" appears 1+1 (o = 1/2, 1/2) → DP = 0
    // "bb" appears 2+0 (o = 1, 0)     → DP = ½(|1−½| + |0−½|) = ½
    val rows = Seq(
      "A" -> "ev bb bb xx",
      "B" -> "ev yy zz ww")
    val out = run(rows)
    assert(out("ev") == ((2L, 2L, 0L)))
    assert(out("bb") == ((2L, 1L, 500000L)))
  }

  test("absent-part contribution matches the closed-form fold") {
    // parts: A 6 tokens, B 2, C 2 → e = (0.6, 0.2, 0.2)
    // "qq" only in B (both tokens): o = (0, 1, 0)
    // DP = ½(0.6 + 0.8 + 0.2) = 0.8
    val rows = Seq(
      "A" -> "a1 a2 a3 a4 a5 a6",
      "B" -> "qq qq",
      "C" -> "c1 c2")
    assert(run(rows)("qq") == ((2L, 1L, 800000L)))
  }

  test("minCount and topK cut deterministically with full tie-breaks") {
    val rows = Seq(
      "A" -> "t t t t u",
      "B" -> "t t t t v")
    val out = run(rows, minCount = 8L)
    assert(out.keySet == Set("t"), s"only t reaches count 8: $out")
    val top1 = run(rows, topK = 1)
    assert(top1.size == 1)
  }

  test("partition invariance") {
    val rows = (0 until 30).map(i =>
      s"S${i % 3}" -> s"w${i % 7} w${i % 5} w${i % 11} common")
    assert(run(rows, parts = 1) == run(rows, parts = 8))
  }
}
