package graft

import graft.ext.TextStats

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.TextStats.calibrationBins]]: ECE reliability binning of the
  * q233 classifier against the q232 surprisal outcome. Oracle twin: q311.
  */
class CalibrationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], parts: Int = 3) =
    TextStats.calibrationBins(
        rows.toDF("doc_id", "text").repartition(parts), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  // margin for an all-lowercase, stopword-free doc = -100000 + 900·n_toks
  private def rep(w: String, n: Int): String = Seq.fill(n)(w).mkString(" ")

  test("bin algebra: mixed-outcome bin reports the exact ECE numerator") {
    // both docs: margin 8000 → conf_bp 100 → bin 0. Doc 1's token repeats
    // (low surprisal → pos); doc 2's tokens are all unique (7 bits → neg).
    val out = run(Seq(
      1L -> rep("aa", 120),
      2L -> (0 until 120).map(i =>
        s"u${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")))
    assert(out == Map(0L -> ((2L, 1L, 100L, 5000L, 9800L))))
  }

  test("stopword-saturated doc clamps to conf 10000 and lands in bin 9") {
    val out = run(Seq(
      1L -> rep("the", 120), // margin 4,008,000 → conf 10000
      2L -> rep("aa", 120))) // margin 8000 → bin 0
    assert(out.keySet == Set(0L, 9L))
    assert(out(9L)._3 == 10000L, "avg_conf_bp must clamp at 10000")
  }

  test("negative margins clamp to conf 0 (div-vs-floor safe)") {
    // 5 tokens → margin -95500; trunc/floor disagree below zero but both
    // clamp to 0 — the discipline the operator relies on
    val out = run(Seq(1L -> rep("zz", 5), 2L -> rep("zz", 5)))
    assert(out.keySet == Set(0L))
    assert(out(0L)._3 == 0L)
  }

  test("partition invariance") {
    val docs = (0L until 20L).map(i => i -> rep(s"w$i", 50 + i.toInt * 30))
    assert(run(docs, parts = 1) == run(docs, parts = 8))
  }
}
