package graft

import graft.ext.TextStats

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.TextStats.perceptronTrain]]: batch-perceptron training of
  * the linear quality filter in pure integers. Oracle twin: q322.
  */
class PerceptronSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], iters: Int, parts: Int = 3) =
    TextStats.perceptronTrain(
        rows.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", iters = iters)
      .orderBy("iter")
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSeq

  // corpus: doc A = "aa"×30 (surprisal 1000 millibits → y = +1),
  // doc B = 60 unique tokens (6000 millibits → y = −1); features are
  // (bias, n_toks) only — stop/digit/upper densities all zero.
  private val docs = Seq(
    1L -> Seq.fill(30)("aa").mkString(" "),
    2L -> (0 until 60).map(i =>
      s"u${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" "))

  test("hand-computed 5-iteration trajectory") {
    assert(run(docs, iters = 5) == Seq(
      (1, 2L, 0L, -30L, 0L, 0L, 0L),
      (2, 1L, 1L, 0L, 0L, 0L, 0L),
      (3, 1L, 0L, -60L, 0L, 0L, 0L),
      (4, 1L, 1L, -30L, 0L, 0L, 0L),
      (5, 1L, 2L, 0L, 0L, 0L, 0L)))
  }

  test("identical features with opposite labels cancel exactly") {
    val tied = Seq(
      1L -> Seq.fill(30)("aa").mkString(" "), // +1, x1 = 30
      2L -> (0 until 30).map(i => // −1, x1 = 30 too
        s"u${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" "))
    val out = run(tied, iters = 3)
    assert(out.forall(r => r._2 == 2L && r._3 == 0L && r._4 == 0L),
      s"updates must cancel and never separate: $out")
  }

  test("partition invariance (integer sums are order-free)") {
    val wide = (0L until 20L).map(i =>
      i -> (if (i % 2 == 0) Seq.fill(25 + i.toInt)("aa").mkString(" ")
        else (0 until 25 + i.toInt).map(j =>
          s"v${('a' + (j / 26) % 26).toChar}${('a' + j % 26).toChar}x$i")
          .mkString(" ")))
    assert(run(wide, 4, parts = 1) == run(wide, 4, parts = 8))
  }
}
