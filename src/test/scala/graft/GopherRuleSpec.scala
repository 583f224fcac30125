package graft

import graft.ext.TextStats

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextStats.gopherRuleCard]] / [[TextStats.gopherRuleReport]]:
  * Rae et al. 2021 App. A1.1 quality rules as independent booleans plus
  * marginal attribution. Oracle twins: q288 / q289.
  */
class GopherRuleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // a text passing every rule: 52 plain words incl. 3 stop words
  private val goodText =
    (Seq("the", "of", "and") ++ (1 to 49).map(i => s"word$i"))
      .mkString(" ")

  private def card(rows: (Long, String)*): Map[Long, Row] =
    TextStats.gopherRuleCard(rows.toSeq.toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def rule(r: Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))

  test("the good document passes all seven rules") {
    val r = card(1L -> goodText)(1L)
    assert(Seq("ok_word_count", "ok_mean_len", "ok_symbols",
      "ok_bullets", "ok_ellipsis", "ok_alpha", "ok_stops", "pass")
      .forall(rule(r, _)), r.toString)
  }

  test("each rule fails exactly on its own violation") {
    val rows = card(
      // 10 words < 50 (5-char fillers keep mean length legal)
      1L -> (Seq("the", "of") ++ (1 to 8).map(i => s"word$i"))
        .mkString(" "),
      // mean word length < 3: fifty-two 1-char words
      2L -> (Seq.fill(49)("a") ++ Seq("the", "of", "b")).mkString(" "),
      // symbols: 7 hashes in 59 words > 10%
      3L -> (goodText + " # # # # # # #"),
      // bullets: every line of 10 starts with '-'
      4L -> (1 to 10).map(i => s"- ${goodText}").mkString("\n"),
      // ellipsis line endings: 5 of 10 lines end with ...
      5L -> (1 to 10).map(i =>
        if (i <= 5) s"$goodText ..." else goodText).mkString("\n"),
      // alpha: 20 of 60 words are pure digits (<80% alphabetic);
      // 4-5 digit numbers keep the mean-length rule passing
      6L -> (Seq("the", "of") ++ (1 to 38).map(i => s"word$i") ++
        (1 to 20).map(i => s"${i}000")).mkString(" "),
      // stops: only one distinct stop word
      7L -> (Seq("the") ++ (1 to 51).map(i => s"word$i")).mkString(" "))
    val expect = Map(
      1L -> "ok_word_count", 2L -> "ok_mean_len", 3L -> "ok_symbols",
      4L -> "ok_bullets", 5L -> "ok_ellipsis", 6L -> "ok_alpha",
      7L -> "ok_stops")
    val ruleNames = expect.values.toSeq
    expect.foreach { case (id, failing) =>
      val r = rows(id)
      assert(!rule(r, failing), s"doc $id should fail $failing")
      assert(!rule(r, "pass"), s"doc $id should not pass")
      ruleNames.filter(_ != failing).foreach { other =>
        // docs 3/5 keep 52-word bodies per line so only their own rule
        // trips; every doc is engineered single-violation
        assert(rule(r, other), s"doc $id should pass $other: $r")
      }
    }
  }

  test("the ellipsis symbol rule counts non-overlapping triples") {
    // 8 "..."-runs in 52 words: 8*10 > 52 → fail; 5 runs: 50 ≤ 52 → pass
    val r = card(
      1L -> (goodText + " " + Seq.fill(8)("...").mkString(" ")),
      2L -> (goodText + " " + Seq.fill(5)("...").mkString(" ")))
    // note the "..." tokens are also words (60 words for doc 1)
    assert(!rule(r(1L), "ok_symbols"))
    assert(rule(r(2L), "ok_symbols"))
  }

  test("report: n_fail and marginal n_only_fail match hand counts") {
    val df = Seq(
      1L -> goodText,                                        // passes
      // fails ONLY ok_stops (52 words, no second stop word)
      2L -> (Seq("the") ++ (1 to 51).map(i => s"word$i")).mkString(" "),
      // fails ok_word_count AND ok_stops (5 words, one stop)
      3L -> "the word1 word2 word3 word4").toDF("doc_id", "text")
    val got = TextStats.gopherRuleReport(
      TextStats.gopherRuleCard(df, "doc_id", "text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("ok_stops") == ((2L, 1L)))      // docs 2,3 fail; only: 2
    assert(got("ok_word_count") == ((1L, 0L))) // doc 3 fails, not alone
    assert(got("ok_bullets") == ((0L, 0L)))
    assert(got.size == 7)
  }

  test("the report is batch-additive (the q301 stream-fold algebra)") {
    import org.apache.spark.sql.functions.sum
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def report(df: org.apache.spark.sql.DataFrame) =
      TextStats.gopherRuleReport(
        TextStats.gopherRuleCard(df, "doc_id", "text"))
    val whole = report(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val folded = report(docs.filter(col("doc_id") % 2 === 0))
      .unionByName(report(docs.filter(col("doc_id") % 2 === 1)))
      .groupBy("rule")
      .agg(sum("n_fail").as("n_fail"),
        sum("n_only_fail").as("n_only_fail"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(folded == whole)
  }

  test("the card is a pure projection — no shuffle in its plan") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextStats.gopherRuleCard(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }
}
