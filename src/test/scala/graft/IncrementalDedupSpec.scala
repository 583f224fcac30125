package graft

import graft.ext.Dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** [[Dedup.minhashNearDupPairsIncremental]] — the append-only maintenance
  * contract: the incremental pass over (corpus, incoming) must return
  * EXACTLY the full self-join's pair set restricted to pairs touching an
  * incoming doc — nothing extra (no corpus × corpus pair may leak in) and
  * nothing missing (incoming × incoming pairs count too, not just the
  * cross-boundary ones).
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** Corpus with planted near-dups on BOTH sides of the split: template A
    * duplicated corpus↔incoming, template B duplicated incoming↔incoming,
    * template C duplicated corpus↔corpus (must NOT appear in the result).
    */
  private lazy val docs = {
    val rnd = new Random(41)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    def soup(n: Int): String = Seq.fill(n)(words(rnd.nextInt(words.size)))
      .mkString(" ")
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = "pack my box with five dozen liquor jugs from the old cellar"
    val c = "how vexingly quick daft zebras jump over the sleepy fence line"
    val rows = Seq(
      (3L, s"$a tail three"), (7L, s"$a tail seven"), // corpus ↔ incoming
      (14L, s"$b tail one"), (21L, s"$b tail two"), // incoming ↔ incoming
      (5L, s"$c tail five"), (10L, s"$c tail ten") // corpus ↔ corpus
    ) ++ (30 until 80).map(i => (i.toLong, soup(25 + rnd.nextInt(20))))
    rows.toDF("doc_id", "text")
  }

  private def isIncoming(id: Long): Boolean = id % 7 == 0

  test("incremental pairs ≡ full pairs filtered to incoming membership") {
    val full = Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", thresholdNum = 5, thresholdDen = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = full.filter { case (a, b) => isIncoming(a) || isIncoming(b) }
    val got = Dedup.minhashNearDupPairsIncremental(
      corpus = docs.filter(col("doc_id") % 7 =!= 0),
      incoming = docs.filter(col("doc_id") % 7 === 0),
      idCol = "doc_id", textCol = "text",
      thresholdNum = 5, thresholdDen = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
    // the planted shapes actually exercise all three pair classes
    assert(got.contains((3L, 7L)), "cross-boundary pair missing")
    assert(got.contains((14L, 21L)), "incoming-incoming pair missing")
    assert(full.contains((5L, 10L)) && !got.contains((5L, 10L)),
      "corpus-corpus pair must be excluded")
  }

  test("similarity columns match the full-join computation") {
    val full = Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", thresholdNum = 5, thresholdDen = 10)
      .select("id_a", "id_b", "inter_size", "union_size")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val inc = Dedup.minhashNearDupPairsIncremental(
      corpus = docs.filter(col("doc_id") % 7 =!= 0),
      incoming = docs.filter(col("doc_id") % 7 === 0),
      idCol = "doc_id", textCol = "text",
      thresholdNum = 5, thresholdDen = 10)
      .select("id_a", "id_b", "inter_size", "union_size")
      .as[(Long, Long, Long, Long)].collect()
    inc.foreach { case (a, b, i, u) =>
      assert(full((a, b)) == ((i, u)), s"sizes diverge for ($a, $b)")
    }
  }
}
