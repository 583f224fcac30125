package graft

import graft.ext.Dedup

import org.scalatest.funsuite.AnyFunSuite

class SortedNeighborhoodSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], window: Int, parts: Int = 4,
      num: Int = 3, den: Int = 10) =
    Dedup.sortedNeighborhoodPairs(
      docs.toDF("doc_id", "text").repartition(parts),
      idCol = "doc_id", textCol = "text",
      window = window, keyLen = 24, k = 2,
      thresholdNum = num, thresholdDen = den)
      .as[(Long, Long, Long, Long)].collect().toSet

  private val docs = Seq(
    (10L, "alpha beta gamma delta epsilon one"),
    (20L, "alpha beta gamma delta epsilon two"),
    (30L, "zeta eta theta iota kappa lambda"),
    (40L, "totally different words here entirely"),
    (50L, "alpha")) // single token: no bigram set → excluded

  test("prefix-adjacent near-dups are found with exact set sizes") {
    val pairs = run(docs, window = 4)
    // d10/d20 bigrams share 4 of 6: {alpha beta, beta gamma, gamma delta,
    // delta epsilon} + one distinct tail each
    assert(pairs == Set((10L, 20L, 4L, 6L)))
  }

  test("sub-bigram docs never pair, even when sort-adjacent") {
    assert(!run(docs, window = 5, num = 0, den = 10)
      .exists(p => p._1 == 50L || p._2 == 50L))
  }

  test("widening the window only adds pairs") {
    val narrow = run(docs, window = 2, num = 0, den = 10)
    val wide = run(docs, window = 5, num = 0, den = 10)
    assert(narrow.subsetOf(wide))
  }

  test("pair set is partition-invariant") {
    assert(run(docs, 4, parts = 1) == run(docs, 4, parts = 7))
  }
}
