package graft

import graft.ext.TextStats

import org.scalatest.funsuite.AnyFunSuite

class RepetitionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rep(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Double, Long, Option[Double])] =
    TextStats.repetition(rows.toDF("id", "text"), "id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
      .toMap

  test("max-run scan finds the most frequent bigram, not just a run") {
    // bigrams: "a b","b a","a b","b c" → "a b" twice (non-adjacent in
    // document order; array_sort makes them a run)
    val got = rep(Seq(1L -> "a b a b c"))
    val (n, distinct, dupRatio, topBg, frac) = got(1L)
    assert(n == 5 && distinct == 3)
    assert(dupRatio == 0.4) // 1 - 3/5
    assert(topBg == 2)
    assert(frac.contains(0.5)) // 2 of 4 bigram slots
  }

  test("fully repetitive doc maxes both signals") {
    val got = rep(Seq(1L -> "spam spam spam spam"))
    val (n, distinct, dupRatio, topBg, frac) = got(1L)
    assert(n == 4 && distinct == 1 && dupRatio == 0.75)
    assert(topBg == 3 && frac.contains(1.0))
  }

  test("all-distinct doc reports zero duplication") {
    val got = rep(Seq(1L -> "one two three four"))
    val (_, _, dupRatio, topBg, frac) = got(1L)
    assert(dupRatio == 0.0 && topBg == 1 && frac.contains(0.3333))
  }

  test("single-token and empty docs") {
    val got = rep(Seq(1L -> "solo", 2L -> "   "))
    // empty (whitespace-only) doc is dropped; single-token doc has no
    // bigrams: count 0, frac null
    assert(!got.contains(2L))
    assert(got(1L) == ((1L, 1L, 0.0, 0L, None)))
  }
}
