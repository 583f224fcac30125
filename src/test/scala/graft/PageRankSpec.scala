package graft

import graft.ext.PageRank

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[PageRank]] exact fixed-point semantics: hand-computed ranks on tiny
  * graphs, the symmetric-cycle fixed point, and bit-identical results
  * under any edge partitioning (the property the integer formulation
  * exists to guarantee).
  */
class PageRankSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val Total = 1000000000000L

  private def run(edges: Seq[(String, String, Long)], iters: Int,
      parts: Int = 1): Map[String, Long] =
    PageRank.ranks(edges.toDF("src", "dst", "w").repartition(parts),
        "src", "dst", "w", iters)
      .as[(String, Long)].collect().toMap

  test("symmetric 2-cycle is the exact fixed point") {
    // base + damped pass-through: (3·T/20)/2 + (17·(T/2))/20 = T/2 exactly
    val r = run(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 3)
    assert(r == Map("a" -> Total / 2, "b" -> Total / 2))
  }

  test("one iteration matches the hand-computed update") {
    // a→c, b→c, c→a. r0 = T/3 each.
    val t3 = Total / 3
    val base = (Total * 3L / 20L) / 3L
    val expected = Map(
      "a" -> (base + 17L * t3 / 20L),          // mass from c
      "b" -> base,                              // no incoming
      "c" -> (base + 17L * (t3 + t3) / 20L))   // exact: sum then damp
    val got = run(Seq(("a", "c", 1L), ("b", "c", 1L), ("c", "a", 1L)),
      iters = 1)
    assert(got == expected)
  }

  test("weights steer mass: heavier edge gets proportionally more") {
    // a splits 3:1 between b and c
    val r = run(Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L)), iters = 2)
    assert(r("b") > r("c"))
  }

  test("huge edge weights do not overflow the contribution product") {
    // naive (r * w) div out with r = T/2 = 5e11 and w = out = 2e9 forms
    // 1e21 — past Long; the split form q·w + (s·w) div out stays exact
    val w = 2000000000L
    val r = run(Seq(("a", "b", w), ("b", "a", w)), iters = 2)
    assert(r == Map("a" -> Total / 2, "b" -> Total / 2))
  }

  test("empty edge set returns an empty result, not a crash") {
    assert(run(Seq.empty, iters = 3).isEmpty)
  }

  test("ranks are bit-identical under any partitioning") {
    val edges = (0 until 50).flatMap { i =>
      Seq((s"n${i % 10}", s"n${(i * 3) % 10}", (i % 4) + 1L),
        (s"n${(i * 7) % 10}", s"n${i % 10}", 1L))
    }
    val base = run(edges, iters = 3, parts = 1)
    for (p <- Seq(3, 16))
      assert(run(edges, iters = 3, parts = p) == base)
  }
}
