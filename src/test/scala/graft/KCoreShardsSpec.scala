package graft

import graft.ext.KCore

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[KCore.peelStats]] cascade semantics and the q204/q205/q203 invariants
  * that aren't visible in the oracle compare: serpentine balance bounds,
  * exact per-purchase credit conservation, and the RBO@10 extremes.
  */
class KCoreShardsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("kcore peel cascades across rounds") {
    // star: hub 1 -> {10, 11, 12}; pendant 2 -> 10.
    // k=2 round 1: edges from src 2 drop (deg 1); dst 11, 12 have deg 1 ->
    // drop; survivors: only (1, 10)? src 1 deg 3 >= 2, dst 10 deg 2 >= 2
    // -> (1,10) survives r1; (1,11), (1,12) drop (dst deg 1); (2,10)
    // drops (src deg 1). Round 2: (1,10) alone -> src deg 1 -> empty.
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
      .toDF("src", "dst")
    val out = KCore.peelStats(e, "src", "dst", k = 2, rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, 1L, 1L, 1L), (2, 0L, 0L, 0L)))
  }

  test("kcore is partition-invariant and dedupes edges") {
    val e = (0 until 400).map(i => (i.toLong % 20, i.toLong % 13 + 100))
      .toDF("src", "dst")
    val base = KCore.peelStats(e, "src", "dst", k = 5, rounds = 3)
      .collect().map(_.toSeq).toSeq
    val got = KCore.peelStats(e.union(e).repartition(7),
      "src", "dst", k = 5, rounds = 3)
      .collect().map(_.toSeq).toSeq
    assert(got == base)
  }

  test("serpentine sharding balances token totals within one max doc") {
    // q204's assignment rule, checked on a synthetic skewed corpus: the
    // serpentine guarantee is max-min shard total <= max single doc
    val numShards = 8
    val docs = (0 until 1000).map(i => (i.toLong, (i * 37 % 500 + 1).toLong))
    val ranked = docs.sortBy { case (id, n) => (-n, id) }.zipWithIndex
    val totals = ranked.groupBy { case (_, idx) =>
      val pos = (idx % numShards).toInt
      if ((idx / numShards) % 2 == 0) pos else numShards - 1 - pos
    }.map { case (_, xs) => xs.map(_._1._2).sum }
    val maxDoc = docs.map(_._2).max
    assert(totals.size == numShards)
    assert(totals.max - totals.min <= maxDoc)
  }

  test("U-shape attribution credits sum to exactly 10000 per purchase") {
    // replay the q213 rule for every n in 1..23
    for (n <- 1 to 23) {
      val credits: Seq[Long] =
        if (n == 1) Seq(10000L)
        else if (n == 2) Seq(5000L, 5000L)
        else (1 to n).map { rn =>
          if (rn == 1 || rn == n) 4000L
          else if (rn == n - 1) 2000L - (n - 3) * (2000L / (n - 2))
          else 2000L / (n - 2)
        }
      assert(credits.sum == 10000L, s"n=$n")
      assert(credits.forall(_ >= 0), s"n=$n")
    }
  }

  test("linear attribution credits sum to exactly 10000 per purchase") {
    // replay the q205 arithmetic for every n in 1..23
    for (n <- 1 to 23) {
      val per = 10000L / n
      val last = 10000L - (n - 1) * per
      assert((n - 1) * per + last == 10000L)
      assert(last >= per) // remainder only ever adds to the last touch
    }
  }

  test("RBO@10 extremes: identical rankings hit 999022, disjoint hit 0") {
    // identical: overlap_d = d -> sum_d floor(1e6/2^d) = 999022 (the
    // exact 1e6*(1 - 2^-10) = 999023.4 loses 1.4 to per-term floors)
    val identical = (1 to 10)
      .map(d => (1000000L * d) / ((1L << d) * d)).sum
    assert(identical == 999022L)
    val disjoint = (1 to 10).map(d => (1000000L * 0) / ((1L << d) * d)).sum
    assert(disjoint == 0L)
  }
}
