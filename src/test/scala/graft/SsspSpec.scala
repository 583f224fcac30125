package graft

import graft.ext.Sssp

import org.scalatest.funsuite.AnyFunSuite

/** [[Sssp.boundedDistances]]: hand-computed min-plus relaxation, the
  * round-budget horizon, and partition invariance (min commutes, so
  * shuffling must never perturb a distance).
  */
class SsspSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // 1 -> 2 (5), 1 -> 3 (20), 2 -> 3 (4), 3 -> 4 (1):
  // dist(3) = 9 via 2 (not the direct 20); dist(4) = 10 needs 3 hops
  private val edges = Seq(
    (1L, 2L, 5L), (1L, 3L, 20L), (2L, 3L, 4L), (3L, 4L, 1L))
    .toDF("src", "dst", "w")

  test("relaxation takes the cheaper multi-hop path") {
    val d = Sssp.boundedDistances(spark, edges, "src", "dst", "w",
      source = 1L, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 5L, 3L -> 9L, 4L -> 10L))
  }

  test("round budget bounds the path length") {
    val d = Sssp.boundedDistances(spark, edges, "src", "dst", "w",
      source = 1L, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 rounds: node 4 only reachable via the 21-cost 2-hop path 1->3->4;
    // the cheaper 3-hop route (10) needs round 3
    assert(d == Map(1L -> 0L, 2L -> 5L, 3L -> 9L, 4L -> 21L))
  }

  test("distances are partition-invariant") {
    val big = (0 until 500)
      .map(i => (i.toLong % 23, i.toLong % 17 + 23, (i % 7 + 1).toLong))
      .toDF("src", "dst", "w")
    val base = Sssp.boundedDistances(spark, big, "src", "dst", "w", 1L, 4)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val got = Sssp.boundedDistances(spark, big.repartition(11),
      "src", "dst", "w", 1L, 4)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == base)
  }
}
