package graft

import graft.ext.Bfs

import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked properties of the bounded-hop BFS: min-hop wins when a
  * longer alternative path exists, cycles terminate, unreachable nodes
  * never appear, and the hop bound truncates exactly.
  */
class BfsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  //   1 → 2 → 3 → 4 → 5        direct shortcut 1 → 4
  //   2 → 1 (cycle), 9 → 10 (disconnected)
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (1L, 4L), (2L, 1L), (9L, 10L))

  private def run(maxHops: Int): Map[Long, Int] =
    Bfs.boundedDistances(spark, edges.toDF("u", "v"), source = 1L, maxHops)
      .as[(Long, Int)].collect().toMap

  test("min-hop wins over the longer path; cycles terminate") {
    // 4 via the shortcut is 1 hop, not 3; 5 follows at 2
    assert(run(4) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2))
  }

  test("unreachable components never appear") {
    assert(!run(4).contains(9L) && !run(4).contains(10L))
  }

  test("the hop bound truncates exactly") {
    assert(run(1) == Map(1L -> 0, 2L -> 1, 4L -> 1))
    assert(run(0) == Map(1L -> 0))
  }
}
