package graft

import graft.ext.Skyline

import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Brute-force dominance filter with the same coincident-point dedup
    * rule (first id among identical (x, y) wins).
    */
  private def bruteForce(
      pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val nonDominated = pts.filterNot { case (id, x, y) =>
      pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 <= y && (x2 > x || y2 < y)
      }
    }
    nonDominated.groupBy(p => (p._2, p._3)).values
      .map(_.minBy(_._1)).toSet
  }

  private def run(pts: Seq[(Long, Long, Long)], parts: Int) =
    Skyline.skyline2d(
      pts.toDF("id", "x", "y").repartition(parts), "x", "y", "id")
      .as[(Long, Long, Long)].collect().toSet

  test("matches brute force and is invariant across partitionings") {
    // deterministic pseudo-random cloud with a known staircase frontier
    val pts = (0L until 300L).map { i =>
      val x = (i * 7919) % 1000
      val y = (i * 104729) % 1000
      (i, x, y)
    } ++ Seq((900L, 1000L, 0L)) // a point dominating most of the cloud
    val expected = bruteForce(pts)
    assert(run(pts, 1) == expected)
    assert(run(pts, 7) == expected)
    assert(run(pts, 32) == expected)
  }

  test("coincident points keep exactly the first id") {
    val pts = Seq((5L, 10L, 10L), (2L, 10L, 10L), (9L, 10L, 10L))
    assert(run(pts, 3) == Set((2L, 10L, 10L)))
  }

  test("a totally ordered chain keeps only the best point") {
    val pts = (1L to 50L).map(i => (i, i, 100L - i)) // higher x, lower y
    assert(run(pts, 8) == Set((50L, 50L, 50L)))
  }

  test("an anti-chain keeps every point") {
    val pts = (1L to 40L).map(i => (i, i, i)) // higher x but higher y
    assert(run(pts, 8).size == 40)
  }
}
