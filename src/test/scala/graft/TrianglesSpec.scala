package graft

import graft.ext.Triangles

import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked and property-checked triangle counting: K4, a graph with
  * a pendant/no-triangle region, robustness to duplicate / reversed /
  * self-loop edges, and equivalence of the degree-oriented enumeration
  * with a naive all-triple reference on a deterministic pseudo-random
  * graph (the property that actually guards the orientation logic).
  */
class TrianglesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNodeCounts(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("K4: four triangles, every node in three") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("pendant edges and squares contribute nothing") {
    // triangle 1-2-3 plus a square 4-5-6-7 and a pendant 3-8
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (6L, 7L), (4L, 7L), (3L, 8L))
    assert(counts(g) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("self-loops, duplicates, and reversed edges are canonicalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (2L, 2L))
    assert(counts(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("oriented enumeration equals the naive all-triple reference") {
    // deterministic pseudo-random graph on 40 nodes, ~120 edges
    val edges = (1 to 400).map { i =>
      val u = (i * 7919) % 40
      val v = (i * 104729 + 13) % 40
      (u.toLong, v.toLong)
    }
    // naive reference: adjacency set, count closed triples x<y<z
    val adj = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
      .filter { case (u, v) => u != v }.toSet
    val nodes = adj.map(_._1).toSeq.sorted
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    for {
      x <- nodes; y <- nodes if y > x && adj((x, y))
      z <- nodes if z > y && adj((y, z)) && adj((x, z))
    } {
      Seq(x, y, z).foreach(n => expected(n) = expected.getOrElse(n, 0L) + 1)
    }
    assert(counts(edges) == expected.toMap)
  }
}
