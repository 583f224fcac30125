package graft

import graft.ext.Clusters

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class ClustersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find over the same edges. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("path graph collapses to its minimum") {
    val edges = (1L until 10L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got == (1L to 10L).map(_ -> 1L).toMap)
  }

  test("cycle and disjoint components") {
    val edges = Seq((5L, 6L), (6L, 7L), (7L, 5L), (20L, 30L))
    val got = cc(edges)
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 20L -> 20L, 30L -> 20L))
  }

  test("matches union-find on a pseudo-random graph") {
    // Deterministic LCG so the suite has no RNG state.
    var s = 12345L
    def next(): Long = { s = (s * 1103515245L + 12345) % 2147483647L; s }
    val edges = (1 to 300).map(_ => (next() % 100, next() % 100))
      .filter { case (a, b) => a != b }
    assert(cc(edges) == unionFind(edges))
  }

  test("transitive near-dups land in one cluster (A~B, B~C, no A~C pair)") {
    val got = cc(Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("dedupClusters labels singletons and flags one canonical per cluster") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((2L, 4L), (4L, 6L)).toDF("src", "dst")
    val rows = Clusters.dedupClusters(nodes, "id", edges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 1L, 1L, true), (2L, 2L, 3L, true), (3L, 3L, 1L, true),
      (4L, 2L, 3L, false), (5L, 5L, 1L, true), (6L, 2L, 3L, false)))
    // Exactly one canonical row per cluster.
    val perCluster = rows.groupBy(_._2).values
    assert(perCluster.forall(g => g.count(_._4) == 1))
  }

  test("empty edge set yields empty labels") {
    val empty: DataFrame = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Clusters.connectedComponents(empty).isEmpty)
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int = 2,
      parts: Int = 3): Map[Long, Long] =
    Clusters.labelPropagation(
      edges.toDF("a", "b").repartition(parts), iters)
      .as[(Long, Long)].collect().toMap

  test("LPA separates two cliques joined by one bridge; CC merges them") {
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((4L, 11L)) // one bridge
    val labs = lpa(edges)
    val commA = (1L to 4L).map(labs).toSet
    val commB = (11L to 14L).map(labs).toSet
    assert(commA.size == 1, s"clique A not uniform: $commA")
    assert(commB.size == 1, s"clique B not uniform: $commB")
    assert(commA != commB, "bridge merged the cliques")
    // connected components DO merge them — the contrast LPA exists for
    val ccLabs = cc(edges.map { case (a, b) => (a, b) })
    assert(ccLabs.values.toSet.size == 1)
  }

  test("LPA is deterministic and partition-invariant") {
    val edges = (1L to 30L).flatMap(i =>
      Seq((i, (i * 7) % 30 + 1), (i, (i * 11) % 30 + 1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    assert(lpa(edges, parts = 1) == lpa(edges, parts = 13))
    assert(lpa(edges, iters = 1, parts = 2) == lpa(edges, iters = 1, parts = 7))
  }
}
