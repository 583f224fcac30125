package graft

import graft.ext.Similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.nnDescentTopK]]: the refinement round must IMPROVE recall
  * against exact brute-force ground truth (neighbors-of-neighbors finds
  * what the seed buckets missed), the graph respects the k bound, and
  * construction is layout-deterministic.
  */
class NnDescentSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def recallVsBrute(graph: org.apache.spark.sql.DataFrame,
      k: Int): Double = {
    val truth = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = graph.select(col("query_id"), col("neighbor_id"))
      .join(truth, Seq("query_id", "neighbor_id")).count()
    hits.toDouble / truth.count()
  }

  test("recall climbs monotonically with refinement rounds") {
    val k = 4
    val rs = (0 to 3).map { r =>
      recallVsBrute(
        Similarity.nnDescentTopK(emb, "vec_id", "embedding", k, rounds = r),
        k)
    }
    info(s"recall by round: ${rs.mkString(", ")}")
    assert(rs.sliding(2).forall { case Seq(a, b) => b > a },
      s"each round must improve recall, got $rs")
  }

  test("a converged graph early-exits: rounds is a cap, not a fixed cost") {
    val k = 3
    // a tiny corpus converges in a round or two; with the cap far past
    // that, the counter must show the loop stopped at convergence + 1
    // (the round that PROVED the fixed point) — never the full cap
    val tiny = emb.filter(col("vec_id") < 40)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val capped = Similarity.nnDescentTopKCounted(
      tiny, "vec_id", "embedding", k, rounds = 12, roundsRun = counter)
    val edges = capped.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect.toSeq.sorted
    assert(counter.get > 0 && counter.get < 12,
      s"expected convergence exit below the 12-round cap, ran ${counter.get}")
    // the early exit is a pure optimization: the capped run's graph is
    // the fixed point the full run would also produce
    val full = Similarity.nnDescentTopK(
      tiny, "vec_id", "embedding", k, rounds = counter.get)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect.toSeq.sorted
    assert(edges == full)
  }

  test("every node emits at most k ranked edges, ranks contiguous from 1") {
    val g = Similarity.nnDescentTopK(emb, "vec_id", "embedding", 3,
      rounds = 1)
    val bad = g.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .filter(col("n") > 3 || col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("construction is partitioning-invariant") {
    val a = Similarity.nnDescentTopK(emb.repartition(7), "vec_id",
      "embedding", 4, rounds = 1)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    val b = Similarity.nnDescentTopK(emb.repartition(2), "vec_id",
      "embedding", 4, rounds = 1)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    assert(a == b)
  }
}
