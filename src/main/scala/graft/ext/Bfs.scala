package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded-hop BFS (single-source shortest hop counts) — the transitive-
  * closure primitive behind reachability, lineage, and fraud-ring
  * queries. Exact integer distances, so the result is hash-adjudicable
  * and layout-independent (no float rank to drift).
  *
  * Scale shape (PageRank's discipline, `ext/PageRank`): per hop, ONE
  * `frontier ⋈ edges` shuffle on the edge source plus a min-aggregate on
  * the reached node; the edge table partitions once and is reused every
  * round; the frontier is only the rows whose distance might still
  * improve. Each round's result is `localCheckpoint`ed so the final plan
  * does not embed all iterations. Hops are BOUNDED by construction —
  * unbounded closure on an adversarial graph is a different (and
  * deliberately unshipped) operator.
  */
object Bfs {

  /** Distances from `source` over `edges(u, v)` within `maxHops`:
    * returns (node, dist) for every node reached, dist = fewest hops.
    */
  def boundedDistances(
      spark: SparkSession,
      edges: DataFrame,
      source: Long,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 16,
      s"bounded BFS: maxHops must be in [0,16], got $maxHops")
    // r9 execution reshape (guide §2.4): the edge table materializes
    // ONCE (eager localCheckpoint — joined every hop); the hop chain is
    // LAZY with a per-hop persist (each merged distance table feeds BOTH
    // the next frontier and the next merge, so the cache bounds it to one
    // computation), executing inside the caller's single action instead
    // of one eager checkpoint job per hop.
    val e = edges.select(col("u").cast("long"), col("v").cast("long"))
      .localCheckpoint()
    var dist = spark.range(1)
      .select(lit(source).as("node"), lit(0).cast("int").as("d"))
    var frontier = dist
    var hop = 0
    while (hop < maxHops) {
      hop += 1
      // fresh aliases per hop: the lazy frontier's lineage already embeds
      // e, so a raw e("u") reference would be ambiguous to the analyzer
      val eh = e.select(col("u").as("__eu"), col("v").as("__ev"))
      val reached = frontier.join(eh, frontier("node") === col("__eu"))
        .select(col("__ev").as("node"), lit(hop).cast("int").as("d"))
      // session-scoped scratch cache (the PageRank contract): alive for
      // the caller's action; reclaimed by the harness between queries /
      // on session end.
      val merged = dist.unionByName(reached)
        .groupBy("node").agg(min(col("d")).as("d"))
        .persist()
      // only nodes first reached THIS hop can extend the next frontier
      frontier = merged.filter(col("d") === hop)
      dist = merged
    }
    dist
  }
}
