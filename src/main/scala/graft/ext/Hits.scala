package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities) over a directed graph, in EXACT integer
  * arithmetic — the iterative mutual-reinforcement scores Kleinberg
  * defined, kept unnormalized so every iteration is a pure BIGINT
  * sum-aggregate (integer addition commutes, so scores are
  * partition-order-independent and hash-adjudicable; the conventional
  * L2 normalization would sum engine-rounded doubles — the q98 PageRank
  * fixed-point lesson applied to HITS). Normalization only rescales, so
  * unnormalized rankings are identical to normalized ones.
  *
  * Iteration (from a(·)=1): h(u) = Σ_{u→v} a(v), then a(v) = Σ_{u→v} h(u).
  * Each half-iteration is one edges⋈scores broadcast-or-shuffle join plus
  * one partial-agg sum — the canonical two-shuffle-per-round shape that
  * scales linearly in |E|. Growth bound: scores ≤ (max degree)^(2·iters),
  * so 2 iterations on degree ≤ ~10⁴ graphs stay far inside BIGINT.
  */
object Hits {

  /** `iterations` full HITS rounds over `edges` (srcCol → dstCol).
    * Returns (node, role, score): role = 'hub' for sources scored by
    * h_iters, 'authority' for destinations scored by a_iters.
    */
  def hubsAuthorities(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      // each round joins this table twice; derive + shuffle it once
      .persist()
    try {
      // a0 = 1 for every authority (any dst node)
      var auth = e.select(col("dst").as("node")).distinct()
        .withColumn("score", lit(1L))
      var hubs: DataFrame = null
      for (_ <- 1 to iterations) {
        hubs = e.join(auth, e("dst") === auth("node"))
          .groupBy("src").agg(sum("score").as("h"))
          .select(col("src").as("node"), col("h").as("score"))
        // truncate lineage per round (the PageRank discipline) so round
        // i's plan does not embed rounds 1..i-1
        auth = e.join(hubs, e("src") === hubs("node"))
          .groupBy("dst").agg(sum("score").as("a"))
          .select(col("dst").as("node"), col("a").as("score"))
          .localCheckpoint()
      }
      hubs.select(col("node"), lit("hub").as("role"), col("score"))
        .unionByName(auth.select(
          col("node"), lit("authority").as("role"), col("score")))
        .localCheckpoint()
    } finally {
      e.unpersist(false)
      ()
    }
  }
}
