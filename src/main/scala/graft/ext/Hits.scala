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
    // r9 execution reshape (guide §2.4): the distinct edge table
    // materializes ONCE (eager localCheckpoint — every half-iteration
    // joins it); the iteration chain itself stays LAZY with a persist on
    // each frame referenced more than once (the last hub table feeds both
    // the final authority update and the output union), so the whole
    // computation runs inside the caller's single action instead of one
    // eager checkpoint job per round. Lineage depth is 2·iterations
    // joins over a checkpointed leaf — bounded and cheap to plan for the
    // small fixed iteration counts this exact-integer form permits
    // (scores grow as degree^(2·iters)).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint()
    // a0 = 1 for every authority (any dst node)
    var auth = e.select(col("dst").as("node")).distinct()
      .withColumn("score", lit(1L))
    var hubs: DataFrame = null
    for (_ <- 1 to iterations) {
      // session-scoped scratch cache (the PageRank contract): alive for
      // the caller's action; reclaimed by the harness between queries /
      // on session end.
      hubs = e.join(auth, e("dst") === auth("node"))
        .groupBy("src").agg(sum("score").as("h"))
        .select(col("src").as("node"), col("h").as("score"))
        .persist()
      auth = e.join(hubs, e("src") === hubs("node"))
        .groupBy("dst").agg(sum("score").as("a"))
        .select(col("dst").as("node"), col("a").as("score"))
    }
    hubs.select(col("node"), lit("hub").as("role"), col("score"))
      .unionByName(auth.select(
        col("node"), lit("authority").as("role"), col("score")))
  }
}
