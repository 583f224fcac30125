package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartite k-core peeling: iteratively drop edges whose endpoint on
  * EITHER side has degree < k, until a fixed round budget — the dense-core
  * extractor used to prune sparse interactions before collaborative
  * filtering / graph embedding (a 1-interaction user tells you nothing and
  * doubles the edge list). Fixed synchronous rounds keep the computation
  * deterministic (every engine sees identical intermediate edge sets), so
  * an oracle can replay the peel as unrolled CTEs; full convergence is the
  * caller looping until `n_edges` stops changing.
  *
  * Scale: each round is two degree COUNT aggregates (map-side-combinable,
  * node-sized outputs) + two joins of the degree tables back onto edges —
  * degree tables are ≪ edges and broadcast-eligible; the edge table
  * shrinks monotonically. Lineage is cut per round (the PageRank
  * discipline).
  */
object KCore {

  /** Peel `edges` (srcCol, dstCol) for `rounds` synchronous rounds at
    * threshold `k`. Returns one row per round: (round, n_edges, n_src,
    * n_dst) AFTER that round's peel — all exact BIGINT counts.
    */
  def peelStats(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && k >= 1, "rounds and k must be >= 1")
    // r9 execution reshape (guide §2.4): the input edge set materializes
    // ONCE (eager localCheckpoint); each round's peeled edge table is a
    // LAZY persist — referenced three ways (two degree aggregates + next
    // round / its own stats row), the cache bounds it to one computation
    // — and the per-round stats rows union into ONE lazy frame, so the
    // whole peel executes inside the caller's single action instead of
    // `rounds` eager checkpoint jobs + `rounds` head() jobs.
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint()
    val stats = (1 to rounds).map { round =>
      val sdeg = e.groupBy("src").agg(count(lit(1)).as("__sd"))
      val pdeg = e.groupBy("dst").agg(count(lit(1)).as("__pd"))
      // session-scoped scratch cache (the PageRank contract): alive for
      // the caller's action; reclaimed by the harness between queries /
      // on session end — the operator returns a lazy frame and cannot
      // know when that action has run.
      e = e.join(sdeg, "src").join(pdeg, "dst")
        .filter(col("__sd") >= k && col("__pd") >= k)
        .select("src", "dst")
        .persist()
      e.agg(
        count(lit(1)).as("n_edges"),
        countDistinct("src").as("n_src"),
        countDistinct("dst").as("n_dst"))
        .select(lit(round).as("round"), col("n_edges"), col("n_src"),
          col("n_dst"))
    }
    stats.reduce(_.unionByName(_))
  }
}
