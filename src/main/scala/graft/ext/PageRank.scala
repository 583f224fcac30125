package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank with a FIXED iteration count and exact integer
  * fixed-point arithmetic — the iterative-graph pattern (rank join →
  * incoming-mass aggregate, twice-shuffled per round) expressed so that
  * every engine computes bit-identical ranks.
  *
  * Why fixed-point: the textbook double-precision update
  * `Σ r·w/out` sums floats in partition order — non-associative, so two
  * runs (or two engines) disagree in the last bits and a hash gate can
  * never adjudicate it. Here ranks live as BIGINT micro-units of
  * `total`: each edge contributes `(r·w) div out` (exact int ops), sums
  * are exact BIGINT adds (order-independent), and damping is the
  * rational 17/20 applied as `(17·s) div 20`. Deterministic under any
  * partitioning, replayable in DuckDB with `//`.
  *
  * Scale shape: `edges ⋈ ranks` co-partitions on `src` (ranks are one
  * row per node — broadcastable while the node set fits, shuffled
  * otherwise), the mass aggregate shuffles on `dst`, and the damped
  * rebase is a map over the node list. Per iteration that is the
  * canonical 2 shuffles; edges are computed once and reused across
  * iterations. Dangling-node mass is dropped (the standard
  * simplification), identically in both engines.
  */
object PageRank {

  /** Ranks after `iterations` rounds over weighted `edges`
    * (`srcCol`, `dstCol`, `wCol`); returns (node, rank_micro) with ranks
    * in BIGINT micro-units of `total`.
    */
  def ranks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      iterations: Int,
      total: Long = 1000000000000L): DataFrame = {
    val e = edges.select(
      col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(wCol).cast("long").as("__w"))
    val outw = e.groupBy("__src").agg(sum("__w").as("__out"))
    // computed once, read every iteration — persist, or iteration i
    // re-executes the whole edge derivation i times
    val ew = e.join(outw, "__src").persist()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct().persist()
    val n = nodes.count()
    if (n == 0) {
      ew.unpersist(); nodes.unpersist()
      return nodes.select(col("node"), lit(0L).as("rank_micro"))
    }
    val base = (total * 3L / 20L) / n
    var r = nodes.withColumn("r", lit(total / n))
    // r9 execution reshape (guide §2.4): the rounds are LAZY — each
    // round's rank table is referenced exactly once (by the next round),
    // so with `ew` and `nodes` persisted the chain executes once inside
    // the caller's single action; the per-round eager localCheckpoint
    // jobs (one driver round-trip per iteration) are gone. The persisted
    // leaves stay alive for the caller's action (unpersisting them here
    // would drop the cache before anything ran); they are session-scoped
    // scratch, reclaimed by the harness between queries / on session end.
    for (_ <- 1 to iterations) {
      // identical value to `(r * __w) div __out` (write r = q·out + s:
      // (r·w) div out = q·w + (s·w) div out) but never forms the r·w
      // product, which overflows Long once rank ~ total meets an edge
      // weight over ~2^63/total — reachable event counts at corpus scale
      val inc = ew.join(r, col("__src") === col("node"))
        .select(col("__dst"),
          expr("(r div __out) * __w + ((r % __out) * __w) div __out")
            .as("__c"))
        .groupBy("__dst").agg(sum("__c").as("__s"))
      r = nodes.join(inc, col("node") === col("__dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(17 * coalesce(__s, 0L)) div 20")).as("r"))
    }
    r.select(col("node"), col("r").as("rank_micro"))
  }
}
