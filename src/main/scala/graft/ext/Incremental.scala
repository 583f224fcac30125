package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-aggregate maintenance: merge partial aggregate STATES
  * instead of recomputing from raw rows — the warehouse pattern where a
  * standing per-key summary absorbs each new batch at the cost of the
  * batch, not of history.
  *
  * Only works for aggregates whose state is mergeable (count/sum via sum,
  * min/max via min/max — avg carried as sum+count); and only EXACTLY when
  * the carried state is order-independent, so sums must ride integers or
  * decimals (a double sum re-merged in a different grouping drifts in the
  * last bits — the engine-wide determinism rule). At 100 TB the win is
  * structural: the historical state is |keys| rows, each delta batch
  * aggregates only itself, and the merge shuffles |keys| × batches rows.
  */
object Incremental {

  /** Merge per-batch aggregate states on `keys`: `sumCols` add (counts
    * and sums both merge by addition), `minCols`/`maxCols` take the
    * extreme. Every state frame must carry identical column names.
    */
  def mergeStates(
      states: Seq[DataFrame],
      keys: Seq[String],
      sumCols: Seq[String],
      minCols: Seq[String] = Seq.empty,
      maxCols: Seq[String] = Seq.empty): DataFrame = {
    require(states.nonEmpty, "mergeStates: no states to merge")
    require(sumCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty,
      "mergeStates: nothing to aggregate")
    val exprs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  /** Delta-join algebra for materialized JOIN-view maintenance: with
    * append-only deltas, `(A ∪ ΔA) ⋈ (B ∪ ΔB)` decomposes exactly into
    * `A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB`. The first term is the STORED view —
    * in production it is never recomputed; each refresh pays only the
    * three delta terms, each bounded by a delta's size times its match
    * rate. Returns the four terms in that order (head = base view) so
    * callers can aggregate each and [[mergeStates]] them — which keeps
    * the whole refresh in mergeable-state algebra end to end.
    *
    * `joinOn` is an unresolved column predicate (e.g.
    * `col("o_custkey") === col("c_custkey")`) resolved per term. At
    * 100 TB: deltas are the small side — Spark broadcasts them against
    * the base tables, so no base table ever reshuffles.
    */
  def deltaJoinParts(
      aBase: DataFrame, aDelta: DataFrame,
      bBase: DataFrame, bDelta: DataFrame,
      joinOn: org.apache.spark.sql.Column): Seq[DataFrame] =
    Seq(aBase.join(bBase, joinOn), aDelta.join(bBase, joinOn),
      aBase.join(bDelta, joinOn), aDelta.join(bDelta, joinOn))
}
