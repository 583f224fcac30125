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
}
