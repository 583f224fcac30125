package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Bucketed (pre-partitioned) table layout: the 100 TB answer to "this join
  * shuffles both sides every run". Writing fact tables bucketed and sorted
  * by the join key moves the shuffle to WRITE TIME, once; every subsequent
  * join or aggregation on that key reads co-located buckets and runs
  * shuffle-free (`SortMergeJoin` with no `Exchange` on either side —
  * BucketedJoinSpec pins exactly that plan shape). The reference engine is
  * single-node Polars and has no notion of this
  * (/root/reference/src/reader.ts reads flat files); bucketing is
  * Spark-native extension surface.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table.
    * The `repartition` on the bucket column aligns write tasks with
    * buckets — one file per bucket — which keeps the written sort order
    * usable by readers and the layout stable under re-writes.
    */
  def writeBucketed(
      df: DataFrame,
      bucketCol: String,
      buckets: Int,
      path: String,
      table: String): Unit =
    df.repartition(buckets, df(bucketCol))
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(table)

  /** All shuffle exchanges in `df`'s executed plan — spec support for
    * asserting a plan is shuffle-free. Under AQE, materialized exchanges
    * hide inside leaf `QueryStageExec` wrappers that plain
    * `plan.collect` never descends into (a naive count reports 0 for
    * every adaptive plan); this walk expands adaptive roots, query
    * stages, and reused exchanges explicitly.
    */
  def shuffleCount(df: DataFrame): Int = {
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
