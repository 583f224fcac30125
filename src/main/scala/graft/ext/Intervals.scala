package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union (gaps-and-islands) sweep: merge overlapping-or-adjacent
  * half-open [s, t) intervals per key. The classic sweep expressed as two
  * windows over ONE per-key sort (Catalyst collapses them into a single
  * Window node): a running max-end detects island breaks, a running break
  * sum numbers the islands. Island state is O(1) per row — no interval
  * list ever materializes, so keys with millions of intervals stream
  * through; the only shuffle is the per-key sort itself.
  *
  * Merge rule: an interval starting exactly at the previous max end
  * (s == prev_end) is ADJACENT and merges — half-open intervals tile, so
  * adjacency never changes covered length, only the island count; the rule
  * is fixed so island counts are deterministic cross-engine.
  */
object Intervals {

  /** One row per (key, island): island id, island start, island end. */
  def islands(df: DataFrame, keyCol: String, sCol: String,
      tCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("__s")
    df.select(col(keyCol), col(sCol).as("__s"), col(tCol).as("__t"))
      .withColumn("__prev_end",
        max(col("__t")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__brk",
        when(col("__prev_end").isNull || col("__s") > col("__prev_end"), 1)
          .otherwise(0))
      .withColumn("isl",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("isl"))
      .agg(min(col("__s")).as("island_s"), max(col("__t")).as("island_t"))
  }

  /** Per-key island count and exact covered length (Σ island_t−island_s). */
  def coverage(df: DataFrame, keyCol: String, sCol: String,
      tCol: String): DataFrame =
    islands(df, keyCol, sCol, tCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_t") - col("island_s")).as("covered"))
}
