package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table reconciliation: compare two snapshots of a keyed table and
  * report added / removed / changed / unchanged counts — the migration
  * sign-off check (old pipeline vs new, yesterday vs today) a warehouse
  * runs before switching readers.
  *
  * 100 TB shape: each side collapses to (key, row-hash) — two narrow
  * columns — before the full-outer join, so the shuffle carries digests,
  * never payloads; the report is ONE row. Column order is fixed by the
  * caller's list, so the digest is stable across column reorderings of
  * the physical schema. For multi-TB sides, pre-bucket both tables on the
  * key ([[Bucketing]]) and the join runs shuffle-free.
  */
object TableDiff {

  /** Digest `cols` (in order) with '|' separators; null-safe: nulls
    * become the empty string, which the separator keeps position-stable.
    */
  private def rowHash(df: DataFrame, keyCol: String, cols: Seq[String]) =
    df.select(col(keyCol).as("__k"),
      md5(concat_ws("|", cols.map(c => coalesce(col(c).cast("string"),
        lit(""))): _*)).as("__h"))

  /** One-row summary: n_removed (key only in `a`), n_added (only in `b`),
    * n_changed (both, digest differs), n_same.
    */
  def diffSummary(
      a: DataFrame, b: DataFrame,
      keyCol: String, compareCols: Seq[String]): DataFrame = {
    val ah = rowHash(a, keyCol, compareCols)
    val bh = rowHash(b, keyCol, compareCols)
      .withColumnsRenamed(Map("__k" -> "__bk", "__h" -> "__bh"))
    ah.join(bh, col("__k") === col("__bk"), "full_outer")
      .agg(
        count(when(col("__k").isNotNull && col("__bk").isNull, lit(1)))
          .as("n_removed"),
        count(when(col("__k").isNull && col("__bk").isNotNull, lit(1)))
          .as("n_added"),
        count(when(col("__k").isNotNull && col("__bk").isNotNull &&
          col("__h") =!= col("__bh"), lit(1))).as("n_changed"),
        count(when(col("__k").isNotNull && col("__bk").isNotNull &&
          col("__h") === col("__bh"), lit(1))).as("n_same"))
  }
}
