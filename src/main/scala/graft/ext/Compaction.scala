package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file compaction: rewrite a dataset so output files land near a
  * target byte size — the maintenance op that keeps a 100 TB table's file
  * count sane (a snapshot pipeline appending per-batch files otherwise
  * degrades every downstream scan: one task + one footer fetch per tiny
  * file).
  *
  * Sizing: sample up to `sampleRows` rows, estimate bytes/row from their
  * UTF-8-serialized width (cheap, format-agnostic, biased large vs
  * parquet's encoded size — so files land under, not over, the target),
  * derive rows-per-file, and write with `maxRecordsPerFile` after
  * `repartition(ceil(rows/rowsPerFile))`. The repartition is one
  * round-robin shuffle that also breaks any skewed input layout; for
  * sorted/z-ordered tables use `repartitionByRange` upstream and keep only
  * the `maxRecordsPerFile` cap here.
  */
object Compaction {

  /** Estimated average serialized row width in bytes over a bounded
    * sample. Never scans the full input.
    */
  def estimateRowBytes(df: DataFrame, sampleRows: Int = 1000): Double = {
    val sample = df.limit(sampleRows)
      .select(length(to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
        .as("w"))
      .agg(avg("w").as("avg"), count(lit(1)).as("n"))
      .head()
    if (sample.getLong(1) == 0L) 1.0 else sample.getDouble(0)
  }

  /** Rewrite `df` to `path` as parquet targeting `targetFileBytes` per
    * file. Returns the rows-per-file cap used.
    */
  def compactTo(
      df: DataFrame,
      path: String,
      targetFileBytes: Long,
      sampleRows: Int = 1000): Long = {
    require(targetFileBytes > 0, "target file size must be positive")
    val rowBytes = math.max(1.0, estimateRowBytes(df, sampleRows))
    val rowsPerFile = math.max(1L, (targetFileBytes / rowBytes).toLong)
    val total = df.count()
    val files = math.max(1L, math.ceil(total.toDouble / rowsPerFile).toLong)
    df.repartition(files.toInt)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(path)
    rowsPerFile
  }
}
