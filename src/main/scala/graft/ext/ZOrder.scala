package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for MULTI-dimensional data skipping.
  *
  * A parquet layout sorted on one column prunes scans on that column only:
  * a predicate on a second dimension still touches every file. Interleaving
  * the bits of two key columns into one scalar and range-sorting the write
  * on it bounds BOTH dimensions per file — any contiguous z-range of length
  * 4^k spans at most 2·2^k distinct values of each dimension — so per-file
  * parquet min/max statistics prune 2-D box predicates to O(box/file-span)
  * files instead of all of them. This is the standard clustering trick for
  * multi-tenant / time-series lakes (cluster on (tenant, day), query on
  * either or both); at 100 TB it is the difference between scanning a few
  * hundred MB and the whole table. The interleave is pure integer Column
  * arithmetic (shift / mask / or), fully codegen'd — no UDF — and the
  * write path is `repartitionByRange` + `sortWithinPartitions` on the
  * derived key, i.e. one range shuffle at write time, amortized over every
  * subsequent pruned read.
  *
  * No analogue in the reference (its Polars layer has no layout control);
  * this is a from-scratch scale extension.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of `x` and `y` (both must be
    * non-negative): bit i of x lands at position 2i, bit i of y at 2i+1.
    * Columnar shift/mask/or chain — codegen'd, constant-folded shifts.
    */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** The same interleave as a SQL string over column expressions `x` and
    * `y` — the oracle-replay twin of [[interleave2]], generated from the
    * same loop so the two cannot drift. Uses only `shiftleft` /
    * `shiftright` / `&` / `|`, which parse identically in Spark SQL; for
    * DuckDB pass the result of [[interleave2SqlDuck]] instead (operator
    * shifts).
    */
  def interleave2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(shiftleft(shiftright($x, $i) & 1, ${2 * i}) | " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** DuckDB spelling of [[interleave2Sql]] (`<<` / `>>` operators). */
  def interleave2SqlDuck(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Write `df` to `path` as parquet clustered on the z-order of
    * (`xCol`, `yCol`): derive the Morton key, range-partition into
    * `numFiles` output files, sort within each — every file then covers a
    * contiguous z-range, so its parquet min/max footer stats bound both
    * dimensions tightly. The helper key is dropped before writing (the
    * layout, not the schema, carries the clustering).
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int,
      numFiles: Int): Unit =
    df.withColumn("__z", interleave2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** [[writeZOrdered]]'s Hilbert twin: cluster on the CONTINUOUS curve
    * ([[graft.functions.HilbertIndexExpr]], 16-bit domain — callers
    * scale their dimensions up to it). Each output file covers a
    * contiguous curve range; because the Hilbert curve never takes the
    * Z-curve's diagonal jumps, a file's (x, y) bounding box is tighter
    * at quadrant boundaries — fewer files intersect an axis-aligned box.
    */
  def writeHilbertOrdered(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      numFiles: Int): Unit = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.withColumn("__h",
        org.apache.spark.sql.functions.expr(
          s"graft_hilbert(CAST(`$xCol` AS BIGINT), CAST(`$yCol` AS BIGINT))"))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }
}
