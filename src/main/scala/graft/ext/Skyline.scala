package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows no other row beats on BOTH
  * dimensions — maximize `xCol`, minimize `yCol`.
  *
  * Distributed shape: a LOCAL sort-based sweep per shuffle partition
  * (window over `spark_partition_id`) prunes the bulk of dominated points
  * where they live; the GLOBAL single-partition sweep then runs over only
  * the local survivors. Local pruning can never remove a global skyline
  * point — a dominator in the same partition dominates globally too — so
  * the partition-dependent intermediate converges to a partition-invariant
  * result (SkylineSpec proves invariance across repartitionings against a
  * brute-force dominance filter). The global sweep's input is the union of
  * per-partition skylines, which for real distributions is tiny; the
  * single-partition window is a barrier over survivors, not the data.
  *
  * Both sweeps are the same running-min formulation: order
  * (x desc, y asc, id), keep a point iff its y is strictly below every
  * predecessor's running min. The strict `<` also canonically drops
  * coincident duplicate points (neither dominates the other; the first by
  * id wins) — a deterministic dedup the oracle replays identically.
  *
  * No reference analogue (the reference has no skyline operator); this is
  * a training-pipeline extension (e.g. pick documents maximizing quality
  * while minimizing cost with no scalarization weights).
  */
object Skyline {

  /** One sort-based sweep within each `part` group (empty = global). */
  private def sweep(df: DataFrame, part: Seq[Column], x: String, y: String,
      id: String): DataFrame = {
    val w = Window.partitionBy(part: _*)
      .orderBy(col(x).desc, col(y), col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prev_min", min(y).over(w))
      .filter(col("__prev_min").isNull || col(y) < col("__prev_min"))
      .drop("__prev_min")
  }

  /** Skyline of `df` maximizing `xCol`, minimizing `yCol`; `idCol` is the
    * unique tie-break key. Output keeps the input columns.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
      idCol: String): DataFrame = {
    val local = sweep(df.withColumn("__p", spark_partition_id()),
      Seq(col("__p")), xCol, yCol, idCol).drop("__p")
    sweep(local, Seq.empty, xCol, yCol, idCol)
  }
}
