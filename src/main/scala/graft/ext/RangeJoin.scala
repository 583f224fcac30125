package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via bucket decomposition — the trick
  * that turns an otherwise un-partitionable theta join (`lo <= t AND
  * t < hi`) into an equi-join Spark can hash-partition: each interval
  * explodes into the fixed-width buckets it covers, each point maps to
  * exactly ONE bucket, the join runs on the bucket key, and the original
  * containment predicate filters inside the matched bucket.
  *
  * Why it scales: a naive theta join is a broadcast nested loop (or a full
  * cartesian) — dead at 100 TB. Here both sides shuffle ONCE on an integer
  * bucket key; fan-out is `ceil(span / bucketWidth)` rows per interval, so
  * the width tunes replication vs per-bucket selectivity (width ≈ median
  * interval span is the usual sweet spot). Because a point lands in ONE
  * bucket, matched pairs are emitted exactly once — no dedup pass.
  */
object RangeJoin {

  /** Exact floor division for long positions, negative-safe: going
    * through double (floor(v / w)) loses integer precision above 2^53 —
    * at nanosecond-epoch magnitudes two values within `eps` could land
    * 2 buckets apart and silently miss the ± 1 explode. `pmod` is
    * non-negative, so `(v − pmod(v, w)) / w` is an exact multiple.
    */
  private def floorDiv(c: Column, w: Long): Column = {
    val v = c.cast("long")
    // (v − pmod) is an exact multiple of w; divide in DECIMAL (Column./
    // on longs is IEEE-double division, inexact past 2^53)
    ((v - pmod(v, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")
  }

  /** Join `points` (integer position `tCol`) to `intervals` (half-open
    * [`loCol`, `hiCol`)) with `how` semantics ("inner" or "left" — left
    * emits each point-free interval exactly ONCE with null point columns,
    * the true left-join contract; it requires interval rows to be
    * distinct, since unmatched intervals are recovered by an anti-join on
    * all interval columns). Positions are integral (epoch
    * days/seconds/µs — caller's choice of unit).
    */
  def pointInInterval(
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      points: DataFrame,
      tCol: String,
      bucketWidth: Long,
      how: String = "inner"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(how == "inner" || how == "left", s"unsupported join type: $how")
    def bucketOf(c: Column): Column = floorDiv(c, bucketWidth)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)),
        bucketOf(col(hiCol).cast("long") - 1))))
    val pts = points.withColumn("__bucket", bucketOf(col(tCol)))
    val contained = col(tCol).isNotNull &&
      col(tCol) >= col(loCol) && col(tCol) < col(hiCol)
    val inner = iv.join(pts, Seq("__bucket")).where(contained)
      .drop("__bucket")
    if (how == "inner") inner
    else {
      val ivCols = intervals.columns.toSeq
      val unmatched = intervals
        .join(inner.select(ivCols.map(col): _*).distinct(), ivCols,
          "left_anti")
      val withNulls = points.schema.fields.foldLeft(unmatched) { (df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType))
      }
      inner.unionByName(withNulls.select(inner.columns.map(col): _*))
    }
  }

  /** Numeric band join: pair rows of `left` and `right` whose integer
    * values differ by at most `eps` (`|lv − rv| ≤ eps`), optionally
    * within equi-key groups (`keys`). Same bucket decomposition as
    * [[pointInInterval]], specialized to the symmetric-band predicate:
    * the LEFT side maps to its single `eps`-wide bucket, the RIGHT side
    * explodes to its bucket ± 1 — any pair within `eps` differs by at
    * most one bucket, so the equi-join has complete recall, each pair
    * matches exactly one exploded row (no dedup pass), and the exact
    * band predicate filters inside the bucket.
    *
    * Why it scales: the naive form is a theta join (broadcast nested
    * loop / cartesian — dead at 100 TB); this is ONE shuffle per side on
    * (keys, bucket) with a fixed 3× fan-out on the right, AQE-splittable
    * like any equi-join. Columns of both inputs survive; callers alias
    * to avoid collisions.
    */
  def bandJoin(
      left: DataFrame, lvCol: String,
      right: DataFrame, rvCol: String,
      eps: Long,
      keys: Seq[String] = Seq.empty): DataFrame = {
    require(eps > 0, "bandJoin: eps must be positive")
    def bucketOf(c: Column): Column = floorDiv(c, eps)
    val l = left.withColumn("__bucket", bucketOf(col(lvCol)))
    val r = right.withColumn("__rb", bucketOf(col(rvCol)))
      .withColumn("__bucket",
        explode(array(col("__rb") - 1, col("__rb"), col("__rb") + 1)))
      .drop("__rb")
    l.join(r, keys :+ "__bucket")
      .where(abs(col(lvCol) - col(rvCol)) <= eps)
      .drop("__bucket")
  }
}
