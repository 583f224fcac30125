package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile sketch — the missing member of the
  * sketch family beside KMV (distinct sets), CMS/Misra–Gries (heavy
  * hitters), and HLL (cardinality): per group, keep the `k` rows whose
  * deterministic rank hash (`md5`-derived, namespace `qsk:`) is SMALLEST
  * — a bottom-k-by-hash uniform row sample, read as a sample of the
  * VALUE DISTRIBUTION rather than of the distinct set (the bottom-k
  * sketch of Cohen & Kaplan 2007, applied to rank/quantile estimation).
  * A quantile estimate is the sample's order statistic at the scaled
  * rank; rank error concentrates at O(1/√k).
  *
  * Why bottom-k and not GK/KLL/t-digest: those structures are either
  * merge-order-dependent (t-digest), randomized (KLL), or not cleanly
  * mergeable (GK). Bottom-k by a deterministic hash is EXACTLY
  * mergeable — the bottom-k of a union is the bottom-k of the union of
  * bottom-ks, regardless of split or order — so a maintained sketch
  * equals the one-shot build bit-for-bit (the q256 stream ≡ batch
  * discipline), and every estimate is engine-replayable (no RNG, no
  * float centroids). Groups with ≤ k rows keep every row, so their
  * "estimates" are exact order statistics.
  *
  * 100 TB shape: annotation is map-side (one md5 per row); the sketch is
  * one per-group top-k window over (hash, id) — rank rows carry only
  * (group, id, value, hash), never the payload; merges/folds are
  * union + re-top-k over ≤ 2k rows per group of state. Estimates rank
  * ≤ k rows per group and join a broadcast-sized percentile list.
  */
object QuantileSketch {

  /** Deterministic per-row rank hash in the `qsk:` namespace. */
  def rankHash(idCol: String): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit("qsk:"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")

  /** Attach the rank hash (idempotent input shape for [[sketch]]). */
  def annotate(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("__rh", rankHash(idCol))

  /** Per-group bottom-k rows by (rank hash, id) — the sketch. Pure
    * top-k, so re-sketching a union of sketches IS the merge.
    */
  def sketch(
      annotated: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"QuantileSketch.sketch: k must be >= 1, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__rh"), col(idCol))
    annotated.withColumn("__sk_rk", row_number().over(w))
      .filter(col("__sk_rk") <= k)
      .drop("__sk_rk")
  }

  /** Merge two sketches (or fold a sketched batch into state): union,
    * re-top-k. Exact by the bottom-k property.
    */
  def merge(
      a: DataFrame, b: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int): DataFrame =
    sketch(a.unionByName(b), groupCols, idCol, k)

  /** Quantile estimates off a sketch (or exact order statistics off a
    * full annotated frame): for each percentile p, the sample value at
    * rank `⌈p·n/100⌉` (ties and ordering on (value, id) — total, so any
    * engine replays the same pick). Returns one row per (group, pct)
    * with the sample size the estimate was read from.
    */
  def estimates(
      sk: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"QuantileSketch.estimates: pcts must be in [1, 100], got $pcts")
    require(pcts.distinct.size == pcts.size,
      s"QuantileSketch.estimates: duplicate pcts would duplicate rows: $pcts")
    val g = groupCols.map(col)
    val wv = Window.partitionBy(g: _*).orderBy(col(valueCol), col(idCol))
    val wn = Window.partitionBy(g: _*)
    sk.withColumn("__vr", row_number().over(wv))
      .withColumn("__n", count(lit(1)).over(wn))
      .select(g ++ Seq(col(valueCol), col("__vr"), col("__n")): _*)
      .withColumn("pct", explode(array(pcts.map(lit): _*)))
      .filter(col("__vr") === expr("(pct * __n + 99) div 100"))
      .select(g ++ Seq(col("pct").cast("long").as("pct"),
        col("__n").as("sample_n"), col(valueCol).as("q_value")): _*)
  }
}
