package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007, "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations") — the MERGEABLE sketch family member whose SET
  * OPERATIONS (union, intersection) come out of the sketch itself, where
  * HLL needs inclusion–exclusion with compounding error.
  *
  * Determinism: item hashes are md5-derived integers in [0, 2^60), so a
  * sketch is a pure function of the data — same rows, same sketch, same
  * estimates, any partitioning or engine. That makes every estimate
  * oracle-adjudicable by VALUE (the SQL replays hashing, the k-min
  * selection, and the estimator), not by tolerance band.
  *
  * Estimators (exact integer arithmetic, floor division):
  *  - distinct(A) = (k−1)·M / h_k when the sketch is full (h_k = k-th
  *    minimum hash, M = 2^60); the EXACT distinct count when fewer than
  *    k distinct hashes exist (the sketch then IS the value set);
  *  - union: the k smallest of the merged hash sets — a KMV sketch of
  *    A ∪ B by construction;
  *  - intersection: with θ = the union sketch's k-th min, the hashes
  *    below θ seen in BOTH sketches are a uniform sample of A ∪ B, so
  *    |A∩B| ≈ common/k · distinct(A∪B) (Jaccard via the shared sample).
  *
  * Scale shape: sketch construction is one hash projection + one
  * per-group top-k window (single keyed shuffle of (group, hash) pairs —
  * the values themselves never move); everything after runs on k-row
  * sketches.
  */
object Kmv {

  /** Hash domain: [0, 2^60) — headroom under BIGINT for the (k−1)·M
    * numerator in DECIMAL(38).
    */
  val M: Long = 1152921504606846976L // 2^60

  /** Per-group KMV sketch rows: (groupCol, h, rk) with rk ∈ [1, k] over
    * DISTINCT hashes ascending. Fewer than k rows ⟺ the group has fewer
    * than k distinct values (the sketch is then exact).
    */
  def sketch(
      df: DataFrame, groupCol: String, valueCol: String, k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"kmv: k must be >= 2, got $k")
    val h = expr(
      s"CAST(conv(substring(md5(concat('$salt', ':', " +
        s"CAST(`$valueCol` AS STRING))), 1, 15), 16, 10) AS BIGINT) % ${M}L")
    merge(df.select(col(groupCol), h.as("h")), groupCol, k)
  }

  /** The per-group bottom-k selection over DISTINCT hashes — THE merge
    * operation of the sketch family, shared by construction ([[sketch]])
    * and by streaming maintenance (state ∪ batch → merge): one rule, so
    * a maintained sketch can never drift from the one-shot sketch.
    * Input rows are (groupCol, h); output adds `rk` ∈ [1, k].
    */
  def merge(rows: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kmv: k must be >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("h").asc)
    rows.select(col(groupCol), col("h"))
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Distinct-count estimates from [[sketch]] rows: one row per group
    * with `est_distinct` — exact when the sketch isn't full, else
    * (k−1)·M div h_k.
    */
  def estimateDistinct(sk: DataFrame, groupCol: String, k: Int): DataFrame =
    sk.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("rk") === k, col("h"))).as("hk"))
      .select(col(groupCol),
        when(col("hk").isNull, col("n_kept"))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * ${M}L div hk " +
              "AS BIGINT)"))
          .as("est_distinct"))

  /** All-pairs sketch-land guard: the pairwise estimators build the full
    * (a < b) group grid — that is their CONTRACT (sketch-land
    * cardinalities: tens to thousands of groups, k-row sketches), but
    * nothing in the dataflow itself stops a caller handing them 10⁵
    * groups and a 10¹⁰-pair grid. The estimators attach a lazy group
    * count (a broadcast 1-row aggregate riding the estimator's own job)
    * and fail fast past this default; raise `maxGroups` explicitly to
    * accept the quadratic cost knowingly.
    */
  val DefaultMaxGroups: Int = 2048

  /** Attach the group-count guard UPSTREAM of the pair grid: a broadcast
    * 1-row count joined onto the distinct-GROUPS frame (|groups| rows)
    * with a row-level `assert_true`, so the check evaluates while the
    * grid join SCANS its inputs — BEFORE the quadratic (pairs × sketch)
    * output materializes or shuffles. Past maxGroups the job dies at
    * O(|groups|) rows scanned, not after paying (and possibly dying on)
    * a 10¹⁰-pair grid. Still lazy: the guard rides the estimator's own
    * job rather than forcing a separate eager action that would
    * re-evaluate the (usually un-cached) sketch dataflow once more.
    */
  private def guardedGroups(
      sk: DataFrame, groupCol: String, maxGroups: Int): DataFrame = {
    val groups = sk.select(col(groupCol)).distinct()
    val n = groups.agg(count(lit(1)).as("_n_groups"))
    groups.crossJoin(broadcast(n))
      .filter(coalesce(
        assert_true(col("_n_groups") <= maxGroups,
          concat(lit("kmv: "), col("_n_groups").cast("string"),
            lit(" groups would form a quadratic sketch-pair grid — " +
              s"beyond maxGroups=$maxGroups. Pre-filter the groups of " +
              "interest or raise maxGroups to accept the all-pairs " +
              "grid deliberately")))
          .cast("boolean"),
        lit(true)))
      .drop("_n_groups")
  }

  /** The merged (a < b) pair sketch: per pair, the k smallest hashes of
    * the two sketches' union, each flagged with which side(s) carried it
    * — the shared uniform sample every pairwise estimator reads. The
    * maxGroups guard sits on the grid's INPUT frames (see
    * [[guardedGroups]]) so an oversized group set fails fast.
    */
  private def rankedUnion(
      sk: DataFrame, groupCol: String, k: Int, maxGroups: Int): DataFrame = {
    val a = sk.select(col(groupCol).as("ga"), col("h"))
    val b = sk.select(col(groupCol).as("gb"), col("h"))
    val guarded = guardedGroups(sk, groupCol, maxGroups)
    val pairs = guarded.select(col(groupCol).as("ga"))
      .join(guarded.select(col(groupCol).as("gb")),
        col("ga") < col("gb"))
    val aSide = pairs.join(a, Seq("ga"))
      .select(col("ga"), col("gb"), col("h"), lit(1).as("in_a"),
        lit(0).as("in_b"))
    val bSide = pairs.join(b, Seq("gb"))
      .select(col("ga"), col("gb"), col("h"), lit(0).as("in_a"),
        lit(1).as("in_b"))
    val uni = aSide.unionByName(bSide)
      .groupBy("ga", "gb", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb")).orderBy(col("h").asc)
    uni.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** `(k−1)·M div hk` when the union sketch is full, else the exact kept
    * count — the one union-size rule all pairwise estimators share.
    */
  private def unionSizeExpr(k: Int): org.apache.spark.sql.Column =
    when(col("hk").isNull, col("n_kept"))
      .otherwise(expr(
        s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * ${M}L div hk AS BIGINT)"))

  /** Pairwise union + intersection estimates between every pair of
    * groups (a < b): merges the two sketches, takes the k smallest of
    * the merge as the union sketch, counts the shared hashes below its
    * θ, and derives |A∪B| and |A∩B|. Runs entirely on k-row sketches.
    */
  def setEstimates(
      sk: DataFrame, groupCol: String, k: Int,
      maxGroups: Int = DefaultMaxGroups): DataFrame = {
    rankedUnion(sk, groupCol, k, maxGroups)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("rk") === k, col("h"))).as("hk"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("common"))
      .select(col("ga"), col("gb"),
        unionSizeExpr(k).as("est_union"),
        // |A∩B| ≈ common/k' · |A∪B| with k' = rows actually kept
        expr("CAST(common * (CASE WHEN hk IS NULL THEN n_kept ELSE " +
          s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * ${M}L div hk AS BIGINT) " +
          "END) div n_kept AS BIGINT)").as("est_intersect"))
  }

  /** Pairwise DIFFERENCE estimates — |A∖B| and |B∖A| per (a < b) pair,
    * completing the sketch set algebra (union q258, intersection q258,
    * difference here). Same shared-sample argument as intersection: of
    * the union sketch's k' hashes, those seen ONLY in A's sketch are a
    * uniform sample of A∖B inside A∪B, so
    * |A∖B| ≈ only_a/k' · |A∪B| — one estimate where a
    * subtract-the-estimates approach (|A| − |A∩B|) compounds two. Exact
    * (and exactly consistent: est_a_not_b + est_b_not_a + est_intersect
    * sums to the union ONLY up to floor rounding) when the union sketch
    * isn't full. Runs entirely on k-row sketches.
    */
  def differenceEstimates(
      sk: DataFrame, groupCol: String, k: Int,
      maxGroups: Int = DefaultMaxGroups): DataFrame = {
    rankedUnion(sk, groupCol, k, maxGroups)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("rk") === k, col("h"))).as("hk"),
        sum(when(col("in_a") === 1 && col("in_b") === 0, 1L)
          .otherwise(0L)).as("only_a"),
        sum(when(col("in_a") === 0 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("only_b"))
      .withColumn("est_union", unionSizeExpr(k))
      .select(col("ga"), col("gb"),
        expr("CAST(only_a * est_union div n_kept AS BIGINT)")
          .as("est_a_not_b"),
        expr("CAST(only_b * est_union div n_kept AS BIGINT)")
          .as("est_b_not_a"))
  }

  /** The FULL pairwise set algebra in ONE pass: per (a < b) pair,
    * `est_union`, `est_intersect`, `est_a_not_b`, `est_b_not_a` — the
    * row a profile dashboard actually asks for. [[setEstimates]] and
    * [[differenceEstimates]] each rebuild the merged pair sketch
    * ([[rankedUnion]]) from scratch, so calling both pays the
    * (pairs × sketch) shuffle twice; this computes the shared sample
    * once and reads all four estimators off ONE aggregation — same
    * single keyed shuffle + one groupBy, half the sketch-land work.
    *
    * Results are DEFINED to be byte-identical to the two separate
    * calls: every output column is the same integer expression over the
    * same (n_kept, hk, common/only_a/only_b) aggregates, floor division
    * and all, so `setAlgebra(sk) ≡ setEstimates(sk) ⋈ differenceEstimates
    * (sk)` exactly (pinned by KmvSpec and the q268 oracle).
    */
  def setAlgebra(
      sk: DataFrame, groupCol: String, k: Int,
      maxGroups: Int = DefaultMaxGroups): DataFrame = {
    rankedUnion(sk, groupCol, k, maxGroups)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("rk") === k, col("h"))).as("hk"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("common"),
        sum(when(col("in_a") === 1 && col("in_b") === 0, 1L)
          .otherwise(0L)).as("only_a"),
        sum(when(col("in_a") === 0 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("only_b"))
      .withColumn("est_union", unionSizeExpr(k))
      .select(col("ga"), col("gb"),
        col("est_union"),
        expr("CAST(common * est_union div n_kept AS BIGINT)")
          .as("est_intersect"),
        expr("CAST(only_a * est_union div n_kept AS BIGINT)")
          .as("est_a_not_b"),
        expr("CAST(only_b * est_union div n_kept AS BIGINT)")
          .as("est_b_not_a"))
  }
}
