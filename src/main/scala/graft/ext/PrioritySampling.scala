package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Priority sampling (Duffield, Lund, Thorup 2007, "Priority Sampling for
  * Estimation of Arbitrary Subset Sums") — the weight-aware sample that
  * answers ad-hoc subset-sum queries with one fixed-size sample, made
  * fully deterministic (and therefore oracle-replayable) by deriving the
  * "uniform" from md5 instead of an RNG.
  *
  * Per item: pseudo-uniform `u = (md5 % M + 1) / M` ∈ (0,1], priority
  * `q = w / u`; keep the top-k priorities; the (k+1)-th priority is the
  * threshold τ; any subset's sum is estimated by Σ max(w_i, τ) over the
  * sample's members of that subset — unbiased (given uniform u), and
  * deterministic here: same data → same sample → same estimates, on any
  * partitioning or engine.
  *
  * Arithmetic is EXACT end to end: priorities are the integer
  * `w·S div hu` (S = 2^40, hu ≤ 2^30 — fits BIGINT for w up to ~2^22,
  * i.e. cent-scaled values into the millions), and the estimator runs in
  * scaled integers with a DECIMAL(38) sum, so there is no float anywhere
  * a tie or rounding could diverge.
  *
  * Scale shape: the heavy step is a distributed TakeOrdered
  * (`orderBy.limit(k+1)` — per-partition top-(k+1), then a driver-side
  * merge of k+1 rows per partition; NO global sort, NO single-partition
  * window); everything after runs on the (k+1)-row frame.
  */
object PrioritySampling {

  /** Pseudo-uniform resolution: u = hu / M with hu ∈ [1, M]. Public so
    * the estimator's τ de-scaling (priority P = q·S/M, hence
    * τ = P·M/S) stays one set of constants across operator and oracle.
    */
  val M: Long = 1073741824L // 2^30
  val Scale: Long = 1099511627776L // 2^40 priority fixed-point

  /** The top-k priority sample of `df`: original columns plus `_prio`
    * (the integer priority) and `_tau` (the (k+1)-th priority — the
    * estimation threshold, identical on every row; 0 when the input has
    * ≤ k rows, which makes the estimator collapse to the exact sum).
    * `weightCol` must be a positive BIGINT (cent-scale values upstream).
    */
  def prioritySample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "prio"): DataFrame =
    finalizeSample(
      mergeTopK(annotate(df, idCol, weightCol, salt), idCol, k), idCol, k)

  /** Largest admissible weight: `w · Scale` must stay inside BIGINT, or
    * the multiply wraps negative and the HEAVIEST items silently fall to
    * the bottom of the priority order — the exact rows the sample exists
    * to keep. Enforced per row (see [[annotate]]); re-scale upstream
    * (e.g. whole currency units instead of cents) to admit larger
    * weights.
    */
  val MaxWeight: Long = Long.MaxValue / Scale // 2^23 − ε

  /** Add the deterministic integer priority `_prio` to a batch. Weights
    * outside (0, [[MaxWeight]]] fail fast at runtime — a row-level
    * `assert_true` riding the same pass, the BucketedSnapshot null-PK
    * discipline (silent overflow would skew every estimate; silence is
    * the one wrong option).
    */
  def annotate(
      df: DataFrame, idCol: String, weightCol: String,
      salt: String = "prio"): DataFrame = {
    val hu = expr(
      s"CAST(conv(substring(md5(concat('$salt', ':', " +
        s"CAST(`$idCol` AS STRING))), 1, 15), 16, 10) AS BIGINT) % $M + 1")
    val inRange = col(weightCol) > 0L && col(weightCol) <= MaxWeight
    df.filter(coalesce(
        assert_true(inRange,
          lit(s"priority sampling: weight `$weightCol` must be in " +
            s"(0, $MaxWeight] — larger values would overflow the " +
            "fixed-point priority (re-scale the weight upstream)"))
          .cast("boolean"),
        lit(true)))
      .withColumn("_hu", hu)
      .withColumn("_prio", expr(s"(`$weightCol` * ${Scale}L) div _hu"))
      .drop("_hu")
  }

  /** The top-(k+1) rows of an annotated frame by (priority desc, id) —
    * a distributed TakeOrdered. This is the MERGEABLE maintenance state:
    * `mergeTopK(state ∪ annotate(batch))` folds a new batch into the
    * sketch, because priority sampling's sample is a pure top-k of
    * deterministic per-item priorities — streaming ≡ batch, exactly.
    */
  def mergeTopK(annotated: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"priority sampling: k must be >= 1, got $k")
    annotated.orderBy(col("_prio").desc, col(idCol).asc).limit(k + 1)
  }

  /** Split a top-(k+1) state into the k-row sample with the threshold
    * `_tau` attached ((k+1)-th priority; 0 when the input has ≤ k rows —
    * the estimator then collapses to the exact sum). The window ranks at
    * most k+1 rows.
    */
  def finalizeSample(top: DataFrame, idCol: String, k: Int): DataFrame = {
    val ranked = top.withColumn("_rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("_prio").desc, col(idCol).asc)))
    val tau = ranked.filter(col("_rk") === k + 1)
      .select(col("_prio").as("_tau"))
    ranked.filter(col("_rk") <= k).drop("_rk")
      .join(broadcast(tau), lit(true), "left")
      .withColumn("_tau", coalesce(col("_tau"), lit(0L)))
  }

  /** Horvitz–Thompson subset-sum estimates from a [[prioritySample]]
    * result, grouped by `subsetCol`: `n_sampled` members and the
    * estimated subset total of `weightCol` (in the weight's own units,
    * floor-divided out of the fixed point — exact integer arithmetic
    * throughout, DECIMAL(38) against sum overflow).
    */
  def subsetEstimates(
      sample: DataFrame, subsetCol: String, weightCol: String): DataFrame =
    sample
      .groupBy(col(subsetCol))
      .agg(
        count(lit(1)).as("n_sampled"),
        // contribution = max(w, τ_true) where τ_true = _tau·M/S (the
        // integer priority P is q·S/M); compute as
        // max(w·S, _tau·M) / S in DECIMAL(38) — _tau·M reaches 2^86
        expr(
          s"CAST(sum(greatest(CAST(`$weightCol` AS DECIMAL(38,0)) * " +
            s"${Scale}L, CAST(_tau AS DECIMAL(38,0)) * ${M}L)) " +
            s"div ${Scale}L AS BIGINT)")
          .as("est_total"))
}
