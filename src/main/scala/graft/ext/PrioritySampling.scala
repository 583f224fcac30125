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

  /** Largest admissible weight on the BIGINT path: `w · Scale` must stay
    * inside BIGINT, or the multiply wraps negative and the HEAVIEST
    * items silently fall to the bottom of the priority order — the exact
    * rows the sample exists to keep. Enforced per row (see [[annotate]]).
    * Heavier corpora (token counts per shard, bytes per asset) should
    * use the capless DECIMAL(38) path ([[annotateWide]] /
    * [[prioritySampleWide]]) instead of re-scaling away precision.
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

  /** The top-(k+1) DISTINCT-id rows of an annotated frame by
    * (priority desc, id) — a distributed TakeOrdered. This is the
    * MERGEABLE maintenance state: `mergeTopK(state ∪ annotate(batch))`
    * folds a new batch into the sketch, because priority sampling's
    * sample is a pure top-k of deterministic per-item priorities —
    * streaming ≡ batch, exactly.
    *
    * Replay safety: under at-least-once micro-batch delivery (state
    * persisted, then the same batch redelivered after a crash) a row can
    * appear in BOTH state and batch. Priorities are deterministic per
    * id, so the duplicate rows are identical — but without dedup the
    * pair would occupy two of the k+1 slots, displace a genuine row and
    * skew τ (the [[graft.ext.Kmv]] merge calls `.distinct()` for the
    * same reason). Each id appears at most TWICE here (state ids are
    * unique by construction; a batch's ids are unique by the sampler's
    * contract), so the true top-(k+1) distinct ids all sit within the
    * top 2(k+1) raw rows: TakeOrdered to 2(k+1), then dedup + re-rank on
    * that driver-sized frame. The full table still never sees a
    * dedup shuffle — the heavy step stays a plain TakeOrdered.
    */
  def mergeTopK(annotated: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"priority sampling: k must be >= 1, got $k")
    val top2 = annotated
      .orderBy(col("_prio").desc, col(idCol).asc).limit(2 * (k + 1))
    // ≤ 2(k+1) rows from here on: windows + filters are driver-cheap.
    // max-priority survivor per id is deterministic (replay duplicates
    // are bit-identical; the (prio desc, id) order is a total order).
    //
    // The at-most-twice contract is ENFORCED, not assumed: the top-2(k+1)
    // coverage bound holds iff each id contributes ≤ 2 rows to the
    // truncated window (a third copy cut off below the limit leaves only
    // 2 visible — bound intact either way), so a third VISIBLE copy is
    // exactly the violation that silently displaces a genuine member.
    // Row-level assert on the same window pass — no extra action.
    val wId = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    top2
      .withColumn("_dup_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("_prio").desc)))
      .withColumn("_dup_n", count(lit(1)).over(wId))
      .filter(coalesce(
        assert_true(col("_dup_n") <= 2,
          lit(s"priority sampling: id `$idCol` appears 3+ times in the " +
            "merge input — state ids are unique and a batch's ids must " +
            "be unique, so merge at most state ∪ ONE batch at a time " +
            "(and dedup batches with duplicate ids upstream)"))
          .cast("boolean"),
        lit(true)))
      .filter(col("_dup_rk") === 1).drop("_dup_rk", "_dup_n")
      .orderBy(col("_prio").desc, col(idCol).asc).limit(k + 1)
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

  /** [[annotate]]'s wide twin: `_prio` is DECIMAL(38,0), admitting ANY
    * positive BIGINT weight (heavy-item corpora — token counts per
    * shard, bytes per asset — blow past [[MaxWeight]]'s ~2²³
    * weight-unit cap). The wide fixed point sets S = M, so a priority
    * IS the item's τ-comparable value in weight units: q = w·M div hu,
    * τ_true = τ·M/S = τ. Max magnitude w·M ≤ 2⁶³·2³⁰ = 2⁹³ ≪ 10³⁸ —
    * no overflow is reachable from BIGINT weights, so no row-level
    * guard is needed (the (0, ∞) positivity check remains).
    */
  def annotateWide(
      df: DataFrame, idCol: String, weightCol: String,
      salt: String = "prio"): DataFrame = {
    val hu = expr(
      s"CAST(conv(substring(md5(concat('$salt', ':', " +
        s"CAST(`$idCol` AS STRING))), 1, 15), 16, 10) AS BIGINT) % $M + 1")
    df.filter(coalesce(
        assert_true(col(weightCol) > 0L,
          lit(s"priority sampling: weight `$weightCol` must be positive"))
          .cast("boolean"),
        lit(true)))
      .withColumn("_hu", hu)
      // floor(a/b) as (a − a%b)/b: Spark's `div` narrows to BIGINT (the
      // exact overflow this path exists to avoid), while decimal `/` of
      // the exactly-divisible numerator is integral and exact — `%` on
      // decimals is exact, the quotient is a whole number at any scale
      .withColumn("_aM",
        expr(s"CAST(`$weightCol` AS DECIMAL(38,0)) * ${M}L"))
      .withColumn("_prio",
        expr("CAST((_aM - _aM % _hu) / _hu AS DECIMAL(38,0))"))
      .drop("_hu", "_aM")
  }

  /** [[prioritySample]] with the wide DECIMAL(38) priority path —
    * identical shape ([[mergeTopK]] and [[finalizeSample]] are
    * type-agnostic over `_prio`), no weight cap.
    */
  def prioritySampleWide(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "prio"): DataFrame =
    finalizeSample(
      mergeTopK(annotateWide(df, idCol, weightCol, salt), idCol, k),
      idCol, k)

  /** Subset-sum estimates for a wide-path sample. With S = M the stored
    * τ is already in weight units, so each member contributes
    * `greatest(w, τ)` directly — DECIMAL(38,0) throughout (k terms of
    * ≤2⁹³ sum well inside 10³⁸), exact, no de-scaling division at all.
    * `est_total` stays DECIMAL(38,0): the sums themselves can exceed
    * BIGINT in the regime this path exists for.
    */
  def subsetEstimatesWide(
      sample: DataFrame, subsetCol: String, weightCol: String): DataFrame =
    sample
      .groupBy(col(subsetCol))
      .agg(
        count(lit(1)).as("n_sampled"),
        expr(
          s"CAST(sum(greatest(CAST(`$weightCol` AS DECIMAL(38,0)), " +
            "CAST(_tau AS DECIMAL(38,0)))) AS DECIMAL(38,0))")
          .as("est_total"))

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
