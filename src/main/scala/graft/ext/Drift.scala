package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift measures for dataset monitoring — the gate a
  * training-data pipeline runs between two snapshots (yesterday's corpus
  * vs today's, holdout vs production) before accepting a refresh.
  *
  * Both statistics here are EXACT under cross-engine replay, by the same
  * discipline as the rest of the repo: all mass terms are integer counts,
  * every comparison/sum happens in BIGINT, and the single final division
  * is one correctly-rounded integer floor-div — no logarithms (PSI's
  * `ln(pa/pb)` would hinge on two libms agreeing to the last ulp), no
  * order-dependent double sums.
  *
  * The reference engine has no statistics surface at all (its analytics
  * stop at Polars aggregate/window calls, /root/reference/src/etl-utils.ts);
  * drift gating is part of the LLM-training-data extension surface.
  */
object Drift {

  /** Total-variation distance between two empirical distributions, in
    * parts-per-million, one row per `grpCol` group.
    *
    * Input: one row per observation with a boolean `inACol` marking which
    * sample it belongs to and an integer `binCol` bucket. Output columns:
    * (`grpCol`, `na`, `nb`, `tvd_ppm`) where
    * `tvd_ppm = ⌊1e6 · ½ Σ_bins |na_i/NA − nb_i/NB|⌋` computed as
    * `(1e6 · Σ|na_i·NB − nb_i·NA|) DIV (2·NA·NB)` — pure BIGINT.
    *
    * TVD is ½·L1: 0 = identical binned distributions, 1e6 = disjoint
    * support. Unlike PSI it needs no smoothing for empty bins and unlike
    * KS it has an exact integer form.
    *
    * 100 TB shape: ONE map-side-combinable groupBy over the raw
    * observations (grp × bin keys); everything after runs on the tiny
    * histogram table (the totals join broadcasts). BIGINT cross-terms
    * bound the exact range to NA·NB < 2^43 per group (~3M×3M); beyond
    * that, lift the two cross-multiplies to DECIMAL(38,0) — same
    * expression tree, still exact.
    */
  def tvdPpm(
      obs: DataFrame,
      grpCol: String,
      inACol: String,
      binCol: String): DataFrame = {
    val hist = obs.groupBy(col(grpCol), col(binCol).as("__bin"))
      .agg(
        sum(when(col(inACol), 1L).otherwise(0L)).as("__na"),
        sum(when(!col(inACol), 1L).otherwise(0L)).as("__nb"))
    val totals = hist.groupBy(col(grpCol))
      .agg(sum("__na").as("__ta"), sum("__nb").as("__tb"))
    hist.join(broadcast(totals), grpCol)
      .groupBy(col(grpCol), col("__ta"), col("__tb"))
      .agg(sum(abs(col("__na") * col("__tb") - col("__nb") * col("__ta")))
        .as("__num"))
      .select(col(grpCol), col("__ta").as("na"), col("__tb").as("nb"),
        when(col("__ta") * col("__tb") === 0L, lit(null))
          .otherwise(expr("(1000000 * __num) DIV (2 * __ta * __tb)"))
          .cast("long").as("tvd_ppm"))
  }

  /** Kolmogorov–Smirnov two-sample statistic per group, in parts-per-
    * million: `ks_ppm = ⌊1e6 · max_x |F_A(x) − F_B(x)|⌋` over the
    * empirical CDFs, computed as `⌊(1e6 · max_x |cumA(x)·NB − cumB(x)·NA|)
    * DIV (NA·NB)⌋` — pure BIGINT, no division until the single final
    * floor-div. KS completes the drift trio: TVD sees binned mass
    * ([[tvdPpm]]), Mann-Whitney sees rank shift ([[mannWhitneyU2]]), KS
    * sees the worst single point of CDF divergence — sensitive to
    * location AND shape changes that leave means and bin masses intact.
    *
    * Input: one row per observation, integer-valued `valCol`, boolean
    * `inACol`. Output: (`grpCol`, `na`, `nb`, `ks_ppm`), null `ks_ppm`
    * when either sample is empty. Supremum over distinct observed values
    * is exact for the two-sample statistic (the CDF difference only
    * changes at sample points).
    *
    * 100 TB shape: one map-side-combinable (grp × value) groupBy collapses
    * the fact table to distinct values before any sort; the running CDFs
    * are a window ordered by value WITHIN each group — per-group sort over
    * distinct values only. A single group whose distinct-value set exceeds
    * one partition substitutes the range-partitioned global-rank machinery
    * (q120) for the window; the arithmetic is unchanged. Totals broadcast.
    */
  def ksPpm(
      obs: DataFrame,
      grpCol: String,
      inACol: String,
      valCol: String): DataFrame = {
    val perVal = obs.groupBy(col(grpCol), col(valCol).as("__v"))
      .agg(
        sum(when(col(inACol), 1L).otherwise(0L)).as("__na"),
        sum(when(!col(inACol), 1L).otherwise(0L)).as("__nb"))
    val wCum = Window.partitionBy(grpCol).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = perVal.groupBy(col(grpCol))
      .agg(sum("__na").as("__ta"), sum("__nb").as("__tb"))
    perVal
      .withColumn("__ca", sum("__na").over(wCum))
      .withColumn("__cb", sum("__nb").over(wCum))
      .join(broadcast(totals), grpCol)
      .groupBy(col(grpCol), col("__ta"), col("__tb"))
      .agg(max(abs(col("__ca").cast("decimal(38,0)") * col("__tb") -
          col("__cb").cast("decimal(38,0)") * col("__ta")))
        .as("__sup"))
      .select(col(grpCol), col("__ta").as("na"), col("__tb").as("nb"),
        // DECIMAL(38,0) lift (the q184 discipline): __sup ≤ ta·tb, so
        // 1e6·__sup would wrap BIGINT once a group exceeds ~3e6 rows
        // per side — far inside the 100 TB envelope
        when(col("__ta") * col("__tb") === 0L, lit(null))
          .otherwise(expr("(CAST(1000000 AS DECIMAL(38,0)) * __sup) " +
            "DIV (CAST(__ta AS DECIMAL(38,0)) * __tb)"))
          .cast("long").as("ks_ppm"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) statistic per group, in the exact
    * doubled form `u2_a = 2·U_A = 2·R_A − NA·(NA+1)` where `R_A` is sample
    * A's rank sum with midrank ties. Doubling keeps ties integral: a tie
    * group starting at rank r with c members has midrank (2r+c−1)/2, so
    * the DOUBLED midrank `2r+c−1` is a BIGINT and the whole statistic is
    * exact — `rank()` supplies r, a count over the tie partition supplies
    * c. (Consumers recover U_A = u2_a/2; the normal-approximation z-score
    * is a client-side formula over (u2_a, na, nb).)
    *
    * Output: (`grpCol`, `na`, `nb`, `u2_a`), one row per group.
    *
    * Scale note: ranking partitions by group, so one group's observations
    * sort within one task chain — right for the usual case (a test over
    * per-group metric samples, thousands-to-millions of rows). For a
    * group too big to sort in one partition, substitute the
    * range-partitioned global rank (the q120 machinery) per group; the
    * statistic's arithmetic is unchanged.
    */
  def mannWhitneyU2(
      obs: DataFrame,
      grpCol: String,
      inACol: String,
      valCol: String): DataFrame = {
    val wRank = Window.partitionBy(grpCol).orderBy(valCol)
    val wTie = Window.partitionBy(grpCol, valCol)
    obs.select(col(grpCol), col(inACol).as("__isa"), col(valCol))
      .withColumn("__rk", rank().over(wRank).cast("long"))
      .withColumn("__ct", count(lit(1)).over(wTie))
      .groupBy(grpCol)
      .agg(
        sum(when(col("__isa"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("__isa"), 1L).otherwise(0L)).as("nb"),
        sum(when(col("__isa"), lit(2L) * col("__rk") + col("__ct") - 1L)
          .otherwise(0L)).as("__r2a"))
      .select(col(grpCol), col("na"), col("nb"),
        (col("__r2a") - col("na") * (col("na") + 1L)).as("u2_a"))
  }

  /** t-closeness distance: Earth-Mover's Distance between each cohort's
    * distribution of an ORDERED, binned sensitive attribute and the
    * global distribution, in ppm of the maximum possible shift. For an
    * ordered attribute with m equi-spaced bins the EMD has the closed
    * form `Σ_b |cumsum_g(b) − cumsum_G(b)| / (m−1)` over probability
    * cumsums — here cross-multiplied to stay integral:
    * `emd_ppm = ⌊1e6 · Σ_b |cg(b)·N − cG(b)·n| / ((m−1)·n·N)⌋`.
    *
    * The third privacy gate beside k-anonymity (cohort too small) and
    * l-diversity (cohort homogeneous): a cohort can pass both yet still
    * leak because its sensitive DISTRIBUTION diverges from the table's
    * (k-anon/l-div see counts, not shape). Output per cohort:
    * (grpCol, `n`, `emd_ppm`, `released` = emd_ppm ≤ tPpm); `emd_ppm`
    * is 0 when the attribute has a single global bin (m = 1).
    *
    * 100 TB shape: two map-side-combinable aggregates collapse the facts
    * to (cohort × bin) and (bin) count tables; the dense grid is a
    * broadcast cross of those SMALL tables (|cohorts|·|bins| rows), the
    * cumsums are windows over ≤ |bins| rows per cohort, and the totals
    * broadcast. Cross-products and the ppm scale ride DECIMAL(38,0)
    * (exact to 1e38 ≈ n·N·(m−1)·1e6 at n, N ≈ 4e14 — beyond any real
    * table), so the gate cannot wrap negative and fail open.
    */
  def emdClosenessPpm(
      obs: DataFrame,
      grpCol: String,
      binCol: String,
      tPpm: Long = 150000L): DataFrame = {
    // distinct aliases per derived frame: all four share obs's lineage,
    // and rejoining same-lineage attributes trips ambiguous resolution
    val cb = obs.groupBy(grpCol, binCol).agg(count(lit(1)).as("c"))
      .select(col(grpCol).as("__cb_g"), col(binCol).as("__cb_b"), col("c"))
    val gb = obs.groupBy(binCol).agg(count(lit(1)).as("g"))
      .select(col(binCol).as("__gb_b"), col("g"))
    val bd = obs.groupBy(grpCol).agg(count(lit(1)).as("n"))
    val tot = obs.agg(count(lit(1)).as("nn"),
      countDistinct(binCol).as("m"))
    val grid = bd.crossJoin(broadcast(gb))
      .join(cb,
        col(grpCol) === col("__cb_g") && col("__gb_b") === col("__cb_b"),
        "left")
      .select(col(grpCol), col("__gb_b").as(binCol), col("n"), col("g"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wB = Window.partitionBy(grpCol).orderBy(binCol)
    // "cg"/"cG" would collide under Spark's case-insensitive resolution
    val cum = grid.select(col(grpCol), col(binCol), col("n"),
      sum("c").over(wB).as("cg"), sum("g").over(wB).as("cgl"))
    // DECIMAL(38,0) lift (the q184 discipline): cg·nn ≤ n·N and the sum
    // of |cum diffs| ≤ (m−1)·n·N, so BIGINT wraps ~6 orders below the
    // 100 TB envelope — and a wrapped NEGATIVE emd_ppm would pass the
    // `≤ tPpm` release gate for exactly the most divergent cohorts
    cum.crossJoin(broadcast(tot))
      .groupBy(grpCol)
      .agg(first("n").as("n"),
        sum(abs(col("cg").cast("decimal(38,0)") * col("nn") -
          col("cgl").cast("decimal(38,0)") * col("n"))).as("__num"),
        first("nn").as("__nn"), first("m").as("__m"))
      .select(col(grpCol), col("n"),
        when(col("__m") <= 1L, 0L)
          .otherwise(expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * __num) " +
              "DIV ((__m - 1) * CAST(n AS DECIMAL(38,0)) * __nn) " +
              "AS BIGINT)"))
          .as("emd_ppm"))
      .withColumn("released", col("emd_ppm") <= tPpm)
  }
}
