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
}
