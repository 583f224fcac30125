package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: fixed-size frequency summaries with a one-sided
  * error guarantee (estimate ≥ true count, overshoot ≤ εN with
  * probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * Completes the mergeable-sketch family beside the HLL distinct-count
  * rollup (q157/q162) and the HDR log-bin quantile histogram (q168):
  * HLL answers "how many distinct", the histogram answers "what
  * quantile", CMS answers "how often does THIS key occur" — without
  * ever shuffling on the key.
  *
  * Unlike HLL (opaque datasketches registers, verified via a tolerance
  * boolean), this CMS is built from md5-derived bucket hashes — the
  * repo's reproducible-hash idiom (`conv(substr(md5(s),1,15),16,10)`,
  * [[Dedup]]) — so a SQL oracle replays the ENTIRE sketch bit-for-bit:
  * build, probe, and min-reduce, the q168 standard of adjudicating the
  * estimates themselves rather than a contract boolean.
  *
  * 100 TB shape: the build is `explode(d)` over the fact rows followed by
  * ONE map-side-combinable groupBy on (row, bucket) — every partition
  * collapses to ≤ d·w partial rows before the exchange, so the only
  * shuffle moves `parts · d · w` counter rows no matter how many fact
  * rows streamed through (the point of a sketch: per-key exact counting
  * would shuffle on the key's full cardinality). Probing joins the
  * candidate keys (small side, broadcast) against the d·w-row sketch.
  *
  * The reference engine has no sketch surface
  * (/root/reference/src/etl-utils.ts stops at Polars aggregates);
  * training-pipeline extension.
  */
object Cms {

  /** Bucket index of `key` for hash row `j`: 60 bits of
    * `md5(j || ':' || key)` mod `width`. Deterministic, engine-portable
    * (DuckDB: `('0x' || substr(md5(j || ':' || key), 1, 15))::BIGINT %
    * width`), and row-independent enough for the CMS bound in practice.
    */
  def bucket(j: Column, key: Column, width: Int): Column =
    pmod(
      conv(substring(
        md5(concat_ws(":", j.cast("string"), key.cast("string"))),
        1, 15), 16, 10).cast("long"),
      lit(width.toLong))

  /** Build the d×w counter table from one observation row per occurrence:
    * output (`j`, `bucket`, `cnt`), at most d·w rows. */
  def sketch(
      obs: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 512): DataFrame =
    obs
      // NULL keys are dropped, matching the documented DuckDB replay
      // (`j || ':' || key` propagates NULL → no bucket); Spark's
      // concat_ws would instead silently hash NULL as md5('<j>')
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), bucket(col("j"), col("__k"), width).as("bucket"))
      .groupBy("j", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate the frequency of each key in `keys` against a built
    * sketch: `est = min_j cnt[j][bucket_j(key)]` (0 when a probed bucket
    * was never touched). Output: (`keyCol`, `est_cnt`). The sketch and
    * the exploded probe rows are both tiny — the join broadcasts. */
  def estimate(
      sk: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 512): DataFrame =
    keys
      .select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket", bucket(col("j"), col(keyCol), width))
      .join(broadcast(sk), Seq("j", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))

  /** Equi-join cardinality estimate from two sketches built with the SAME
    * (depth, width): `est = min_j Σ_b cntA[j][b] · cntB[j][b]` — the
    * AMS/CM inner-product estimator for `|A ⋈ B| = Σ_k fA(k)·fB(k)`.
    * One-sided like the point estimate (collisions only ADD mass, so
    * est ≥ true always). Output: one row, (`est_pairs` BIGINT).
    *
    * This is what a cost-based planner wants BEFORE running the join:
    * both inputs are already collapsed to d·w counters, so the estimate
    * costs an O(d·w) merge regardless of fact cardinality — no shuffle
    * of either input. Counter products fit BIGINT up to ~3·10⁹ rows per
    * bucket pair; lift `cnt` to DECIMAL(38,0) beyond that.
    *
    * Corner: a hash row whose buckets never overlap drops out of the
    * inner join, so the min runs over the remaining rows — that can only
    * RAISE the estimate (the guarantee is unaffected), and it only
    * happens when the true join is near-empty. The oracle replays the
    * same inner-join form, so the adjudicated values agree exactly.
    */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame): DataFrame =
    skA.select(col("j"), col("bucket"), col("cnt").as("cnt_a"))
      .join(skB.select(col("j"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("j", "bucket"))
      .groupBy("j")
      .agg(sum(col("cnt_a") * col("cnt_b")).as("ip"))
      // NO shared bucket at all (an empty input sketch) means the true
      // join is 0: report 0, not NULL — the one-sided bound must hold
      .agg(coalesce(min("ip"), lit(0L)).cast("long").as("est_pairs"))
}
