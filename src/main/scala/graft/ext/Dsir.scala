package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-shaped data selection — importance scoring of a source corpus
  * against a target distribution over hashed n-gram features (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling"),
  * made fully deterministic so the whole selection is oracle-replayable:
  *
  *  - features are hashed unigram buckets (md5 % `buckets` — the paper's
  *    hashed bag-of-words), presence-per-document;
  *  - each feature's importance ratio is the add-one-smoothed target/source
  *    document-frequency ratio in 2²⁰ fixed point,
  *    `(t_f+1)·2²⁰ div (s_f+1)`;
  *  - a document's score is the SUM of integer log₂ ratios over its
  *    distinct features (`length(bin(ratio))−1−20` — the same libm-free
  *    floor-log₂ as q232's surprisal), i.e. the log importance weight
  *    quantized to whole bits. Integer sums are exact and
  *    order-independent, so scores — and the top-N selection under the
  *    (score desc, id asc) total order — are bit-identical across
  *    engines and partitionings. The paper's Gumbel-noise resampling
  *    step is replaced by deterministic top-N selection (the
  *    temperature-0 limit); q209's temperature mixture is the knob for
  *    softening a mixture when that is wanted.
  *
  * Scale shape: one explode+distinct shuffle for (doc, feature) pairs,
  * one `buckets`-row feature-count aggregate, a BROADCAST join of that
  * tiny ratio table back onto the pairs, one per-doc sum, and a
  * distributed TakeOrdered for the selection — no stage ever keys on
  * anything wider than (doc, feature). [[importanceScores]] derives both
  * branches from one pair expression; unpersisted, that costs two corpus
  * scans — at 100 TB materialize [[hashedFeatures]] once upstream and
  * feed [[scoresFromPairs]] instead.
  */
object Dsir {

  /** 2²⁰ ratio fixed point; its log₂ (20) is subtracted from each
    * feature's integer bit score so ratios below 1 score negative.
    */
  val RatioScaleBits: Int = 20

  private def tokens(textCol: String): Column =
    filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "")

  private def featExpr(buckets: Int, salt: String): Column =
    expr(s"CAST(conv(substring(md5(concat('$salt', ':', tok)), 1, 15)," +
      s" 16, 10) AS BIGINT) % $buckets")

  /** Distinct (id, carry..., feat) presence pairs: hashed unigram
    * buckets — the corpus's feature representation, one explode+distinct
    * shuffle.
    */
  def hashedFeatures(
      docs: DataFrame, idCol: String, textCol: String, buckets: Int,
      salt: String = "dsir", carryCols: Seq[String] = Nil): DataFrame = {
    require(buckets >= 2, s"dsir: buckets must be >= 2, got $buckets")
    docs
      .select((col(idCol) +: carryCols.map(col)) :+
        explode(tokens(textCol)).as("tok"): _*)
      .select((col(idCol) +: carryCols.map(col)) :+
        featExpr(buckets, salt).as("feat"): _*)
      .distinct()
  }

  /** The (feat, t_c, s_c) COUNT table from presence pairs that carry a
    * boolean target flag — the sufficient statistic of the whole DSIR
    * fit. Counts are integer sums, so the table is exactly MERGEABLE
    * ([[mergeCounts]]): a maintained table over any ingest split equals
    * the one-shot table, and therefore so do the bit scores and the
    * selection.
    */
  def countsFromPairs(pairs: DataFrame, targetFlag: String): DataFrame =
    pairs.groupBy("feat")
      .agg(
        count(when(col(targetFlag), lit(1))).as("t_c"),
        count(lit(1)).as("s_c"))

  /** The fold rule for maintained count tables: union + per-feature sum.
    * Integer addition is associative and commutative, so ANY fold order
    * over any batch split yields the identical table — the stream ≡
    * batch guarantee is arithmetic, not a convention.
    */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("feat")
      .agg(sum("t_c").as("t_c"), sum("s_c").as("s_c"))

  /** Bit scores off a (feat, t_c, s_c) count table: per feature,
    * `length(bin((t+1)·2²⁰ div (s+1)))−1−RatioScaleBits`.
    */
  def bitsFromCounts(counts: DataFrame): DataFrame =
    counts.select(col("feat"),
      (length(bin(expr(
        s"((t_c + 1) * ${1L << RatioScaleBits}L) div (s_c + 1)")))
        - 1 - RatioScaleBits).cast("long").as("bits"))

  /** The `buckets`-row integer bit-score table from presence pairs that
    * carry a boolean target flag (one-shot form of
    * [[countsFromPairs]] → [[bitsFromCounts]]).
    */
  def bitsFromPairs(pairs: DataFrame, targetFlag: String): DataFrame =
    bitsFromCounts(countsFromPairs(pairs, targetFlag))

  /** Per-document scores from presence pairs and a bit table: broadcast
    * join (the bit table is `buckets` rows) + one per-doc sum.
    */
  def scoresFromPairs(
      pairs: DataFrame, bits: DataFrame, idCol: String,
      carryCols: Seq[String] = Nil): DataFrame =
    pairs.join(broadcast(bits), Seq("feat"))
      .groupBy((col(idCol) +: carryCols.map(col)): _*)
      .agg(sum("bits").as("score_bits"),
        count(lit(1)).as("n_feats"))

  /** One-call scoring: build pairs with the target flag, derive the bit
    * table, score every document. `targetPred` marks the target
    * subcorpus (evaluated against the doc frame's columns).
    */
  def importanceScores(
      docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int, salt: String = "dsir",
      carryCols: Seq[String] = Nil): DataFrame = {
    val pairs = hashedFeatures(
      docs.withColumn("_dsir_target", targetPred), idCol, textCol,
      buckets, salt, carryCols :+ "_dsir_target")
    val bits = bitsFromPairs(pairs, "_dsir_target")
    scoresFromPairs(pairs, bits, idCol, carryCols)
  }

  /** Deterministic top-N selection under (score desc, id asc) — the
    * temperature-0 resample; a distributed TakeOrdered, no global sort.
    */
  def selectTopN(scored: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"dsir: n must be >= 1, got $n")
    scored.orderBy(col("score_bits").desc, col(idCol).asc).limit(n)
  }
}
