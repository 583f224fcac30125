package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record-linkage scoring (Fellegi & Sunter 1969, "A
  * Theory for Record Linkage") — the decision layer of entity resolution,
  * Spark-first and fully deterministic.
  *
  * The classical method: for each compared field f, an agreeing pair
  * contributes the match weight log(m_f/u_f) and a disagreeing pair the
  * non-match weight log((1−m_f)/(1−u_f)); the pair's total score against
  * a threshold decides link / non-link. This implementation takes the
  * weights as FIXED integer milli-units (the production pattern when m/u
  * come from a prior estimation run or domain calibration): integer
  * addition is exact and order-independent, so scores — and therefore
  * link decisions — are bit-identical across engines and partitionings,
  * which is what lets a SQL oracle adjudicate the full pipeline.
  *
  * Scale shape: [[blockedCandidates]] is an equi-join on the blocking
  * key (candidates Σ|block|², never |L|×|R|); scoring is a codegen'd
  * projection over the candidate pairs; no stage sees more than the
  * blocked pair set. EM-based m/u ESTIMATION is out of scope (it needs
  * iterative soft counts; the fixed-weight form is the score/decide
  * primitive it would feed).
  *
  * Reference scope: gluestick has no linkage (the reference is a
  * tap-to-table ETL layer); this extends the dedup/ER family (q87's
  * blocked fuzzy match, q57's duplicate clusters) with the weighted
  * decision model.
  */
object RecordLinkage {

  /** Candidate pairs by blocking-key equality: `left` and `right` must
    * already expose the blocking columns under the SAME names; all other
    * columns survive with their original names (callers alias to avoid
    * collisions). The blocked join is the Σ|block|² guard — at 100 TB
    * the block key (postcode, name prefix, …) is what keeps linkage off
    * the cross product.
    */
  def blockedCandidates(
      left: DataFrame, right: DataFrame,
      blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty, "blocking requires at least one column")
    left.join(right, blockCols)
  }

  /** Add `score_milli`: Σ over fields of (agreeWeight if the agreement
    * column is true, else disagreeWeight). `fields` maps an agreement
    * BOOLEAN column → (agreeMilli, disagreeMilli). A NULL agreement
    * (either side missing the field) contributes ZERO — the classical
    * "missing is uninformative" convention, not a disagreement.
    */
  def fsScore(
      pairs: DataFrame,
      fields: Seq[(String, (Int, Int))]): DataFrame = {
    require(fields.nonEmpty, "fsScore requires at least one field")
    val score: Column = fields.map { case (c, (agree, disagree)) =>
      when(col(c).isNull, lit(0L))
        .when(col(c), lit(agree.toLong))
        .otherwise(lit(disagree.toLong))
    }.reduce(_ + _)
    pairs.withColumn("score_milli", score)
  }

  /** Score and classify in one pass: `is_link = score_milli >= threshold`. */
  def classify(
      pairs: DataFrame,
      fields: Seq[(String, (Int, Int))],
      thresholdMilli: Long): DataFrame =
    fsScore(pairs, fields)
      .withColumn("is_link", col("score_milli") >= thresholdMilli)
}
