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
  * blocked pair set. [[emEstimate]] learns the m/u parameters with a
  * deterministic quantized EM (see its scaladoc) whose only distributed
  * stage is one agreement-pattern histogram.
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

  /** Probability fixed point for [[emEstimate]]: nano-units (10⁻⁹). */
  val Nano: Long = 1000000000L

  /** [[emEstimate]]'s result: learned per-field match/non-match rates
    * (nano-units, clamped to [1, Nano−1]), the match proportion, and the
    * final agreement-pattern posteriors `(gamma, count, gNano)` — enough
    * to classify (posterior ≥ threshold) without rescanning the pairs.
    */
  final case class EmResult(
      fields: Seq[String], m: Seq[Long], u: Seq[Long], p: Long,
      patterns: Seq[(Seq[Option[Int]], Long, Long)])

  /** EM estimation of the Fellegi–Sunter m/u parameters (Winkler 1988's
    * unsupervised fit), made deterministic — and therefore SQL-oracle
    * replayable — by two choices:
    *
    *  1. **Pattern-histogram E-step.** With K comparison fields a pair's
    *     agreement vector is one of ≤ 3^K patterns, so EM never iterates
    *     over pairs: ONE distributed `groupBy(fields).count()` (the only
    *     shuffle, candidate-set-sized) produces the histogram, and every
    *     round folds ≤ 3^K rows — driver-sized by definition, the
    *     Bfs/Sssp/Bpe iterative-operator discipline.
    *  2. **Quantized integer arithmetic.** Probabilities live in BIGINT
    *     nano-units; each likelihood product floor-divides back to scale
    *     after every multiply (`acc = acc·term div Nano`, fields in
    *     declared order), posteriors are `aM·Nano div (aM+aU)`, and
    *     M-step ratios are exact integer divisions of exact integer
    *     sums. No float ever appears, so the learned parameters and
    *     every classification are bit-identical across engines,
    *     partitionings, and replays — DuckDB reproduces the fit with
    *     HUGEINT `//` arithmetic, which is how q262 adjudicates it.
    *
    * Semantics: `fields` are BOOLEAN agreement columns; NULL (field
    * missing on either side) is uninformative — it contributes no
    * likelihood factor and is excluded from that field's M-step counts.
    * Rates clamp to [1, Nano−1] (zero-locking a rate would wedge EM).
    * `rounds` E+M iterations run, then one final E-step fills the
    * returned posteriors. Quantization bias is ≤ K·10⁻⁹ per posterior —
    * far below anything that could flip a link decision with real
    * weights, and the price of exact replayability.
    */
  def emEstimate(
      pairs: DataFrame, fields: Seq[String], rounds: Int,
      initM: Long = 900000000L, initU: Long = 100000000L,
      initP: Long = 100000000L): EmResult = {
    require(fields.nonEmpty && fields.size <= 8,
      "emEstimate: 1..8 comparison fields (pattern space is 3^K)")
    require(rounds >= 1, "emEstimate: at least one EM round")
    val k = fields.size
    val hist = pairs
      .groupBy(fields.map(c => col(c).cast("int")): _*).count()
      .collect()
      .map { r =>
        (Seq.tabulate(k)(i => if (r.isNullAt(i)) None else Some(r.getInt(i))),
          r.getLong(k))
      }
      // deterministic fold order (sums are exact so order cannot change
      // results; sorting just makes the returned patterns stable)
      .sortBy(_._1.map(_.fold("n")(_.toString)).mkString).toSeq
    val m = Array.fill(k)(clamp(initM))
    val u = Array.fill(k)(clamp(initU))
    var p = clamp(initP)
    def eStep(): Seq[(Seq[Option[Int]], Long, Long)] =
      hist.map { case (gamma, cnt) =>
        var aM = BigInt(p)
        var aU = BigInt(Nano - p)
        var i = 0
        while (i < k) {
          gamma(i) match {
            case Some(1) =>
              aM = aM * m(i) / Nano; aU = aU * u(i) / Nano
            case Some(0) =>
              aM = aM * (Nano - m(i)) / Nano; aU = aU * (Nano - u(i)) / Nano
            case _ => ()
          }
          i += 1
        }
        val g = aM * Nano / (aM + aU).max(1)
        (gamma, cnt, g.toLong)
      }
    var r = 0
    while (r < rounds) {
      val gs = eStep()
      var i = 0
      while (i < k) {
        val rel = gs.filter(_._1(i).isDefined)
        val den = rel.map { case (_, c, g) => BigInt(g) * c }.sum
        val num = rel.filter(_._1(i).contains(1))
          .map { case (_, c, g) => BigInt(g) * c }.sum
        val denU = rel.map { case (_, c, g) => BigInt(Nano - g) * c }.sum
        val numU = rel.filter(_._1(i).contains(1))
          .map { case (_, c, g) => BigInt(Nano - g) * c }.sum
        m(i) = clamp((num * Nano / den.max(1)).toLong)
        u(i) = clamp((numU * Nano / denU.max(1)).toLong)
        i += 1
      }
      val tot = hist.map(x => BigInt(x._2)).sum
      p = clamp(
        (gs.map { case (_, c, g) => BigInt(g) * c }.sum / tot.max(1)).toLong)
      r += 1
    }
    EmResult(fields, m.toSeq, u.toSeq, p, eStep())
  }

  private def clamp(x: Long): Long = math.max(1L, math.min(Nano - 1L, x))

  /** One agreement pattern's place on the decision surface: its
    * likelihood-ratio rank statistic (`ratioNano` = aM·Nano div aU —
    * ordering equals the classical P(γ|M)/P(γ|U) order since the prior
    * factor is constant), posterior, pair count, and the decided band.
    */
  final case class BandDecision(
      gamma: Seq[Option[Int]], count: Long, posteriorNano: Long,
      ratioNano: Long, decision: String)

  /** The Fellegi–Sunter TWO-THRESHOLD decision rule (the 1969 paper's
    * optimal linkage rule) from a fitted [[EmResult]]: patterns are
    * ordered by likelihood ratio descending; the LINK band is the
    * largest prefix whose expected false-link mass stays within
    * `muNano` (target P(link | true non-match)), the NON-LINK band the
    * largest suffix whose expected missed-match mass stays within
    * `lambdaNano` (target P(non-link | true match)); everything between
    * is CLERICAL REVIEW — the band the paper proves minimal under the
    * two error constraints.
    *
    * Error masses are EXPECTED COUNTS under the fitted model:
    * a pattern contributes `count·(Nano−g)` non-match mass and
    * `count·g` match mass (g = its posterior), so the prefix test is
    * `Σ count·(Nano−g) ≤ muNano·totU div Nano` with totU the total
    * non-match mass — exact integer arithmetic end to end (BigInt
    * accumulators, floor division), so the surface is bit-replayable by
    * a SQL oracle (q269). Ties in the ratio order break on the gamma
    * vector ascending (None sorts first, as −1); should the two bands
    * overlap (lax targets), LINK wins — each pattern tests the prefix
    * rule first, so the surface is total and deterministic either way.
    *
    * Driver-sized by the same argument as [[emEstimate]]: ≤ 3^K
    * patterns. Returned in gamma order for stable presentation.
    */
  def decisionBands(
      em: EmResult, muNano: Long, lambdaNano: Long): Seq[BandDecision] = {
    require(muNano >= 0 && muNano <= Nano, s"muNano in [0, Nano]: $muNano")
    require(lambdaNano >= 0 && lambdaNano <= Nano,
      s"lambdaNano in [0, Nano]: $lambdaNano")
    val k = em.fields.size
    val rows = em.patterns.map { case (gamma, cnt, g) =>
      var aM = BigInt(em.p)
      var aU = BigInt(Nano - em.p)
      var i = 0
      while (i < k) {
        gamma(i) match {
          case Some(1) =>
            aM = aM * em.m(i) / Nano; aU = aU * em.u(i) / Nano
          case Some(0) =>
            aM = aM * (Nano - em.m(i)) / Nano
            aU = aU * (Nano - em.u(i)) / Nano
          case _ => ()
        }
        i += 1
      }
      val ratio = (aM * Nano / aU.max(1)).toLong
      (gamma, cnt, g, ratio)
    }
    import scala.math.Ordering.Implicits.seqOrdering
    val topOrder = rows.sortBy { case (gamma, _, _, ratio) =>
      (-ratio, gamma.map(_.getOrElse(-1)))
    }
    val totM = rows.map { case (_, c, g, _) => BigInt(g) * c }.sum
    val totU = rows.map { case (_, c, g, _) => BigInt(Nano - g) * c }.sum
    val muMass = BigInt(muNano) * totU / Nano
    val lambdaMass = BigInt(lambdaNano) * totM / Nano
    val inLink = scala.collection.mutable.Set[Seq[Option[Int]]]()
    var cumU = BigInt(0)
    topOrder.foreach { case (gamma, c, g, _) =>
      cumU += BigInt(Nano - g) * c
      if (cumU <= muMass) { inLink += gamma; () }
    }
    val inNonlink = scala.collection.mutable.Set[Seq[Option[Int]]]()
    var cumM = BigInt(0)
    topOrder.reverse.foreach { case (gamma, c, g, _) =>
      cumM += BigInt(g) * c
      if (cumM <= lambdaMass) { inNonlink += gamma; () }
    }
    rows
      .map { case (gamma, c, g, ratio) =>
        val d =
          if (inLink(gamma)) "link"
          else if (inNonlink(gamma)) "nonlink"
          else "review"
        BandDecision(gamma, c, g, ratio, d)
      }
      .sortBy(_.gamma.map(_.getOrElse(-1)))
  }

  /** Field-level golden-record survivorship — the MDM step AFTER linkage
    * decides who is the same entity: matched source records consolidate
    * into ONE record per entity, each field independently picked by a
    * named rule (classic survivorship: trust the best source, trust the
    * freshest value, or trust the consensus). [[classify]]/
    * [[decisionBands]] produce the links; this builds the master record.
    *
    * Rules per field:
    *  - `"priority"`: first NON-NULL value by (priority asc, recency
    *    desc) — "the billing system's value beats the CRM's".
    *  - `"recent"`: first NON-NULL value by (recency desc, priority
    *    asc) — "whoever touched it last".
    *  - `"majority"`: the most frequent non-null value — "consensus
    *    across systems"; count ties break on the value itself.
    *
    * Everything is deterministic: every pick-order ends with the value
    * (as a string) so equal-keyed duplicates cannot flip the pick, and
    * nulls always lose to non-nulls (entities with only nulls for a
    * field get a null golden value). Priority/recent rules ride ONE
    * min_by aggregation over the records (a single entity-keyed
    * shuffle); each majority field adds one (entity, value) count pass —
    * all partial-aggregated, nothing entity-skew-fragile beyond the
    * aggregation itself.
    */
  def goldenRecord(
      records: DataFrame,
      entityCol: String,
      priorityCol: String,
      recencyCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "goldenRecord: at least one field rule")
    val bad = rules.filterNot(r =>
      Set("priority", "recent", "majority").contains(r._2))
    require(bad.isEmpty, s"goldenRecord: unknown rules $bad")
    def pick(f: String, order: String): Column =
      expr(s"min_by($f, struct(cast(isnull($f) as int), $order, " +
        s"coalesce(cast($f as string), '')))").as(f)
    val direct = rules.collect {
      case (f, "priority") =>
        pick(f, s"$priorityCol, -$recencyCol")
      case (f, "recent") =>
        pick(f, s"-$recencyCol, $priorityCol")
    }
    val base = records.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_records"),
        (direct :+ max(col(recencyCol)).as("last_recency")): _*)
    rules.collect { case (f, "majority") => f }
      .foldLeft(base) { (acc, f) =>
        val maj = records.filter(col(f).isNotNull)
          .groupBy(col(entityCol), col(f))
          .agg(count(lit(1)).as("__c"))
          .groupBy(col(entityCol))
          .agg(expr(
            s"min_by($f, struct(-__c, cast($f as string)))").as(f))
        acc.join(maj, Seq(entityCol), "left")
      }
      .select(col(entityCol) +: rules.map(r => col(r._1)) :+
        col("n_records") :+ col("last_recency"): _*)
  }

}
