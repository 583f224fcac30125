package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer induction (Kudo 2018,
  * "Subword Regularization") — the OTHER vocabulary-training family real
  * pipelines run beside BPE ([[Bpe]]), expressed Spark-first and made
  * fully deterministic with the q262 exact-integer-EM discipline:
  *
  *  - **Seeding**: every substring of the word dictionary up to
  *    `maxPieceLen` chars, counted by corpus frequency; the seed vocab
  *    keeps ALL single characters (the coverage guarantee — every word
  *    stays segmentable forever) plus the top `multiKeep` multi-char
  *    pieces by (count desc, piece asc).
  *  - **Hard-EM rounds** ([[train]], Viterbi E-step — the `--hard_em`
  *    variant) and **soft-EM rounds** ([[trainSoft]], the true
  *    forward-backward expected counts, replayable after all: the DP's
  *    floats are ordered IEEE chains, the per-occurrence posteriors are
  *    fixed-pointed before any cross-word sum): each round derives a
  *    piece cost in WHOLE BITS from its current count with add-one
  *    smoothing, `cost = 21 − length(bin((cnt+1)·2²⁰ div (tot+|V|)))` —
  *    the libm-free floor-log₂ surprisal q232/q264 established — then
  *    segments every dictionary word by Viterbi under (total cost,
  *    piece count, segmentation string) lexicographic order (a TOTAL,
  *    prefix-monotone order: ties in cost prefer fewer pieces, then the
  *    byte-wise smallest segmentation — so the best path is unique and
  *    engine-independent), recounts pieces from the best segmentations,
  *    and PRUNES back to single chars + the top `multiKeep` multi-char
  *    pieces with nonzero count.
  *
  * Everything is integer arithmetic over exact counts, so the learned
  * vocabulary, every piece score, and every segmentation replay
  * bit-for-bit in a SQL oracle (q272 unrolls the rounds position by
  * position, the q262 generated-CTE technique).
  *
  * Scale shape: the ONLY corpus-scale stage is the word-frequency
  * aggregate; seeding is an explode over the dictionary (≤ |w|·L spans
  * per word), each round is one broadcast of the ≤ `chars+multiKeep`-row
  * scored vocab (collapsed to a one-row MAP column — never the driver)
  * against the dictionary, a per-word Viterbi evaluated as ONE
  * `aggregate` HOF expression, and a dictionary-sized recount. Words
  * longer than `maxWordLen` are excluded from TRAINING (cost is
  * O(len·L) per word per round; the tail of a word-length distribution
  * is noise to a subword vocab) — apply-side segmentation has no such
  * limit.
  */
object Unigram {

  /** Fixed point for the smoothed probability ratio (2²⁰, like
    * [[Dsir.RatioScaleBits]]); costs come out in whole bits.
    */
  val RatioScaleBits: Int = 20

  /** The word-frequency dictionary restricted to trainable words:
    * lowercase alphabetic, length ≤ `maxWordLen`.
    */
  def wordFreq(
      docs: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxWordLen)
      .groupBy("w")
      .agg(count(lit(1)).as("freq"))

  /** All (piece, count) substring seeds of the dictionary: piece length
    * ∈ [1, maxPieceLen], count = Σ freq over every occurrence.
    */
  def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("w"), col("freq"),
        explode(expr("sequence(1, length(w))")).as("i"))
      .select(col("freq"),
        explode(expr(
          s"sequence(1, least($maxPieceLen, length(w) - i + 1))"))
          .as("l"),
        col("w"), col("i"))
      .select(expr("substring(w, i, l)").as("piece"), col("freq"))
      .groupBy("piece")
      .agg(sum("freq").as("cnt"))

  /** Prune a (piece, cnt) vocab to single chars (always kept — the
    * coverage floor) + the top `multiKeep` multi-char pieces by
    * (cnt desc, piece asc), nonzero only.
    */
  def prune(vocab: DataFrame, multiKeep: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("piece").asc)
    val multi = vocab.filter(length(col("piece")) > 1 && col("cnt") > 0)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= multiKeep)
      .drop("__rk")
    vocab.filter(length(col("piece")) === 1).unionByName(multi)
  }

  /** Whole-bit piece costs with add-one smoothing over a (piece, cnt)
    * vocab: `21 − length(bin((cnt+1)·2²⁰ div (tot+|V|)))`. `tot` and
    * `|V|` ride in via a broadcast 1-row aggregate.
    */
  def costs(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(
      sum("cnt").as("__tot"), count(lit(1)).as("__nv"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        (lit(RatioScaleBits + 1) - length(bin(expr(
          s"((cnt + 1) * ${1L << RatioScaleBits}L) div (__tot + __nv)"))))
          .cast("long").as("bits"))
  }

  /** Viterbi-segment every dictionary word under a scored vocab: adds
    * `seg` (space-joined best segmentation) to `words`. The whole DP is
    * ONE `aggregate` HOF over the word's positions — accumulator is the
    * array of best (cost, np, seg) states per prefix; each step takes
    * the `array_min` (lexicographic struct order = the documented
    * tie-break) over all vocab pieces ending at the position. The
    * scored vocab collapses to a one-row MAP column and broadcasts —
    * executor-side throughout.
    */
  def viterbiSegment(
      words: DataFrame, scored: DataFrame, maxPieceLen: Int): DataFrame = {
    val vmap = scored.agg(
      map_from_arrays(collect_list("piece"), collect_list("bits"))
        .as("__vmap"))
    val dp =
      s"""element_at(
         |  aggregate(
         |    sequence(1, length(w)),
         |    array(named_struct('cost', 0L, 'np', 0, 'seg', '')),
         |    (acc, j) -> concat(acc, array(
         |      array_min(filter(
         |        transform(
         |          sequence(greatest(1, j - $maxPieceLen + 1), j),
         |          s -> IF(
         |            element_at(__vmap, substring(w, s, j - s + 1))
         |              IS NULL,
         |            CAST(NULL AS
         |              STRUCT<cost: BIGINT, np: INT, seg: STRING>),
         |            named_struct(
         |              'cost', element_at(acc, s).cost +
         |                element_at(__vmap, substring(w, s, j - s + 1)),
         |              'np', element_at(acc, s).np + 1,
         |              'seg', IF(element_at(acc, s).seg = '',
         |                substring(w, s, j - s + 1),
         |                concat(element_at(acc, s).seg, ' ',
         |                  substring(w, s, j - s + 1)))))),
         |        x -> x IS NOT NULL))))),
         |  length(w) + 1).seg""".stripMargin
    words.crossJoin(broadcast(vmap))
      .withColumn("seg", expr(dp))
      .drop("__vmap")
  }

  /** Soft-EM expected piece counts (the true SentencePiece E-step, not
    * the Viterbi approximation): per word, forward masses
    * `α(j) = Σᵢ α(i)·p(w[i..j])` and backward masses
    * `β(i) = Σⱼ p(w[i..j])·β(j)` with `p = 2^(−bits)`, then each piece
    * occurrence (i, j) contributes `freq·α(i)·p·β(j)/Z` — its posterior
    * probability over ALL segmentations — to the piece's count.
    *
    * Cross-engine exactness WITHOUT integers: every float is produced by
    * a fixed, explicitly-parenthesized chain of IEEE operations — the α
    * sum adds its ≤ maxPieceLen terms in ascending-i order, β in
    * ascending-j order, the occurrence weight multiplies/divides
    * left-to-right — so an oracle replaying the same chains gets the
    * same bits (the dot-product left-fold discipline applied to a DP),
    * and each occurrence weight is fixed-pointed to 2²⁰ units
    * IMMEDIATELY, making the cross-word aggregation an integer sum that
    * no partial-aggregation order can perturb.
    *
    * Input: (w, freq) words (every char covered by the vocab — the
    * train-side invariant; an uncovered word would have Z = 0 and is the
    * caller's error) and a scored (piece, bits) vocab. Output:
    * (piece, cnt) with cnt in 2²⁰ fixed point.
    */
  def softCounts(
      words: DataFrame, scored: DataFrame, maxPieceLen: Int): DataFrame = {
    val vmap = scored.agg(
      map_from_arrays(collect_list("piece"), collect_list("bits"))
        .as("__vmap"))
    // α terms at position j, ascending i = j-d (d descending); invalid
    // predecessors contribute an exact leading 0.0
    val aTerms = (maxPieceLen to 1 by -1).map { d =>
      s"""IF(j - $d >= 0 AND element_at(__vmap,
         |     substring(w, j - $d + 1, $d)) IS NOT NULL,
         |   element_at(acc, j - $d + 1) *
         |     power(2.0D, -CAST(element_at(__vmap,
         |       substring(w, j - $d + 1, $d)) AS DOUBLE)),
         |   CAST(0.0 AS DOUBLE))""".stripMargin
    }.reduce((a, b) => s"($a\n + $b)")
    val alpha =
      s"""aggregate(
         |  sequence(1, length(w)),
         |  array(CAST(1.0 AS DOUBLE)),
         |  (acc, j) -> concat(acc, array($aTerms)))""".stripMargin
    // β terms at i = length(w) - s, ascending d (= ascending j = i+d);
    // element_at(acc, d) is β(i+d)
    val bTerms = (1 to maxPieceLen).map { d =>
      s"""IF($d <= s AND element_at(__vmap,
         |     substring(w, length(w) - s + 1, $d)) IS NOT NULL,
         |   power(2.0D, -CAST(element_at(__vmap,
         |       substring(w, length(w) - s + 1, $d)) AS DOUBLE)) *
         |     element_at(acc, $d),
         |   CAST(0.0 AS DOUBLE))""".stripMargin
    }.reduce((a, b) => s"($a\n + $b)")
    val beta =
      s"""aggregate(
         |  sequence(1, length(w)),
         |  array(CAST(1.0 AS DOUBLE)),
         |  (acc, s) -> concat(array($bTerms), acc))""".stripMargin
    words.crossJoin(broadcast(vmap))
      .withColumn("__a", expr(alpha))
      .withColumn("__b", expr(beta))
      .withColumn("__z", expr("element_at(__a, length(w) + 1)"))
      .select(col("freq"), col("w"), col("__vmap"), col("__a"),
        col("__b"), col("__z"),
        explode(expr("sequence(0, length(w) - 1)")).as("i"))
      .select(col("freq"), col("w"), col("__vmap"), col("__a"),
        col("__b"), col("__z"), col("i"),
        explode(expr(
          s"sequence(1, least($maxPieceLen, length(w) - i))")).as("d"))
      .withColumn("piece", expr("substring(w, i + 1, d)"))
      .withColumn("bits", expr("element_at(__vmap, piece)"))
      .filter(col("bits").isNotNull)
      .withColumn("ec", expr(
        "CAST(floor(CAST(freq AS DOUBLE) * element_at(__a, i + 1) * " +
          "power(2.0D, -CAST(bits AS DOUBLE)) * " +
          "element_at(__b, i + d + 1) / __z * 1048576.0D + 0.5D) " +
          "AS BIGINT)"))
      .groupBy("piece")
      .agg(sum("ec").as("cnt"))
  }

  /** Soft-EM unigram training — [[train]] with the TRUE expected-count
    * E-step ([[softCounts]]) instead of Viterbi counts: each round
    * scores the vocab, accumulates every piece's posterior mass over all
    * segmentations (2²⁰ fixed point), and prunes on those masses. Counts
    * in the returned (piece, cnt, bits) are the scaled expected counts;
    * `bits` (what [[segment]] consumes) is scale-invariant because the
    * cost formula divides count by total. Apply-side segmentation stays
    * Viterbi — the standard SentencePiece split.
    */
  def trainSoft(
      docs: DataFrame, textCol: String, rounds: Int, multiKeep: Int,
      maxPieceLen: Int = 4, maxWordLen: Int = 12): DataFrame = {
    require(rounds >= 1, s"unigram: rounds must be >= 1, got $rounds")
    require(multiKeep >= 1, s"unigram: multiKeep must be >= 1, got $multiKeep")
    val words = wordFreq(docs, textCol, maxWordLen).localCheckpoint()
    var vocab = prune(seedCounts(words, maxPieceLen), multiKeep)
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val counts = softCounts(words, costs(vocab), maxPieceLen)
      val recounted = vocab.select("piece")
        .join(counts, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      vocab = prune(recounted, multiKeep).localCheckpoint()
    }
    costs(vocab).select(col("piece"), col("cnt"), col("bits"))
  }

  /** Piece counts from best segmentations: explode, weight by word
    * frequency.
    */
  def countsFromSegmentation(segmented: DataFrame): DataFrame =
    segmented
      .select(col("freq"), explode(split(col("seg"), " ")).as("piece"))
      .groupBy("piece")
      .agg(sum("freq").as("cnt"))

  /** Train the unigram vocabulary: seed → `rounds` × (cost, Viterbi,
    * recount, prune). Returns the final (piece, cnt, bits) table —
    * `bits` scored from the FINAL counts (what an applier segments
    * with). Each round's vocab is localCheckpointed: the plan stays
    * bounded regardless of `rounds` (the [[Bpe.trainMerges]]
    * discipline), and nothing ever collects to the driver.
    */
  def train(
      docs: DataFrame, textCol: String, rounds: Int, multiKeep: Int,
      maxPieceLen: Int = 4, maxWordLen: Int = 12): DataFrame = {
    require(rounds >= 1, s"unigram: rounds must be >= 1, got $rounds")
    require(multiKeep >= 1, s"unigram: multiKeep must be >= 1, got $multiKeep")
    val words = wordFreq(docs, textCol, maxWordLen).localCheckpoint()
    var vocab = prune(seedCounts(words, maxPieceLen), multiKeep)
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val scored = costs(vocab)
      val seg = viterbiSegment(words, scored, maxPieceLen)
      val counts = countsFromSegmentation(seg)
      // a vocab piece unused by every best segmentation counts 0 (and a
      // multi-char one is pruned); single chars persist at 0
      val recounted = vocab.select("piece")
        .join(counts, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      vocab = prune(recounted, multiKeep).localCheckpoint()
    }
    costs(vocab).select(col("piece"), col("cnt"), col("bits"))
  }

  /** Segment arbitrary words with a trained vocab (apply side): returns
    * (`w`, `seg`). No word-length cap — the DP is linear in the word.
    *
    * A word containing any character the trained vocab cannot cover has
    * NO segmentation — the DP's candidate set goes empty and its best
    * state is null. That fails LOUDLY here (raise_error naming the word)
    * instead of emitting a silent null seg row that downstream
    * piece-splitting consumers would miscount.
    */
  def segment(
      words: DataFrame, trained: DataFrame, maxPieceLen: Int = 4)
      : DataFrame =
    viterbiSegment(
      words.select(col("w"), lit(1L).as("freq")),
      trained.select(col("piece"), col("bits")), maxPieceLen)
      .select(col("w"),
        when(col("seg").isNotNull, col("seg"))
          .otherwise(raise_error(concat(
            lit("unigram segment: word '"), col("w"),
            lit("' is not segmentable under the trained vocab " +
              "(character not covered) — refusing to emit a null seg"))))
          .as("seg"))
}
