package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-rule induction — the vocabulary-training step of
  * an LLM data pipeline (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units"), expressed Spark-first.
  *
  * BPE trains on the WORD-FREQUENCY dictionary, not the corpus: one corpus
  * scan builds `(word, freq)` (vocabulary-sized — the only shuffle that sees
  * corpus-scale data), and every merge iteration thereafter runs over that
  * small dictionary. Each iteration is fully declarative:
  *
  *   1. adjacent-pair counts: `zip_with(t[0..n-2], t[1..n-1])` explode →
  *      groupBy (a, b) sum(freq) — partial aggregation map-side;
  *   2. best pair: orderBy(cnt DESC, a, b) limit 1 — a TakeOrdered, no
  *      global sort;
  *   3. merge application: a codegen'd `aggregate` fold over each word's
  *      token string. The accumulator is the space-joined token string, so
  *      "last token == a" is the pure string test `acc == a OR acc ends with
  *      (' ' + a)` and merging is plain concatenation — leftmost
  *      non-overlapping greedy application, BPE's exact rule.
  *
  * Every decision is deterministic (ties break on pair lexicographic order),
  * so a SQL oracle can replay training exactly. The driver sees only the
  * learned rules themselves (one 3-column row per rank — the same
  * driver-sized artifact [[applyMerges]] broadcasts); corpus- and
  * vocabulary-scale data never leaves the executors.
  *
  * Reference scope: gluestick has no tokenizer induction
  * (/root/reference/src/etl-utils.ts stops at string cleanup); this is part
  * of the training-data-pipeline extension surface.
  */
object Bpe {

  /** Separator between tokens inside a word's working string. Words are
    * restricted to `[a-z]+`, so a space can never collide with token text.
    */
  private val Sep = " "

  /** The word-frequency dictionary: lowercase whitespace tokens restricted
    * to alphabetic words, with corpus frequencies.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"))

  /** The leftmost-greedy merge fold over a token string `ts`, merging the
    * pair `(ma, mb)` — a NULL `ma` (no rule, e.g. merges exhausted) makes
    * the fold the identity re-join, so LEFT-joined rule rows apply safely.
    */
  private def mergeFold(ma: Column, mb: Column): Column =
    aggregate(
      split(col("ts"), Sep),
      lit(""),
      (acc: Column, x: Column) =>
        when(
          ma.isNotNull && acc =!= "" &&
            (acc === ma || acc.endsWith(concat(lit(Sep), ma))) &&
            x === mb,
          concat(acc, x))
          .when(acc === "", x)
          .otherwise(concat(acc, lit(Sep), x)))

  /** The best (most frequent, ties lexicographic) adjacent pair of the
    * current dictionary state — a 1-row DF (a, b, cnt), empty when merged
    * to exhaustion. TakeOrdered (orderBy+limit 1), no global sort.
    */
  private def bestPair(state: DataFrame): DataFrame = {
    val t = split(col("ts"), Sep)
    state
      .select(
        col("freq"),
        explode(
          zip_with(
            slice(t, lit(1), size(t) - 1),
            slice(t, lit(2), size(t) - 1),
            (a: Column, b: Column) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("freq"))
      .groupBy("a", "b")
      .agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(1)
  }

  /** Tokenize `words` (column `w`, distinct alphabetic words) with learned
    * merge `rules` ([[trainMerges]] output), applied in rank order — the
    * APPLY side of BPE. Rules join LEFT (on true), so an exhausted rank
    * (absent row) is the identity pass instead of emptying the
    * vocabulary. Runs entirely on the vocabulary-sized word list; callers
    * join the result back to corpus tokens.
    */
  def applyMerges(
      words: DataFrame, rules: DataFrame, numMerges: Int): DataFrame = {
    var cur = words.select(col("w"),
      rtrim(regexp_replace(col("w"), "(.)", "$1" + Sep)).as("ts"))
    (1 to numMerges).foreach { rank =>
      val r = broadcast(rules
        .filter(col("merge_rank") === rank)
        .select(col("left_tok").as("__ma"), col("right_tok").as("__mb")))
      cur = cur.join(r, lit(true), "left")
        .select(col("w"), mergeFold(col("__ma"), col("__mb")).as("ts"))
    }
    cur
  }

  /** The first `numMerges` BPE merge rules learned from `docs(textCol)`:
    * one row per rule — (merge_rank, left_tok, right_tok, pair_count).
    *
    * Training iterates eagerly: each rank collects its ONE winning pair
    * (the rules are a driver-sized artifact by definition — [[applyMerges]]
    * broadcasts them right back), folds it into the next dictionary state
    * as literals, materializes that state, and unpersists the superseded
    * one. Cache usage is therefore bounded at ONE vocabulary-sized
    * DataFrame regardless of `numMerges` — the lazy single-action form
    * this replaced pinned every rank's state + best for the session
    * lifetime, which is unbounded at real vocabulary sizes (thousands of
    * merges). The corpus is still scanned exactly once (rank 1's
    * word-frequency build); every later rank reads the cached dictionary.
    *
    * If the dictionary merges to exhaustion before `numMerges` (no
    * adjacent pair left anywhere), the remaining ranks have no best pair
    * and are simply ABSENT from the output — the row count is
    * `min(numMerges, merges available)`, never padded.
    */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    import org.apache.spark.storage.StorageLevel
    // initial state: each character is a token (separator-joined)
    var state = wordFreq(docs, textCol)
      .select(rtrim(regexp_replace(col("w"), "(.)", "$1" + Sep)).as("ts"),
        col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rules = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    try {
      while (rank <= numMerges && !exhausted) {
        val best = bestPair(state).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (a, b, cnt) =
            (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          rules += ((rank, a, b, cnt))
          if (rank < numMerges) {
            val next = state
              .select(mergeFold(lit(a), lit(b)).as("ts"), col("freq"))
              .persist(StorageLevel.MEMORY_AND_DISK)
            next.count() // materialize BEFORE dropping the parent cache
            state.unpersist()
            state = next
          }
          rank += 1
        }
      }
    } finally state.unpersist()
    docs.sparkSession
      .createDataFrame(rules.result())
      .toDF("merge_rank", "left_tok", "right_tok", "pair_count")
  }

  /** The best pair by WORDPIECE likelihood score (Schuster & Nakajima
    * 2012; Wu et al. 2016 §3): maximize `count(ab) / (count(a)·count(b))`
    * — the pair whose merge most increases the unigram-LM corpus
    * likelihood — instead of BPE's raw `count(ab)`. The score fixes to
    * integer 1e9 units via one exact integer division
    * (`cnt·10⁹ div (ua·ub)`); ties break on raw count desc, then pair
    * lex order. Unit counts come from the SAME dictionary state as pair
    * counts (one extra vocabulary-sized aggregate per iteration). Exact
    * for corpora up to ~3·10⁹ unit occurrences (`ua·ub < 2⁶³`).
    */
  private def bestPairWordpiece(state: DataFrame): DataFrame = {
    val t = split(col("ts"), Sep)
    val pairs = state
      .select(
        col("freq"),
        explode(
          zip_with(
            slice(t, lit(1), size(t) - 1),
            slice(t, lit(2), size(t) - 1),
            (a: Column, b: Column) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("freq"))
      .groupBy("a", "b")
      .agg(sum("freq").as("cnt"))
    val units = state
      .select(col("freq"), explode(split(col("ts"), Sep)).as("u"))
      .groupBy("u")
      .agg(sum("freq").as("uc"))
    pairs
      .join(units.select(col("u").as("a"), col("uc").as("__ua")), "a")
      .join(units.select(col("u").as("b"), col("uc").as("__ub")), "b")
      .withColumn("score", expr("cnt * 1000000000 div (__ua * __ub)"))
      .orderBy(col("score").desc, col("cnt").desc, col("a"), col("b"))
      .limit(1)
      .select("a", "b", "cnt", "score")
  }

  /** WordPiece merge-rule induction: [[trainMerges]]' loop with the
    * likelihood-gain selection rule — the third tokenizer-training family
    * beside BPE ([[trainMerges]]) and unigram-LM ([[Unigram]]). Output
    * adds `score_fix` (the winning likelihood score in 1e9 units) to the
    * BPE rule schema; [[applyMerges]] applies the rules unchanged (both
    * families tokenize by leftmost-greedy merge replay).
    */
  def trainWordpiece(
      docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    import org.apache.spark.storage.StorageLevel
    var state = wordFreq(docs, textCol)
      .select(rtrim(regexp_replace(col("w"), "(.)", "$1" + Sep)).as("ts"),
        col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rules = Seq.newBuilder[(Int, String, String, Long, Long)]
    var rank = 1
    var exhausted = false
    try {
      while (rank <= numMerges && !exhausted) {
        val best = bestPairWordpiece(state).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (a, b, cnt, score) = (best(0).getString(0),
            best(0).getString(1), best(0).getLong(2), best(0).getLong(3))
          rules += ((rank, a, b, cnt, score))
          if (rank < numMerges) {
            val next = state
              .select(mergeFold(lit(a), lit(b)).as("ts"), col("freq"))
              .persist(StorageLevel.MEMORY_AND_DISK)
            next.count()
            state.unpersist()
            state = next
          }
          rank += 1
        }
      }
    } finally state.unpersist()
    docs.sparkSession
      .createDataFrame(rules.result())
      .toDF("merge_rank", "left_tok", "right_tok", "pair_count", "score_fix")
  }
}
