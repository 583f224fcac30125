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
  * so a SQL oracle can replay training exactly. The driver never sees data:
  * the chosen pair stays a 1-row broadcast DataFrame cross-joined into the
  * fold, not a collect.
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
    * pair in columns `__ma`/`__mb` — a NULL `__ma` (no rule, e.g. merges
    * exhausted) makes the fold the identity re-join, so LEFT-joined rule
    * rows apply safely.
    */
  private def mergeFold: Column =
    aggregate(
      split(col("ts"), Sep),
      lit(""),
      (acc: Column, x: Column) =>
        when(
          col("__ma").isNotNull && acc =!= "" &&
            (acc === col("__ma") ||
              acc.endsWith(concat(lit(Sep), col("__ma")))) &&
            x === col("__mb"),
          concat(acc, x))
          .when(acc === "", x)
          .otherwise(concat(acc, lit(Sep), x)))

  /** One merge iteration: (best-pair 1-row DF with a/b/cnt, next state). */
  private def step(state: DataFrame): (DataFrame, DataFrame) = {
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
    val best = pairs
      .groupBy("a", "b")
      .agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(1)
    val merged = state
      .crossJoin(broadcast(best.select(col("a").as("__ma"), col("b").as("__mb"))))
      .select(mergeFold.as("ts"), col("freq"))
    (best, merged)
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
        .select(col("w"), mergeFold.as("ts"))
    }
    cur
  }

  /** The first `numMerges` BPE merge rules learned from `docs(textCol)`:
    * one row per rule — (merge_rank, left_tok, right_tok, pair_count).
    *
    * Each iteration's state (the vocabulary-sized dictionary) and chosen
    * pair are persisted so the single collecting action computes every
    * stage once — without this, rank k's branch would re-derive the
    * corpus scan and all k−1 prior iterations (quadratic recomputation).
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
    val rules = (1 to numMerges).map { rank =>
      val (best0, next) = step(state)
      val best = best0.persist(StorageLevel.MEMORY_AND_DISK)
      state = next.persist(StorageLevel.MEMORY_AND_DISK)
      best.select(
        lit(rank).as("merge_rank"),
        col("a").as("left_tok"),
        col("b").as("right_tok"),
        col("cnt").as("pair_count"))
    }
    rules.reduce(_.union(_))
  }
}
