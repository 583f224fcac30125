package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus search primitives — the library surface behind the q210/q224
  * retrieval queries, usable on any (id, text) frame:
  *
  *  - [[literalMatches]]: literal substring search via trigram-index
  *    pruning. SOUND by construction (a doc containing the pattern
  *    contains every trigram of it), so the index is pure pruning and the
  *    exact `contains` verify runs only on candidates — the corpus is
  *    never regex-scanned.
  *  - [[phraseMatches]]: token-adjacency phrase search over a positional
  *    posting table (`pos₂ = pos₁ + 1`) — index-as-semantics; extends to
  *    within-k proximity by changing the position predicate.
  *
  * Scale: posting lists are (token/trigram, id[, pos]) rows partitioned
  * by term; pattern/phrase tables are tiny and broadcast; only matching
  * postings survive into any shuffle.
  */
object Search {

  /** (pattern_id, id) pairs for every doc whose `textCol` contains the
    * literal `pat` of each (pattern_id, pat). Patterns must be ≥ 3 chars
    * (the trigram prune needs one full trigram).
    */
  def literalMatches(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[(Int, String)]): DataFrame = {
    require(patterns.forall(_._2.length >= 3),
      "literalMatches requires patterns of at least 3 chars")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    // sub-3-char docs can't contain any pattern; dropping them also keeps
    // sequence() ascending (sequence(1, 0) would run DESCENDING)
    val docTri = base.filter(length(col("text")) >= 3)
      .select(col("id"),
        explode(array_distinct(expr(
          "transform(sequence(1, length(text) - 2), " +
            "i -> substring(text, i, 3))"))).as("tri"))
    val patTri = patterns.flatMap { case (pid, pat) =>
      pat.sliding(3).toSeq.distinct.map(t => (pid, t))
    }.toDF("pattern_id", "tri")
    val patReq = patterns.map { case (pid, pat) =>
      (pid, pat, pat.sliding(3).toSeq.distinct.size.toLong)
    }.toDF("pattern_id", "pat", "n_tri")
    val cand = docTri.join(broadcast(patTri), "tri")
      .groupBy("pattern_id", "id")
      .agg(countDistinct("tri").as("n_hit"))
      .join(broadcast(patReq), "pattern_id")
      .filter(col("n_hit") === col("n_tri"))
    cand.join(base, "id")
      .filter(expr("contains(text, pat)"))
      .select(col("pattern_id"), col("id"))
  }

  /** The (id, pos, tok) positional posting table of `docs` under the
    * family tokenizer ([[Dedup.tokens]]).
    */
  def positionalPostings(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("id"), col("pos").cast("long").as("pos"), col("tok"))

  /** (phrase_id, id, pos) for every occurrence of each two-token phrase
    * (phrase_id, tok1, tok2) where tok2 immediately follows tok1.
    */
  def phraseMatches(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrases: Seq[(Int, String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val px = positionalPostings(docs, idCol, textCol)
    val pt = broadcast(phrases.toDF("phrase_id", "tok1", "tok2"))
    pt.join(px.as("a"), col("a.tok") === col("tok1"))
      .join(px.as("b"),
        col("b.id") === col("a.id") &&
          col("b.tok") === col("tok2") &&
          col("b.pos") === col("a.pos") + 1)
      .select(col("phrase_id"), col("a.id").as("id"),
        col("a.pos").as("pos"))
  }
}
