package graft

import graft.ext.Unigram

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Unigram]]: Viterbi segmentation correctness, coverage,
  * pruning bounds, and partitioning-invariance of the whole training
  * loop (the determinism the q272 oracle replay depends on).
  */
class UnigramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("viterbi picks the cheapest segmentation with documented tie-breaks") {
    val words = Seq(("abab", 10L), ("ba", 1L)).toDF("w", "freq")
    // costs: 'ab' cheap (frequent piece), singles expensive
    val scored = Seq(("a", 5L), ("b", 5L), ("ab", 2L))
      .toDF("piece", "bits")
    val seg = Unigram.viterbiSegment(words, scored, maxPieceLen = 2)
      .select("w", "seg").as[(String, String)].collect.toMap
    assert(seg("abab") == "ab ab") // 4 bits beats any single-char mix
    assert(seg("ba") == "b a")     // no 'ba' piece: singles
    // tie-break: equal cost prefers FEWER pieces
    val tied = Unigram.viterbiSegment(
      Seq(("ab", 1L)).toDF("w", "freq"),
      Seq(("a", 1L), ("b", 1L), ("ab", 2L)).toDF("piece", "bits"),
      maxPieceLen = 2)
      .select("seg").as[String].collect.head
    assert(tied == "ab") // 2 bits either way; 1 piece < 2 pieces
  }

  test("training covers every word, bounds the vocab, and is invariant") {
    val docs = (1 to 300).map { i =>
      (i.toLong, Seq("the", "them", "theme", "therm", "other", "mother")
        .apply(i % 6) + " " + Seq("cat", "cart", "carton").apply(i % 3))
    }.toDF("doc_id", "text")
    def run(parts: Int) =
      Unigram.train(docs.repartition(parts), "text", rounds = 2,
        multiKeep = 8, maxPieceLen = 3)
        .orderBy("piece").as[(String, Long, Long)].collect.toSeq
    val a = run(7)
    assert(a == run(2), "training must be partitioning-invariant")
    // coverage floor: every single char of the corpus survives
    val chars = a.filter(_._1.length == 1).map(_._1).toSet
    assert(Set("t", "h", "e", "m", "r", "o", "c", "a", "n").subsetOf(chars))
    // pruning bound: at most multiKeep multi-char pieces, all counted
    val multi = a.filter(_._1.length > 1)
    assert(multi.size <= 8, multi.toString)
    assert(multi.forall(_._2 > 0), multi.toString)
    // the learned vocab segments the corpus losslessly
    val words = Unigram.wordFreq(docs, "text", maxWordLen = 12)
    val segd = Unigram.segment(
      words.select("w"), a.toDF("piece", "cnt", "bits"), maxPieceLen = 3)
    val bad = segd.filter(
      regexp_replace(col("seg"), " ", "") =!= col("w")).count()
    assert(bad == 0L)
  }

  test("soft counts: unique segmentation gives exactly the hard count") {
    // 'xy' is the only segmentation beyond singles; with only singles in
    // vocab the word has EXACTLY ONE segmentation, so every posterior is
    // 1 and the scaled expected count is freq · 2²⁰ on the nose
    val words = Seq(("xy", 3L)).toDF("w", "freq")
    val singlesOnly = Seq(("x", 4L), ("y", 4L)).toDF("piece", "bits")
    val ec = Unigram.softCounts(words, singlesOnly, maxPieceLen = 2)
      .as[(String, Long)].collect.toMap
    assert(ec == Map("x" -> 3L * (1L << 20), "y" -> 3L * (1L << 20)))
  }

  test("soft counts: posterior mass splits across segmentations and sums to 1") {
    // vocab {a, b, ab} with EQUAL costs: 'ab' has two segmentations,
    // [ab] with weight p and [a b] with weight p² — posteriors
    // p/(p+p²) and p²/(p+p²); at bits=1 (p=1/2): 2/3 and 1/3
    val words = Seq(("ab", 3L)).toDF("w", "freq")
    val scored = Seq(("a", 1L), ("b", 1L), ("ab", 1L))
      .toDF("piece", "bits")
    val ec = Unigram.softCounts(words, scored, maxPieceLen = 2)
      .as[(String, Long)].collect.toMap
    val s = 1L << 20
    def fx(x: Double) = math.floor(3.0 * x * s + 0.5).toLong
    assert(ec("ab") == fx(2.0 / 3.0), ec.toString)
    assert(ec("a") == fx(1.0 / 3.0), ec.toString)
    assert(ec("b") == fx(1.0 / 3.0), ec.toString)
  }

  test("soft-EM training is partition-invariant and covers every word") {
    val docs = (1 to 300).map { i =>
      (i.toLong, Seq("the", "them", "theme", "therm", "other", "mother")
        .apply(i % 6) + " " + Seq("cat", "cart", "carton").apply(i % 3))
    }.toDF("doc_id", "text")
    def run(parts: Int) =
      Unigram.trainSoft(docs.repartition(parts), "text", rounds = 2,
        multiKeep = 8, maxPieceLen = 3)
        .orderBy("piece").as[(String, Long, Long)].collect.toSeq
    val a = run(2)
    assert(a == run(7), "soft-EM must be partition-invariant")
    assert(a.nonEmpty)
    // the trained vocab still segments every dictionary word (coverage)
    val words = Unigram.wordFreq(docs, "text", 12)
    val segd = Unigram.segment(
      words.select("w"),
      spark.createDataFrame(a).toDF("piece", "cnt", "bits"),
      maxPieceLen = 3)
    val bad = segd.filter(
      regexp_replace(col("seg"), " ", "") =!= col("w")).count()
    assert(bad == 0L)
  }

  test("a frequent multigram displaces rarer pieces across rounds") {
    // 'ing' dominates: after EM rounds it must be in the vocab and used
    val docs = (1 to 200).map(i =>
      (i.toLong, "running jumping singing ring")).toDF("doc_id", "text")
    val trained = Unigram.train(docs, "text", rounds = 2, multiKeep = 4,
      maxPieceLen = 3)
    val pieces = trained.select("piece").as[String].collect.toSet
    assert(pieces.contains("ing"), pieces.toString)
    val seg = Unigram.segment(
      Seq("singing").toDF("w"), trained, maxPieceLen = 3)
      .select("seg").as[String].collect.head
    assert(seg.split(" ").contains("ing"), seg)
  }
}
