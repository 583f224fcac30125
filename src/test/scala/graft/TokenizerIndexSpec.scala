package graft

import graft.ext.{Bpe, TokenizerIndex}

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.TokenizerIndex]]: persisted BPE merges — artifact apply ≡
  * inline train+apply, frozen merge count honored, retrain versions with
  * retention + time-travel. Oracle twin: q328.
  */
class TokenizerIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus(extra: String = "") = Seq(
    (1L, s"low lower lowest low low $extra"),
    (2L, s"new newer newest new $extra"),
    (3L, "wide wider widest low new")).toDF("doc_id", "text")

  private def seg(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("w", "ts").as[(String, String)].collect.toMap

  test("artifact apply equals inline train+apply; merges round-trip") {
    val dir = tmpDir("tokidx_eq")
    val c = corpus()
    TokenizerIndex.build(spark, c, dir, "bpe", "text", numMerges = 4)
    val words = Seq("low", "lowest", "newer", "unseen")
      .toDF("w")
    val fromArtifact = seg(
      TokenizerIndex.tokenizeWords(spark, words, dir, "bpe"))
    val inline = seg(Bpe.applyMerges(
      words, Bpe.trainMerges(c, "text", numMerges = 4), numMerges = 4))
    assert(fromArtifact == inline && fromArtifact.nonEmpty)
    // the stored rules ARE the trained rules
    val stored = TokenizerIndex.merges(spark, dir, "bpe")
      .select("merge_rank", "left_tok", "right_tok", "pair_count")
      .as[(Int, String, String, Long)].collect.toSet
    val trained = Bpe.trainMerges(c, "text", numMerges = 4)
      .as[(Int, String, String, Long)].collect.toSet
    assert(stored == trained && stored.nonEmpty)
  }

  test("retrain versions: retention window + time-travel reads") {
    val dir = tmpDir("tokidx_tt")
    TokenizerIndex.build(spark, corpus(), dir, "bpe", "text", numMerges = 2)
    TokenizerIndex.build(spark, corpus("zig zag zig zag zig zag zig zag"),
      dir, "bpe", "text", numMerges = 2)
    assert(TokenizerIndex.versions(spark, dir, "bpe") == Seq(1, 2))
    val words = Seq("lowest").toDF("w")
    val v1 = seg(TokenizerIndex.tokenizeWords(spark, words, dir, "bpe",
      atVersion = Some(1)))
    val cur = seg(TokenizerIndex.tokenizeWords(spark, words, dir, "bpe"))
    // v1 trained without the zig/zag flood: segmentations differ
    assert(v1 != cur, s"$v1 vs $cur")
    intercept[IllegalArgumentException] {
      TokenizerIndex.tokenizeWords(spark, words, dir, "bpe",
        atVersion = Some(3))
    }
    // a third retrain slides the window; v1 refused loudly
    TokenizerIndex.build(spark, corpus(), dir, "bpe", "text", numMerges = 2)
    intercept[IllegalArgumentException] {
      TokenizerIndex.merges(spark, dir, "bpe", atVersion = Some(1))
    }
  }

  test("a missing artifact fails fast") {
    val dir = tmpDir("tokidx_req")
    intercept[IllegalArgumentException] {
      TokenizerIndex.tokenizeWords(spark, Seq("a").toDF("w"), dir, "nope")
    }
  }

  test("unigram artifact: segment-from-artifact equals inline train+segment") {
    val dir = tmpDir("tokidx_uni")
    val c = corpus()
    TokenizerIndex.buildUnigram(spark, c, dir, "uni", "text",
      rounds = 2, multiKeep = 50, maxPieceLen = 3, maxWordLen = 10)
    val words = Seq("low", "lowest", "newer").toDF("w")
    def useg(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      df.select("w", "seg").as[(String, String)].collect.toMap
    val fromArtifact = useg(
      TokenizerIndex.segmentWords(spark, words, dir, "uni"))
    val inline = useg(graft.ext.Unigram.segment(words,
      graft.ext.Unigram.train(c, "text", rounds = 2, multiKeep = 50,
        maxPieceLen = 3, maxWordLen = 10),
      maxPieceLen = 3))
    assert(fromArtifact == inline && fromArtifact.nonEmpty)
  }

  test("family guards: BPE apply refuses a unigram artifact and vice versa") {
    val dir = tmpDir("tokidx_guard")
    TokenizerIndex.buildUnigram(spark, corpus(), dir, "uni", "text",
      rounds = 1, multiKeep = 50, maxPieceLen = 3, maxWordLen = 10)
    val words = Seq("low").toDF("w")
    val e1 = intercept[IllegalArgumentException] {
      TokenizerIndex.tokenizeWords(spark, words, dir, "uni")
    }
    assert(e1.getMessage.contains("segmentWords"), e1.getMessage)
    val dir2 = tmpDir("tokidx_guard2")
    TokenizerIndex.build(spark, corpus(), dir2, "bpe", "text",
      numMerges = 2)
    val e2 = intercept[IllegalArgumentException] {
      TokenizerIndex.segmentWords(spark, words, dir2, "bpe")
    }
    assert(e2.getMessage.contains("tokenizeWords"), e2.getMessage)
    intercept[IllegalArgumentException] {
      TokenizerIndex.vocab(spark, dir2, "bpe")
    }
  }
}
