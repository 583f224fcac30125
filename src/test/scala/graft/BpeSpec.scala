package graft

import graft.ext.Bpe

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Bpe.trainMerges]]: hand-computed merge rules on a planted corpus,
  * leftmost-greedy application semantics, and deterministic tie-breaks.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("learns hand-computed merges with deterministic tie-breaks") {
    // corpus: "abab" x3, "abc" x2, "cc" x1 (words, space-separated)
    // init: a b a b / a b c / c c
    // pair counts: (a,b)=2*3+1*2=8, (b,a)=1*3=3, (b,c)=2, (c,c)=1
    // merge 1 = (a,b) cnt 8 → ab ab / ab c / c c
    // counts: (ab,ab)=3, (ab,c)=2, (c,c)=1 → merge 2 = (ab,ab) cnt 3
    // → abab / ab c / c c → counts: (ab,c)=2, (c,c)=1 → merge 3 = (ab,c)
    val docs = Seq(
      "abab abab abab abc abc cc").toDF("text")
    val got = Bpe.trainMerges(docs, "text", numMerges = 3)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect.toSeq
    assert(got == Seq(
      (1, "a", "b", 8L),
      (2, "ab", "ab", 3L),
      (3, "ab", "c", 2L)))
  }

  test("merge application is leftmost non-overlapping greedy") {
    // word "aaa" x5, "ab" x1: merge 1 is (a,a) cnt 10 (two per "aaa").
    // Greedy leftmost: a a a → (aa) a, NOT a (aa) — so merge 2 counts
    // (aa,a)=5 and (a,b)=1, picking (aa,a).
    val docs = Seq("aaa aaa aaa aaa aaa ab").toDF("text")
    val got = Bpe.trainMerges(docs, "text", numMerges = 2)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect.toSeq
    assert(got == Seq(
      (1, "a", "a", 10L),
      (2, "aa", "a", 5L)))
  }

  test("non-alphabetic words are excluded from the dictionary") {
    val docs = Seq("ab ab 123 ab7 A-B !!").toDF("text")
    // only "ab" (x2) survives the [a-z]+ filter ("a-b" lowercased has '-')
    val got = Bpe.trainMerges(docs, "text", numMerges = 1)
      .as[(Int, String, String, Long)].collect.toSeq
    assert(got == Seq((1, "a", "b", 2L)))
  }

  test("applyMerges tokenizes with the learned rules in rank order") {
    val docs = Seq("abab abab abab abc abc cc").toDF("text")
    val rules = Bpe.trainMerges(docs, "text", numMerges = 3)
    // rules: (a,b) → (ab,ab) → (ab,c)
    val words = Seq("abab", "abc", "cc", "ba").toDF("w")
    val got = Bpe.applyMerges(words, rules, numMerges = 3)
      .as[(String, String)].collect.toMap
    assert(got == Map(
      "abab" -> "abab", // ab ab → abab
      "abc" -> "abc", // ab c → abc
      "cc" -> "c c", // no rule applies
      "ba" -> "b a")) // order matters: (a,b) does not merge "b a"
  }

  test("applyMerges is the identity for exhausted ranks") {
    val docs = Seq("ab ab ab").toDF("text")
    val rules = Bpe.trainMerges(docs, "text", numMerges = 3) // only rank 1
    val got = Bpe.applyMerges(Seq("ab", "ba").toDF("w"), rules, numMerges = 3)
      .as[(String, String)].collect.toMap
    assert(got == Map("ab" -> "ab", "ba" -> "b a"))
  }

  test("exhausted dictionaries yield fewer rows, never padding") {
    // "ab" fully merges after one rule; ranks 2-3 have no pair to count
    val docs = Seq("ab ab ab").toDF("text")
    val got = Bpe.trainMerges(docs, "text", numMerges = 3)
      .as[(Int, String, String, Long)].collect.toSeq
    assert(got == Seq((1, "a", "b", 3L)))
  }

  test("wordFreq lowercases and counts corpus-wide") {
    val docs = Seq("The the", "THE cat").toDF("text")
    val wf = Bpe.wordFreq(docs, "text")
      .as[(String, Long)].collect.toMap
    assert(wf == Map("the" -> 3L, "cat" -> 1L))
  }

  test("wordpiece picks the likelihood-best pair, not the most frequent") {
    // (a,b): cnt 10, units a=10 b=10 → score 10·1e9/100 = 1e8
    // (c,d): cnt 2,  units c=2  d=2  → score 2·1e9/4   = 5e8 → wins
    // BPE on the same corpus would pick (a,b) first.
    val docs = Seq(("ab " * 10 + "cd cd").trim).toDF("text")
    val got = Bpe.trainWordpiece(docs, "text", numMerges = 2)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long, Long)].collect.toSeq
    assert(got == Seq(
      (1, "c", "d", 2L, 500000000L),
      (2, "a", "b", 10L, 100000000L)))
    val bpe = Bpe.trainMerges(docs, "text", numMerges = 1)
      .as[(Int, String, String, Long)].collect.toSeq
    assert(bpe == Seq((1, "a", "b", 10L)), "BPE diverges by design")
  }

  test("wordpiece score ties break on count then pair lex order") {
    // (a,b) and (c,d) both: cnt 4, units 4/4 → score 4·1e9/16 = 2.5e8
    val docs = Seq(("ab " * 4 + "cd " * 4).trim).toDF("text")
    val got = Bpe.trainWordpiece(docs, "text", numMerges = 1)
      .as[(Int, String, String, Long, Long)].collect.toSeq
    assert(got == Seq((1, "a", "b", 4L, 250000000L)))
  }

  test("wordpiece rules apply through the shared merge fold") {
    val docs = Seq(("ab " * 10 + "cd cd").trim).toDF("text")
    val rules = Bpe.trainWordpiece(docs, "text", numMerges = 2)
    val got = Bpe.applyMerges(
        Seq("abcd", "dcba").toDF("w"), rules, numMerges = 2)
      .as[(String, String)].collect.toMap
    assert(got == Map("abcd" -> "ab cd", "dcba" -> "d c b a"))
  }
}
