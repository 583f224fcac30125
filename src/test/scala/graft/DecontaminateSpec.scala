package graft

import graft.ext.Decontaminate

import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def flag(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
      k: Int = 3, minOverlap: Int = 2): Map[Long, (Long, Boolean)] =
    Decontaminate.flagContaminated(
      corpus.toDF("id", "text"), bench.toDF("id", "text"),
      "id", "text", k, minOverlap)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

  test("doc sharing a benchmark passage is flagged; clean doc is not") {
    val bench = Seq(1000L -> "the quick brown fox jumps over the lazy dog")
    val corpus = Seq(
      // contains "quick brown fox" + "brown fox jumps" + "fox jumps over"
      1L -> "copied text quick brown fox jumps over it all",
      2L -> "totally unrelated words about sparks and shuffles here")
    val got = flag(corpus, bench)
    assert(got(1L)._1 >= 2 && got(1L)._2)
    assert(got(2L) == ((0L, false)))
  }

  test("threshold separates incidental from real overlap") {
    val bench = Seq(1000L -> "alpha beta gamma delta epsilon")
    val corpus = Seq(
      // exactly one shared trigram: "alpha beta gamma"
      1L -> "alpha beta gamma unrelated tail of words")
    assert(flag(corpus, bench, minOverlap = 2)(1L) == ((1L, false)))
    assert(flag(corpus, bench, minOverlap = 1)(1L) == ((1L, true)))
  }

  test("overlap counts DISTINCT grams, not occurrences") {
    val bench = Seq(1000L -> "a b c")
    val corpus = Seq(1L -> "a b c a b c a b c")
    // "a b c" appears 3x in the corpus doc but is one distinct gram;
    // rolling grams "b c a"/"c a b" don't exist in the benchmark.
    assert(flag(corpus, bench, minOverlap = 1)(1L) == ((1L, true)))
  }

  test("docs shorter than k report zero and survive") {
    val bench = Seq(1000L -> "x y z w")
    val corpus = Seq(1L -> "x y")
    assert(flag(corpus, bench)(1L) == ((0L, false)))
  }
}
