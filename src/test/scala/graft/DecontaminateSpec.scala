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

  test("sensitivity curve rows equal independent per-k runs; short grams flag more") {
    val bench = Seq(
      1000L -> "the quick brown fox jumps over the lazy dog daily")
    val corpus = Seq(
      1L -> "a quick brown fox jumps over things sometimes here today",
      2L -> "the lazy dog naps all day long in the big warm sun",
      3L -> "completely different content with no shared phrases around")
    val curve = Decontaminate.sensitivityCurve(
      corpus.toDF("id", "text"), bench.toDF("id", "text"),
      "id", "text", ks = Seq(3, 5), minOverlap = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (k <- Seq(3, 5)) {
      val single = flag(corpus, bench, k = k, minOverlap = 2)
      val flagged = single.values.count(_._2).toLong
      val overlap = single.values.map(_._1).sum
      assert(curve(k.toLong) ==
        ((3L, flagged, flagged * 1000000L / 3L, overlap)),
        s"curve row k=$k diverges from the single-k run")
    }
    // shorter grams can only see MORE overlap on the same corpus
    assert(curve(3L)._4 >= curve(5L)._4)
  }

  test("docs shorter than k report zero and survive") {
    val bench = Seq(1000L -> "x y z w")
    val corpus = Seq(1L -> "x y")
    assert(flag(corpus, bench)(1L) == ((0L, false)))
  }
}
