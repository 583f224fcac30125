package graft

import graft.ext.Dedup

import org.scalatest.funsuite.AnyFunSuite

class ContainmentSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Brute-force exact containment over trigram shingle string sets. */
  private def bruteForce(docs: Seq[(Long, String)], num: Int,
      den: Int): Set[(Long, Long)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      if inter * den >= math.min(sa.size, sb.size) * num
    } yield (ia, ib)).toSet
  }

  private def run(docs: Seq[(Long, String)], num: Int, den: Int,
      parts: Int): Set[(Long, Long)] =
    Dedup.containmentPairs(
      docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
      k = 3, thresholdNum = num, thresholdDen = den)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("finds a short doc fully contained in a long one (Jaccard-low)") {
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val long = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna " +
      quote + " aliqua enim ad minim veniam quis nostrud exercitation")
    val docs = Seq(1L -> quote, 2L -> long, 3L -> "totally unrelated words here")
    val got = run(docs, 9, 10, 4)
    assert(got == bruteForce(docs, 9, 10))
    assert(got.contains((1L, 2L))) // containment 1.0, Jaccard well below 0.5
  }

  test("prefix join equals all-pairs on a clustered corpus, any partitioning") {
    // 3 clusters of near-subsets + noise; overlapping shingle vocabulary
    val base = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten eleven twelve",
      "red orange yellow green blue indigo violet ultra infra x")
    val docs: Seq[(Long, String)] = base.zipWithIndex.flatMap {
      case (t, ci) =>
        val toks = t.split(" ")
        Seq(
          (ci * 10L + 1, t),
          (ci * 10L + 2, toks.drop(2).mkString(" ")), // suffix subset
          (ci * 10L + 3, toks.take(7).mkString(" ")), // prefix subset
          (ci * 10L + 4, (toks.take(4) ++ Seq("zzz") ++
            toks.drop(6)).mkString(" "))) // mutated middle
    } ++ Seq((99L, "completely separate content with no shared trigrams at all"))
    for (threshold <- Seq((1, 2), (4, 5), (1, 1)); parts <- Seq(1, 5, 16)) {
      val (num, den) = threshold
      assert(run(docs, num, den, parts) == bruteForce(docs, num, den),
        s"mismatch at t=$num/$den parts=$parts")
    }
  }

  test("docs shorter than k tokens are excluded, not crashed on") {
    val docs = Seq(1L -> "tiny doc", 2L -> "ab", 3L -> "",
      4L -> "a proper document with enough tokens to form trigrams here",
      5L -> "a proper document with enough tokens to form trigrams here")
    val got = run(docs, 9, 10, 3)
    assert(got == Set((4L, 5L)))
  }
}
