package graft

import graft.ext.Dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Dedup.apssCosinePairs]]: exact all-pairs set-cosine join
  * with lossless prefix filtering. Oracle twin: q309 (brute SQL).
  */
class ApssSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], tpm: Int, parts: Int = 3) =
    Dedup.apssCosinePairs(
        rows.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", tpm, k = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

  /** Brute-force reference at k = 1 (distinct single-token sets — hash
    * sets are size-isomorphic): every pair's cosine via the exhaustive
    * self-join — the definition the prefix filter must reproduce
    * exactly.
    */
  private def brute(rows: Seq[(Long, String)], tpm: Int) = {
    val sets = rows.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      c = (sa & sb).size.toLong
      if c * c * 1000000L >= tpm.toLong * tpm * sa.size * sb.size
    } yield (ia, ib) -> ((c, sa.size.toLong, sb.size.toLong,
      math.floor(c.toDouble * 1e9 /
        math.sqrt((sa.size.toLong * sb.size).toDouble) + 0.5).toLong))).toMap
  }

  test("identical docs pair at cosine exactly 1e9") {
    val out = run(Seq(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "delta epsilon zeta"), tpm = 900)
    assert(out == Map((1L, 2L) -> ((3L, 3L, 3L, 1000000000L))))
  }

  test("threshold boundary is decided by exact integer cross-multiply") {
    // overlap 3 of |A|=|B|=4 → cosine exactly 0.75
    val docs = Seq(1L -> "a b c d", 2L -> "a b c e")
    assert(run(docs, tpm = 750).contains((1L, 2L)), "0.750 must qualify")
    assert(run(docs, tpm = 751).isEmpty, "0.751 must not")
  }

  test("prefix-pruned result equals brute force on a mixed corpus") {
    val corpus = (0L until 30L).map { i =>
      // overlapping vocab slices + a universal hot token per doc
      val toks = (i until i + 12).map(j => s"w${j % 20}") :+ "the"
      i -> toks.mkString(" ")
    } ++ Seq(100L -> "the", 101L -> "", 102L -> "singleton only here")
    for (tpm <- Seq(300, 550, 800))
      assert(run(corpus, tpm) == brute(corpus, tpm), s"tpm=$tpm")
  }

  test("hot token shared by all docs creates no spurious pairs") {
    val docs = (0L until 10L)
      .map(i => i -> s"the common x${i}a x${i}b x${i}c x${i}d")
    assert(run(docs, tpm = 700).isEmpty)
  }

  test("partition invariance") {
    val docs = (0L until 12L).map(i => i -> s"t${i % 4} u${i % 3} v${i % 5} w")
    assert(run(docs, 400, parts = 1) == run(docs, 400, parts = 7))
  }

  test("curve rungs equal per-rung apssCosinePairs counts") {
    val docs = (0L until 30L).map { i =>
      val toks = (i until i + 12).map(j => s"w${j % 20}")
      i -> toks.mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val curve = Dedup.apssCosineCurve(df, "doc_id", "text",
        thresholdsPermil = Seq(300, 550, 800), k = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for (t <- Seq(300, 550, 800)) {
      val pairs = Dedup.apssCosinePairs(df, "doc_id", "text", t, k = 1)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      val expected =
        if (pairs.isEmpty) None
        else Some((pairs.length.toLong,
          pairs.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong))
      assert(curve.get(t.toLong) == expected, s"rung $t")
    }
  }

  test("curve refuses duplicate rungs") {
    intercept[IllegalArgumentException] {
      Dedup.apssCosineCurve(Seq(1L -> "a b").toDF("doc_id", "text"),
        "doc_id", "text", thresholdsPermil = Seq(500, 500))
    }
  }

  test("sampled curve equals the unsampled curve over the md5 slice") {
    val docs = (0L until 40L).map { i =>
      val toks = (i until i + 12).map(j => s"w${j % 20}")
      i -> toks.mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    // the sample is a doc FILTER, deterministic in the id: running the
    // unsampled curve over the manually pre-filtered slice must match
    val keep = org.apache.spark.sql.functions.expr(
      "CAST(conv(substring(md5(concat('s9', ':', " +
        "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) " +
        "% 1000000 < 500000")
    val manual = Dedup.apssCosineCurve(df.filter(keep), "doc_id", "text",
        thresholdsPermil = Seq(300, 550), k = 1)
      .as[(Long, Long, Long)].collect().toSet
    val sampled = Dedup.apssCosineCurve(df, "doc_id", "text",
        thresholdsPermil = Seq(300, 550), k = 1,
        samplePpm = 500000, sampleSalt = "s9")
      .as[(Long, Long, Long)].collect().toSet
    assert(sampled == manual && sampled.nonEmpty)
    // the slice is proper: fewer docs touched than the full curve
    val full = Dedup.apssCosineCurve(df, "doc_id", "text",
        thresholdsPermil = Seq(300, 550), k = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(sampled != full)
    intercept[IllegalArgumentException] {
      Dedup.apssCosineCurve(df, "doc_id", "text",
        thresholdsPermil = Seq(300), samplePpm = 0)
    }
  }
}
