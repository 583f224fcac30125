package graft

import graft.ext.RecordLinkage

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.RecordLinkage]]: weight arithmetic, the NULL-is-
  * uninformative convention, and threshold classification.
  */
class RecordLinkageSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("agreement weights sum; NULL agreement contributes zero") {
    val pairs = Seq(
      (1L, Some(true), Some(true)),    // +1000 + 500
      (2L, Some(true), Some(false)),   // +1000 - 700
      (3L, Some(false), Some(false)),  // -200 - 700
      (4L, None, Some(true)),          // 0 + 500 (missing field: no vote)
      (5L, None, None))                // 0
      .toDF("id", "a_x", "a_y")
    val got = RecordLinkage.fsScore(pairs,
      Seq("a_x" -> (1000, -200), "a_y" -> (500, -700)))
      .select("id", "score_milli").as[(Long, Long)].collect.toMap
    assert(got == Map(1L -> 1500L, 2L -> 300L, 3L -> -900L,
      4L -> 500L, 5L -> 0L))
  }

  test("classify splits exactly at the threshold (>=)") {
    val pairs = Seq((1L, true), (2L, false)).toDF("id", "a_x")
    val got = RecordLinkage.classify(pairs, Seq("a_x" -> (400, -400)), 400L)
      .select("id", "is_link").as[(Long, Boolean)].collect.toMap
    assert(got == Map(1L -> true, 2L -> false))
  }

  test("blocking requires shared key columns and bounds the candidates") {
    val l = Seq((1L, "b1"), (2L, "b2")).toDF("lid", "blk")
    val r = Seq((10L, "b1"), (11L, "b1"), (12L, "b3")).toDF("rid", "blk")
    val cand = RecordLinkage.blockedCandidates(l, r, Seq("blk"))
    assert(cand.select("lid", "rid").as[(Long, Long)].collect.toSet ==
      Set((1L, 10L), (1L, 11L)))
    intercept[IllegalArgumentException] {
      RecordLinkage.blockedCandidates(l, r, Nil)
    }
  }

  test("EM separates matches from non-matches on a planted mixture") {
    // 200 pairs: 40 true matches (fields mostly agree), 160 non-matches
    // (fields mostly disagree) — the classical two-component mixture
    val rows = (1 to 200).map { i =>
      val isMatch = i <= 40
      val f1 = if (isMatch) i % 10 != 0 else i % 20 == 0 // 90% vs 5%
      val f2 = if (isMatch) i % 5 != 0 else i % 10 == 0  // 80% vs 10%
      (i.toLong, f1, f2)
    }.toDF("id", "a_f1", "a_f2")
    val res = RecordLinkage.emEstimate(rows, Seq("a_f1", "a_f2"), rounds = 5)
    // learned m well above learned u for both informative fields
    assert(res.m(0) > 2 * res.u(0), s"m=${res.m} u=${res.u}")
    assert(res.m(1) > 2 * res.u(1), s"m=${res.m} u=${res.u}")
    // match proportion recovered near the planted 20%
    assert(res.p > 100000000L && res.p < 350000000L, s"p=${res.p}")
    // posterior classification at 0.5 finds a match-sized link set
    val links = res.patterns.filter(_._3 >= 500000000L).map(_._2).sum
    assert(links >= 30L && links <= 60L, s"links=$links")
  }

  test("EM is partitioning-invariant and replay-deterministic") {
    val rows = (1 to 500).map { i =>
      (i.toLong, i % 3 == 0, i % 7 != 0, if (i % 11 == 0) None else Some(i % 2 == 0))
    }.toDF("id", "a_x", "a_y", "a_z")
    val a = RecordLinkage.emEstimate(rows.repartition(13),
      Seq("a_x", "a_y", "a_z"), rounds = 4)
    val b = RecordLinkage.emEstimate(rows.repartition(3),
      Seq("a_x", "a_y", "a_z"), rounds = 4)
    assert(a.m == b.m && a.u == b.u && a.p == b.p)
    assert(a.patterns == b.patterns)
    // NULL agreements were present (a_z) and did not poison the fit
    assert(a.patterns.exists(_._1(2).isEmpty))
  }

  test("decision bands respect the error targets with link precedence") {
    val rows = (1 to 200).map { i =>
      val isMatch = i <= 40
      val f1 = if (isMatch) i % 10 != 0 else i % 20 == 0
      val f2 = if (isMatch) i % 5 != 0 else i % 10 == 0
      (i.toLong, f1, f2)
    }.toDF("id", "a_f1", "a_f2")
    val em = RecordLinkage.emEstimate(rows, Seq("a_f1", "a_f2"), rounds = 5)
    val Nano = RecordLinkage.Nano
    val bands = RecordLinkage.decisionBands(em,
      muNano = Nano / 100, lambdaNano = Nano / 20)
    // the surface is total: every fitted pattern gets exactly one band
    assert(bands.map(_.gamma).toSet == em.patterns.map(_._1).toSet)
    assert(bands.forall(b =>
      Set("link", "nonlink", "review").contains(b.decision)))
    // the LINK set's expected false-link mass stays within mu
    val totU = bands.map(b => BigInt(Nano - b.posteriorNano) * b.count).sum
    val linkU = bands.filter(_.decision == "link")
      .map(b => BigInt(Nano - b.posteriorNano) * b.count).sum
    assert(linkU <= BigInt(Nano / 100) * totU / Nano, s"$linkU vs $totU")
    // the NONLINK set's expected missed-match mass stays within lambda
    val totM = bands.map(b => BigInt(b.posteriorNano) * b.count).sum
    val nlM = bands.filter(_.decision == "nonlink")
      .map(b => BigInt(b.posteriorNano) * b.count).sum
    assert(nlM <= BigInt(Nano / 20) * totM / Nano, s"$nlM vs $totM")
    // bands are CONTIGUOUS in ratio order: no nonlink outranks a link,
    // no review outranks a link, no nonlink outranks a review
    val order = bands.sortBy(-_.ratioNano).map(_.decision)
    val rank = Map("link" -> 0, "review" -> 1, "nonlink" -> 2)
    assert(order.map(rank) == order.map(rank).sorted, order.toString)
    // lax targets: everything decided, link precedence on overlap (the
    // call must not throw and must stay total)
    val lax = RecordLinkage.decisionBands(em, Nano, Nano)
    assert(lax.forall(_.decision != "review"))
    assert(lax.map(_.gamma).toSet == bands.map(_.gamma).toSet)
  }
}
