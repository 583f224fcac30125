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

  // ---- goldenRecord (oracle twin: q294) ----

  private def golden(rows: Seq[(Long, Int, Long, String, String)],
      rules: Seq[(String, String)]) =
    RecordLinkage.goldenRecord(
      rows.toDF("ent", "prio", "rec", "f1", "f2"),
      "ent", "prio", "rec", rules)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("priority rule: best source wins, nulls fall through") {
    val g = golden(Seq(
      (1L, 1, 100L, null, "a"),   // f1 null at prio 1
      (1L, 2, 300L, "fromB", "b"),
      (1L, 3, 200L, "fromC", "c"),
      (2L, 1, 100L, "keep", "x"),
      (2L, 2, 900L, "newer-but-lower-prio", "y")),
      Seq("f1" -> "priority"))
    assert(g(1L).getString(1) == "fromB")
    assert(g(2L).getString(1) == "keep")
    assert(g(2L).getLong(2) == 2L)   // n_records
    assert(g(2L).getLong(3) == 900L) // last_recency
  }

  test("recent rule: freshest non-null wins regardless of priority") {
    val g = golden(Seq(
      (1L, 1, 100L, "old", "a"),
      (1L, 3, 500L, "fresh", "b"),
      (1L, 2, 500L, "fresh-tie-higher-prio", "c")),
      Seq("f1" -> "recent"))
    // recency ties break on priority asc
    assert(g(1L).getString(1) == "fresh-tie-higher-prio")
  }

  test("majority rule: consensus wins; count ties break on the value") {
    val g = golden(Seq(
      (1L, 1, 100L, "v", "x"),
      (1L, 2, 200L, "v", "y"),
      (1L, 3, 300L, "w", "y"),
      (2L, 1, 100L, "b", "x"),
      (2L, 2, 200L, "a", "x")),
      Seq("f1" -> "majority", "f2" -> "majority"))
    assert(g(1L).getString(1) == "v")   // 2 votes beat 1
    assert(g(1L).getString(2) == "y")
    assert(g(2L).getString(1) == "a")   // 1-1 tie → value asc
  }

  test("an all-null field yields a null golden value, not a crash") {
    val g = golden(Seq(
      (1L, 1, 100L, null, null),
      (1L, 2, 200L, null, null)),
      Seq("f1" -> "priority", "f2" -> "majority"))
    assert(g(1L).isNullAt(1) && g(1L).isNullAt(2))
    assert(g(1L).getLong(3) == 2L)
  }

  test("goldenRecord is partition-invariant") {
    val rows = (1L to 40L).flatMap(e => Seq(
      (e, 1, 100L, s"a$e", "x"),
      (e, 2, 200L, s"b$e", if (e % 2 == 0) "x" else "y")))
    def run(parts: Int) = RecordLinkage.goldenRecord(
      rows.toDF("ent", "prio", "rec", "f1", "f2").repartition(parts),
      "ent", "prio", "rec",
      Seq("f1" -> "recent", "f2" -> "majority"))
      .collect().map(_.toSeq).toSet
    assert(run(2) == run(17))
  }
}
