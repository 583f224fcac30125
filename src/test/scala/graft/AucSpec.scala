package graft

import graft.ext.TextStats

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.TextStats.rocAuc]] / [[graft.ext.TextStats.prCurve]]:
  * the integer Mann–Whitney AUC and the PR ladder, checked against a
  * brute pairwise computation over the SAME (margin, label) rows the
  * operators derive. Oracle twins: q334/q335.
  */
class AucSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Mixed-quality corpus: stopword-rich docs score high margins and low
    * surprisal (pos), digit/upper-heavy ones the reverse; duplicates of
    * one text plant margin TIES across labels.
    */
  private def corpus(): DataFrame = {
    val good = (0 until 8).map(i =>
      (i.toLong, "the of and to a in is it " * (i + 2)))
    val bad = (8 until 14).map(i =>
      (i.toLong, s"X9$i 77${i}Z QQ$i 123456 ZZTOP$i UPPER$i NUM${i}77"))
    val tied = (14 until 18).map(i =>
      (i.toLong, "the of and zz zz zz zz zz"))
    // cross-label margin TIE: identical counting features (8 lowercase
    // letter tokens, no stopwords/digits/uppercase) but opposite labels
    // — common token zz scores low surprisal, eight uniques score high
    val tiePos = Seq((18L, "zz zz zz zz zz zz zz zz"))
    val tieNeg = Seq((19L, "qa qb qc qd qe qf qg qh"))
    (good ++ bad ++ tied ++ tiePos ++ tieNeg).toDF("doc_id", "text")
  }

  private def labeled(): Seq[(Long, Long)] = {
    val df = corpus()
    val m = TextStats.classifierMargin(df, "doc_id", "text")
      .select($"doc_id", $"margin").as[(Long, Long)].collect.toMap
    val s = TextStats.surprisalBits(df, "doc_id", "text")
      .select($"doc_id", $"avg_millibits").as[(Long, Long)].collect.toMap
    m.keys.toSeq.sorted.map(id =>
      (m(id), if (s(id) < 4250L) 1L else 0L))
  }

  test("rocAuc equals the brute pairwise definition (ties at half weight)") {
    val rows = labeled()
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty, s"fixture degenerate: $rows")
    // brute: Σ over (pos, neg) pairs of [1 if p > n, 0.5 if tie] — in
    // doubled units to stay integral
    val num2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val den2 = 2L * pos.size * neg.size
    val expectedPpm =
      (num2 / den2) * 1000000L + ((num2 % den2) * 1000000L) / den2
    val got = TextStats.rocAuc(corpus(), "doc_id", "text")
      .select($"n_pos", $"n_neg", $"auc_ppm")
      .as[(Long, Long, Long)].head()
    assert(got == ((pos.size.toLong, neg.size.toLong, expectedPpm)), got)
    // the fixture exercised an imperfect AUC (the planted cross-label
    // margin tie costs exactly half a pair), not a trivial 0/1
    assert(got._3 > 500000L && got._3 < 1000000L, got.toString)
    assert(pos.exists(p => neg.contains(p)),
      "fixture must plant a cross-label margin tie")
  }

  test("rocAuc refuses a single-class eval set") {
    val oneClass = (0 until 6).map(i =>
      (i.toLong, "the of and to a in is it " * 3)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextStats.rocAuc(oneClass, "doc_id", "text").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("single class"),
      e.getMessage)
  }

  test("prCurve rungs equal brute confusion counts") {
    val rows = labeled()
    val thresholds = Seq(100000L, 300000L, 500000L)
    val got = TextStats.prCurve(corpus(), "doc_id", "text", thresholds)
      .select($"threshold", $"tp", $"fp", $"fn",
        $"precision_ppm", $"recall_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect.toSeq.sorted
    val expected = thresholds.sorted.map { t =>
      val tp = rows.count(r => r._1 >= t && r._2 == 1L).toLong
      val fp = rows.count(r => r._1 >= t && r._2 == 0L).toLong
      val fn = rows.count(r => r._1 < t && r._2 == 1L).toLong
      val prec = if (tp + fp == 0) 0L else tp * 1000000L / (tp + fp)
      val rec = if (tp + fn == 0) 0L else tp * 1000000L / (tp + fn)
      (t, tp, fp, fn, prec, rec)
    }
    assert(got == expected, s"$got vs $expected")
    intercept[IllegalArgumentException] {
      TextStats.prCurve(corpus(), "doc_id", "text", Seq(1L, 1L))
    }
  }
}
