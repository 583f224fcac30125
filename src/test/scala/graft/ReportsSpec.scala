package graft

import graft.ext.Reports

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Reports]]: stream-maintained mergeable reports behind the
  * shared create-only version-pointer commit — batch slicing cannot
  * change the folded report, crashes leave invisible orphans, torn
  * manifests are skipped, and the commit path never renames.
  */
class ReportsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def report(rows: (String, Long, Long)*) =
    rows.toDF("rule", "n_fail", "n_only_fail")

  test("foldSummed is slicing-invariant: many folds equal one") {
    val all = report(("a", 3L, 1L), ("b", 5L, 2L), ("c", 1L, 0L))
    val oneShot = tmpDir("rep_one")
    Reports.foldSummed(spark, oneShot, all, Seq("rule"))
    val sliced = tmpDir("rep_sliced")
    Reports.foldSummed(spark, sliced, report(("a", 1L, 0L), ("b", 2L, 1L)),
      Seq("rule"))
    Reports.foldSummed(spark, sliced, report(("a", 2L, 1L), ("c", 1L, 0L)),
      Seq("rule"))
    Reports.foldSummed(spark, sliced, report(("b", 3L, 1L)), Seq("rule"))
    def rows(dir: String) = Reports.current(spark, dir).get
      .orderBy("rule").as[(String, Long, Long)].collect.toSeq
    assert(rows(sliced) == rows(oneShot))
    // column order preserved from the batch report
    assert(Reports.current(spark, sliced).get.columns.toSeq ==
      Seq("rule", "n_fail", "n_only_fail"))
  }

  test("crash mid-fold leaves the committed state untouched; retry lands") {
    val dir = tmpDir("rep_crash")
    Reports.foldSummed(spark, dir, report(("a", 1L, 1L)), Seq("rule"))
    // simulate a crash AFTER the v2 dir write but BEFORE the commit:
    // write an orphan v2 with garbage numbers and no manifest update
    report(("a", 999L, 999L)).coalesce(1).write.parquet(s"$dir/v2")
    val cur = Reports.current(spark, dir).get
      .as[(String, Long, Long)].collect.toSeq
    assert(cur == Seq(("a", 1L, 1L)), s"orphan leaked: $cur")
    // the retry overwrites the orphan and commits the true merge
    Reports.foldSummed(spark, dir, report(("a", 2L, 0L)), Seq("rule"))
    val after = Reports.current(spark, dir).get
      .as[(String, Long, Long)].collect.toSeq
    assert(after == Seq(("a", 3L, 1L)), after.toString)
  }

  test("torn manifests are skipped; reset clears all state") {
    val dir = tmpDir("rep_torn")
    Reports.foldSummed(spark, dir, report(("a", 1L, 0L)), Seq("rule"))
    Reports.foldSummed(spark, dir, report(("a", 1L, 0L)), Seq("rule"))
    // a torn higher-seq manifest (digit-prefix tear included) is not
    // trusted — readers fall back to the committed one
    val torn = new java.io.File(dir, "_current.999999999")
    val w = new java.io.FileWriter(torn); w.write("9"); w.close()
    assert(Reports.current(spark, dir).get
      .as[(String, Long, Long)].collect.toSeq == Seq(("a", 2L, 0L)))
    torn.delete()
    Reports.reset(spark, dir)
    assert(Reports.current(spark, dir).isEmpty)
  }

  test("retention keeps the previous version readable, GCs older ones") {
    val dir = tmpDir("rep_gc")
    (1 to 4).foreach(_ =>
      Reports.foldSummed(spark, dir, report(("a", 1L, 0L)), Seq("rule")))
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("v")).map(_.getName).toSet
    assert(dirs == Set("v3", "v4"), dirs.toString)
    assert(Reports.current(spark, dir).get
      .as[(String, Long, Long)].collect.toSeq == Seq(("a", 4L, 0L)))
  }

  test("the custom-merge fold applies the caller's plan") {
    val dir = tmpDir("rep_custom")
    val maxMerge = (prev: org.apache.spark.sql.DataFrame,
        fresh: org.apache.spark.sql.DataFrame) =>
      prev.unionByName(fresh).groupBy("rule")
        .agg(max("n_fail").as("n_fail"), max("n_only_fail").as("n_only_fail"))
    Reports.fold(spark, dir, report(("a", 5L, 2L)))(maxMerge)
    Reports.fold(spark, dir, report(("a", 3L, 4L)))(maxMerge)
    assert(Reports.current(spark, dir).get
      .as[(String, Long, Long)].collect.toSeq == Seq(("a", 5L, 4L)))
  }

  test("dataset card folds to the batch card under any slicing") {
    import graft.ext.TextStats
    val docs = (0L until 24L).map(i =>
      (i, s"l${i % 3}", s"s${i % 2}",
        (0 until (5 + i.toInt % 30)).map(j => s"w${(i + j) % 9}")
          .mkString(" ")))
      .toDF("doc_id", "lang", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Long)].collect.toSeq
    val oneShot = rows(TextStats.datasetCardFinish(
      TextStats.datasetCardBatch(docs, "text"))
      .orderBy("section", "item"))
    val dir = tmpDir("rep_card")
    Seq(0L, 1L, 2L).foreach { s =>
      Reports.foldSummed(spark, dir,
        TextStats.datasetCardBatch(
          docs.filter(col("doc_id") % 3 === s), "text"),
        keys = Seq("section", "item"))
    }
    val streamed = rows(TextStats.datasetCardFinish(
      Reports.current(spark, dir).get).orderBy("section", "item"))
    assert(streamed == oneShot && oneShot.nonEmpty)
    // derived distincts are present and exact
    assert(oneShot.contains(("corpus", "langs", 3L)))
    assert(oneShot.contains(("corpus", "sources", 2L)))
  }
}
