package graft

import graft.ext.{Quality, Scd2}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.ext.Quality]] rule semantics on crafted violations and
  * [[graft.ext.Scd2]] interval construction on multi-version keys,
  * including the edges the oracle fixture can't isolate: all-clean input,
  * duplicate parent keys, single-version keys, and order ties.
  */
class GovernanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("quality rules count exactly the planted violations") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(10L)), (2L, Option(11L)),
      (3L, None), (4L, Option(99L)), (4L, Option(99L)), (4L, Option(99L)))
      .toDF("pk", "fk")
    val parent = Seq(10L, 10L, 11L).toDF("id") // dup parent keys must not multiply
    val rows = Quality.report(Seq(
      Quality.notNullRule(child, "fk"),
      Quality.uniqueRule(child, "pk"),
      Quality.foreignKeyRule(child, "fk", parent, "id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows("fk_nulls") == ((1L, 7L)))
    // pk 2 appears twice (+1), pk 4 three times (+2)
    assert(rows("pk_dups") == ((3L, 7L)))
    // three rows with fk=99 have no parent; the null fk row is NOT an orphan
    assert(rows("fk_orphans") == ((3L, 7L)))
  }

  test("quality rules report zero on clean input") {
    val child = Seq((1L, 10L), (2L, 11L)).toDF("pk", "fk")
    val parent = Seq(10L, 11L).toDF("id")
    val report = Quality.report(Seq(
      Quality.notNullRule(child, "fk"),
      Quality.uniqueRule(child, "pk"),
      Quality.foreignKeyRule(child, "fk", parent, "id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report.values.forall(_ == 0L))
  }

  test("table diff counts nulls as values and detects null↔value changes") {
    import graft.ext.TableDiff
    val a = Seq((1L, Option("x")), (2L, None), (3L, Option("z")))
      .toDF("k", "v")
    val b = Seq((1L, Option("x")), (2L, Option("now")), (4L, None))
      .toDF("k", "v")
    val r = TableDiff.diffSummary(a, b, "k", Seq("v")).head()
    // 3 removed-only, 4 added-only, 2 changed (null → "now"), 1 same
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 1L, 1L, 1L)))
  }

  test("scd2 builds half-open intervals with one current row per key") {
    val changes = Seq(
      (1L, "2024-01-01", "a"), (1L, "2024-02-01", "b"),
      (1L, "2024-02-01", "c"), // tie on date → tieBreak column decides
      (2L, "2024-03-01", "x")) // single version → immediately current
      .toDF("k", "d", "v")
      .withColumn("d", to_date(col("d")))
    val h = Scd2.history(changes, col("k"), col("d"), col("v"))
      .select(col("k"), col("v"),
        date_format(col("valid_from"), "yyyy-MM-dd").as("from"),
        date_format(col("valid_to"), "yyyy-MM-dd").as("to"),
        col("is_current"))
      .as[(Long, String, String, Option[String], Boolean)]
      .collect().sortBy(r => (r._1, r._3, r._2)).toList
    assert(h == List(
      (1L, "a", "2024-01-01", Some("2024-02-01"), false),
      (1L, "b", "2024-02-01", Some("2024-02-01"), false),
      (1L, "c", "2024-02-01", None, true),
      (2L, "x", "2024-03-01", None, true)))
    // exactly one current row per key
    val cur = h.filter(_._5).groupBy(_._1).view.mapValues(_.size).toMap
    assert(cur == Map(1L -> 1, 2L -> 1))
  }
}
