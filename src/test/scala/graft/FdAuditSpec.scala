package graft

import graft.ext.Profile

import org.scalatest.funsuite.AnyFunSuite

class FdAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def audit(
      rows: Seq[(String, Option[String])],
      fds: Seq[(String, String)],
      parts: Int = 4): Map[String, (Long, Long, Long, Long, Boolean)] =
    Profile.fdAudit(rows.toDF("a", "b").repartition(parts), fds)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("g3 counts the minimum deletions, per direction") {
    // x → {1, 1, 2}: keep the two 1s, delete one row. y → {3}: clean.
    val rows = Seq(("x", Some("1")), ("x", Some("1")), ("x", Some("2")),
      ("y", Some("3")))
    val out = audit(rows, Seq("a" -> "b", "b" -> "a"))
    assert(out("a->b") == ((4L, 2L, 1L, 1L, false)))
    // Reverse direction: every b value maps to exactly one a — holds.
    assert(out("b->a") == ((4L, 3L, 0L, 0L, true)))
  }

  test("NULL is a dependent value of its own") {
    val rows = Seq(("x", Some("1")), ("x", None), ("y", None))
    val out = audit(rows, Seq("a" -> "b"))
    // x maps to {1, NULL} → one deletion; y maps to {NULL} only → clean.
    assert(out("a->b") == ((3L, 2L, 1L, 1L, false)))
  }

  test("a key column determines everything; audit is partition-invariant") {
    val rows = (0 until 60).map(i => (i.toString, Some((i % 7).toString)))
    val out = audit(rows, Seq("a" -> "b"))
    assert(out("a->b") == ((60L, 60L, 0L, 0L, true)))
    assert(audit(rows, Seq("a" -> "b", "b" -> "a"), parts = 1) ==
      audit(rows, Seq("a" -> "b", "b" -> "a"), parts = 11))
  }
}
