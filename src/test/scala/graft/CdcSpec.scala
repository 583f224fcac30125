package graft

import graft.ext.Cdc

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.ext.Cdc]] merge semantics: highest-seq wins, delete wins
  * seq ties, deletes of absent keys are no-ops, and unchanged keys pass
  * through untouched.
  */
class CdcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(
      cur: Seq[(Long, String)],
      chg: Seq[(Long, String, String, Long)]): Map[Long, (String, String)] =
    Cdc.apply(
        cur.toDF("k", "v"),
        chg.toDF("k", "op", "v", "seq"),
        keyCol = "k", opCol = "op", seqCol = "seq")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("highest sequence number wins across interleaved ops") {
    val out = run(
      cur = Seq((1L, "orig")),
      chg = Seq((1L, "U", "a", 1L), (1L, "D", null, 2L), (1L, "U", "b", 3L)))
    assert(out == Map(1L -> (("b", "updated"))))
  }

  test("delete wins a sequence tie, making replays converge") {
    val out = run(
      cur = Seq((1L, "orig"), (2L, "other")),
      chg = Seq((1L, "U", "a", 5L), (1L, "D", null, 5L)))
    assert(out == Map(2L -> (("other", "kept"))))
  }

  test("delete of an absent key is a no-op; unchanged keys pass through") {
    val out = run(
      cur = Seq((1L, "orig")),
      chg = Seq((99L, "D", null, 1L)))
    assert(out == Map(1L -> (("orig", "kept"))))
  }

  test("insert-over-existing replaces payload and reports updated") {
    val out = run(
      cur = Seq((1L, "orig")),
      chg = Seq((1L, "I", "fresh", 1L), (2L, "I", "new", 1L)))
    assert(out == Map(1L -> (("fresh", "updated")), 2L -> (("new", "inserted"))))
  }
}
