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
}
