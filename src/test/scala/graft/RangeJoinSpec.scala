package graft

import graft.ext.RangeJoin

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.ext.RangeJoin]] against the naive theta join: exact-once
  * pair emission across bucket widths (including widths that misalign
  * with interval bounds), half-open boundary semantics, negative
  * positions, and left-join preservation of point-free intervals.
  */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val intervals = Seq(
    (1L, 0L, 10L),    // aligned
    (2L, 5L, 6L),     // single-point span
    (3L, -25L, -3L),  // negative positions
    (4L, 7L, 35L),    // straddles several buckets
    (5L, 100L, 110L)) // no points inside
    .toDF("iid", "lo", "hi")
  private lazy val points =
    Seq(-25L, -4L, -3L, 0L, 5L, 6L, 9L, 10L, 34L, 35L, 64L)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")

  private def thetaPairs: Set[(Long, Long)] =
    intervals.join(points,
        col("t") >= col("lo") && col("t") < col("hi"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet

  test("bucketed inner join equals the theta join for any width") {
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(
          intervals, "lo", "hi", points, "t", bucketWidth = w)
        .select("iid", "pid").as[(Long, Long)].collect().toList
      assert(got.toSet == thetaPairs, s"width=$w")
      assert(got.size == got.distinct.size, s"width=$w emitted duplicates")
    }
    // boundary semantics: t=10 not in [0,10), t=5 in [5,6), t=-25 in [-25,-3)
    assert(!thetaPairs.contains((1L, 7L)))
    assert(thetaPairs.contains((2L, 4L)))
    assert(thetaPairs.contains((3L, 0L)))
  }

  test("randomized intervals/points match the theta join (fixed seed)") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 5) {
      val iv = (1 to 40).map { i =>
        val lo = rnd.nextInt(200) - 100L
        (i.toLong, lo, lo + 1 + rnd.nextInt(60))
      }.toDF("iid", "lo", "hi")
      val pts = (1 to 150).map(i => (i.toLong, rnd.nextInt(260) - 130L))
        .toDF("pid", "t")
      val theta = iv.join(pts, col("t") >= col("lo") && col("t") < col("hi"))
        .select("iid", "pid").as[(Long, Long)].collect().toSet
      val w = 1 + rnd.nextInt(40)
      val got = RangeJoin.pointInInterval(iv, "lo", "hi", pts, "t", w)
        .select("iid", "pid").as[(Long, Long)].collect().toList
      assert(got.toSet == theta, s"round=$round width=$w")
      assert(got.size == got.distinct.size, s"round=$round width=$w dups")
    }
  }

  test("left join emits matched pairs plus exactly one row per point-free interval") {
    val rows = RangeJoin.pointInInterval(
        intervals, "lo", "hi", points, "t", bucketWidth = 7, how = "left")
      .select(col("iid"), col("pid")).as[(Long, Option[Long])]
      .collect().toList
    // matched rows ≡ theta join, no spurious null rows for matched intervals
    assert(rows.collect { case (i, Some(p)) => (i, p) }.toSet == thetaPairs)
    // unmatched interval 5 appears exactly once, with a null point
    assert(rows.filter(_._1 == 5L) == List((5L, None)))
    assert(rows.count(_._2.isEmpty) == 1)
    // count aggregation over the left result matches the theta counts
    val counts = rows.groupBy(_._1).view
      .mapValues(_.count(_._2.nonEmpty).toLong).toMap
    val theta = thetaPairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(counts == theta ++ Map(5L -> 0L))
  }
}
