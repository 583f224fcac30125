package graft

import graft.ext.Bucketing

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def withForcedSmj[A](body: => A): A = {
    // disable both the static and the AQE broadcast thresholds so the
    // join planner must keep a sort-merge join
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed-on-key join and aggregation run with zero shuffles") {
    val dir = tmpDir("bucketed")
    val left = (1L to 200L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 200L).filter(_ % 2 == 0)
      .map(k => (k, s"r$k")).toDF("k2", "rv")
    Bucketing.writeBucketed(left, "k", 4, s"$dir/left", "bspec_left")
    Bucketing.writeBucketed(
      right.withColumnRenamed("k2", "k"), "k", 4, s"$dir/right",
      "bspec_right")
    val l = spark.table("bspec_left")
    val r = spark.table("bspec_right")
    withForcedSmj {
      val joined = l.join(r, "k")
      val rows = joined.collect()
      assert(rows.length == 100)
      assert(Bucketing.shuffleCount(joined) == 0)

      // aggregation keyed by the bucket column is also exchange-free
      val agg = l.groupBy("k").agg(count(lit(1)).as("n"))
      agg.collect()
      assert(Bucketing.shuffleCount(agg) == 0)

      // control: the same join over the raw (un-bucketed) frames shuffles
      val raw = left.join(right, left("k") === right("k2"))
      raw.collect()
      assert(Bucketing.shuffleCount(raw) > 0)
    }
  }

  test("bucketed join matches the plain join's result") {
    val dir = tmpDir("bucketed_eq")
    val l0 = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (2L, 5.0))
      .toDF("k", "v")
    val r0 = Seq((1L, "a"), (2L, "b")).toDF("k", "g")
    Bucketing.writeBucketed(l0, "k", 2, s"$dir/l", "bspec_eq_l")
    Bucketing.writeBucketed(r0, "k", 2, s"$dir/r", "bspec_eq_r")
    val got = spark.table("bspec_eq_l")
      .join(spark.table("bspec_eq_r"), "k")
      .groupBy("g").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 10.0, "b" -> 25.0))
  }
}
