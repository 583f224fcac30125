package graft

import graft.ext.Cms

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CmsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Zipf-ish skewed keys: key k appears ~600/k times, k = 1..40.
  private val skewed: Seq[Long] =
    (1 to 40).flatMap(k => Seq.fill(600 / k)(k.toLong))

  private def estimates(
      obs: Seq[Long], depth: Int = 4, width: Int = 512,
      parts: Int = 4): Map[Long, Long] = {
    val df = obs.toDF("k").repartition(parts)
    val sk = Cms.sketch(df, "k", depth, width)
    Cms.estimate(sk, df.select("k").distinct(), "k", depth, width)
      .as[(Long, Long)].collect().toMap
  }

  test("estimates never undercount, and are exact sans collisions") {
    val truth = skewed.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    val est = estimates(skewed)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"key $k undercounted: ${est(k)} < $t")
    }
    // 40 keys × 4 rows into 512 buckets: most rows collision-free, so the
    // min across rows recovers the exact count for every key here.
    assert(truth.forall { case (k, t) => est(k) == t })
  }

  test("a narrow sketch overcounts but never undercounts") {
    val truth = skewed.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    val est = estimates(skewed, depth = 2, width = 8)
    truth.foreach { case (k, t) => assert(est(k) >= t) }
    assert(truth.exists { case (k, t) => est(k) > t },
      "8 buckets for 40 keys must collide somewhere")
  }

  test("sketches merge: counter-wise sum of halves equals whole") {
    val (h1, h2) = skewed.splitAt(skewed.size / 2)
    val merged = Cms.sketch(h1.toDF("k"), "k")
      .unionByName(Cms.sketch(h2.toDF("k"), "k"))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Cms.sketch(skewed.toDF("k"), "k")
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("join-size estimate never undercounts, exact sans collisions") {
    val a = skewed
    val b = (1 to 40).flatMap(k => Seq.fill(k)(k.toLong)) // reversed skew
    val truth = {
      val ca = a.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val cb = b.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
    }
    val est = Cms.joinSizeEstimate(
      Cms.sketch(a.toDF("k"), "k"), Cms.sketch(b.toDF("k"), "k"))
      .as[Long].collect().head
    assert(est >= truth)
    // 40 keys into 4×512 buckets: some hash row is collision-free, so the
    // min across rows recovers the exact inner product here.
    assert(est == truth)
  }

  test("a narrow join-size sketch overcounts but never undercounts") {
    val a = skewed
    val b = skewed.reverse
    val truth = a.groupBy(identity)
      .map { case (k, v) => v.size.toLong * v.size.toLong }.sum
    val est = Cms.joinSizeEstimate(
      Cms.sketch(a.toDF("k"), "k", 2, 8), Cms.sketch(b.toDF("k"), "k", 2, 8))
      .as[Long].collect().head
    assert(est >= truth)
    assert(est > truth, "8 buckets for 40 keys must collide somewhere")
  }

  test("build is partition-invariant; empty sketch estimates 0") {
    assert(estimates(skewed, parts = 1) == estimates(skewed, parts = 13))
    val sk = Cms.sketch(Seq.empty[Long].toDF("k"), "k")
    val est = Cms.estimate(sk, Seq(7L).toDF("k"), "k")
      .as[(Long, Long)].collect().toMap
    assert(est == Map(7L -> 0L))
  }
}
