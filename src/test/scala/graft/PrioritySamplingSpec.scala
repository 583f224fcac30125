package graft

import graft.ext.PrioritySampling

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.PrioritySampling]]: exact-sum collapse below k,
  * partitioning invariance, k-bound, and estimator calibration on a
  * known workload.
  */
class PrioritySamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("a table smaller than k estimates EXACTLY (tau = 0)") {
    val df = Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"))
      .toDF("id", "w", "g")
    val s = PrioritySampling.prioritySample(df, "id", "w", k = 10)
    assert(s.select("_tau").distinct.as[Long].collect.toSeq == Seq(0L))
    val est = PrioritySampling.subsetEstimates(s, "g", "w")
      .select("g", "est_total").as[(String, Long)].collect.toMap
    assert(est == Map("a" -> 30L, "b" -> 30L))
  }

  test("sample size is exactly k and is partitioning-invariant") {
    val df = (1L to 5000L).map(i => (i, (i % 97) + 1, s"g${i % 7}"))
      .toDF("id", "w", "g")
    val a = PrioritySampling.prioritySample(df.repartition(13), "id", "w", 500)
      .select("id").as[Long].collect.toSeq.sorted
    val b = PrioritySampling.prioritySample(df.repartition(3), "id", "w", 500)
      .select("id").as[Long].collect.toSeq.sorted
    assert(a.size == 500 && a == b)
  }

  test("weights past the fixed-point bound fail fast, never wrap negative") {
    val bad = Seq((1L, PrioritySampling.MaxWeight + 1, "g"))
      .toDF("id", "w", "g")
    val e = intercept[Exception] {
      PrioritySampling.prioritySample(bad, "id", "w", 4).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("overflow")), chain(e).mkString("|"))
    // the bound itself is admissible
    val ok = Seq((1L, PrioritySampling.MaxWeight, "g")).toDF("id", "w", "g")
    assert(PrioritySampling.prioritySample(ok, "id", "w", 4).count() == 1L)
  }

  test("at-least-once replay: re-merging an already-folded batch is a no-op") {
    // the q256 crash window: state persisted, then the SAME batch
    // redelivered — mergeTopK(state ∪ batch) must not let the duplicate
    // rows burn two of the k+1 slots (which would displace a genuine row
    // and skew tau)
    val k = 50
    val all = (1L to 2000L).map(i => (i, (i % 97) + 1, s"g${i % 7}"))
      .toDF("id", "w", "g")
    val (b1, b2) = (all.filter(col("id") <= 1000), all.filter(col("id") > 1000))
    val ann1 = PrioritySampling.annotate(b1, "id", "w")
    val ann2 = PrioritySampling.annotate(b2, "id", "w")
    val state = PrioritySampling.mergeTopK(ann1.unionByName(ann2), "id", k)
    // redeliver batch 2 on top of the committed state
    val replayed = PrioritySampling.mergeTopK(state.unionByName(ann2), "id", k)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "_prio").as[(Long, Long)].collect.toSeq.sorted
    assert(key(replayed) == key(state))
    assert(replayed.count() == k + 1)
    // and the finalized sample + estimates are bit-identical
    val sA = PrioritySampling.finalizeSample(state, "id", k)
    val sB = PrioritySampling.finalizeSample(replayed, "id", k)
    val eA = PrioritySampling.subsetEstimates(sA, "g", "w")
      .select("g", "est_total").as[(String, Long)].collect.toMap
    val eB = PrioritySampling.subsetEstimates(sB, "g", "w")
      .select("g", "est_total").as[(String, Long)].collect.toMap
    assert(eA == eB)
  }

  test("wide path: weights near 2^60 sample exactly, no overflow, heavy certainty") {
    // the regime the BIGINT fixed point cannot touch: token-count /
    // byte-sized weights far past MaxWeight (~2^23)
    val big = 1L << 60
    val df = ((1L to 400L).map(i => (i, (i % 50) + 1000L, "small")) ++
      (401L to 410L).map(i => (i, big + i, "huge"))).toDF("id", "w", "g")
    val s = PrioritySampling.prioritySampleWide(df, "id", "w", k = 100)
    assert(s.count() == 100)
    // every huge item is a certainty member (w >= tau by priority >= w)
    assert(s.filter(col("g") === "huge").count() == 10)
    val est = PrioritySampling.subsetEstimatesWide(s, "g", "w")
      .select("g", "est_total")
      .as[(String, java.math.BigDecimal)].collect.toMap
    val exactHuge = df.filter(col("g") === "huge")
      .agg(sum(col("w").cast("decimal(38,0)"))).as[java.math.BigDecimal]
      .collect.head
    // huge items are certainty items with w > tau, so their subset
    // estimate is EXACT — and it sits far beyond BIGINT's reach
    assert(est("huge").compareTo(exactHuge) == 0, s"${est("huge")} vs $exactHuge")
    assert(exactHuge.compareTo(new java.math.BigDecimal(Long.MaxValue)) > 0)
  }

  test("wide path: n <= k collapses to the exact sums; partitioning-invariant") {
    val df = Seq((1L, 1L << 58, "a"), (2L, 3L, "a"), (3L, (1L << 59) + 7, "b"))
      .toDF("id", "w", "g")
    val s = PrioritySampling.prioritySampleWide(df, "id", "w", k = 10)
    val est = PrioritySampling.subsetEstimatesWide(s, "g", "w")
      .select("g", "est_total")
      .as[(String, java.math.BigDecimal)].collect.toMap
    assert(est("a").longValueExact == (1L << 58) + 3L)
    assert(est("b").longValueExact == (1L << 59) + 7L)
    val wide = (1L to 5000L).map(i => (i, (1L << 40) + (i % 97) + 1, s"g${i % 7}"))
      .toDF("id", "w", "g")
    val a = PrioritySampling.prioritySampleWide(wide.repartition(13), "id", "w", 500)
      .select("id").as[Long].collect.toSeq.sorted
    val b = PrioritySampling.prioritySampleWide(wide.repartition(3), "id", "w", 500)
      .select("id").as[Long].collect.toSeq.sorted
    assert(a.size == 500 && a == b)
  }

  test("subset estimates land near the exact sums on a skewed workload") {
    // heavy-tailed weights: the regime priority sampling exists for
    val df = (1L to 20000L)
      .map(i => (i, if (i % 1000 == 0) 50000L else (i % 50) + 1,
        s"g${i % 5}"))
      .toDF("id", "w", "g")
    val s = PrioritySampling.prioritySample(df, "id", "w", 2000)
    val est = PrioritySampling.subsetEstimates(s, "g", "w")
      .select("g", "est_total").as[(String, Long)].collect.toMap
    val exact = df.groupBy("g").agg(sum("w").as("s"))
      .select("g", "s").as[(String, Long)].collect.toMap
    exact.foreach { case (g, ex) =>
      val e = est(g)
      assert(math.abs(e - ex).toDouble / ex < 0.15,
        s"$g: est $e vs exact $ex")
    }
    // the heavy items are all in the sample (w >= tau ⇒ certainty items)
    val heavyIn = s.filter(col("w") === 50000L).count()
    assert(heavyIn == 20L, s"all 20 heavy items must be sampled, got $heavyIn")
  }
}
