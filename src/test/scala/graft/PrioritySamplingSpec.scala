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
