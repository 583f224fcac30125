package graft

import graft.ext.Kmv

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Kmv]]: exactness below k, partitioning invariance,
  * estimator calibration, and set-operation sanity.
  */
class KmvSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("below k the sketch IS the distinct count (exact)") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 9L))
      .toDF("g", "v")
    val est = Kmv.estimateDistinct(
      Kmv.sketch(df, "g", "v", k = 16), "g", k = 16)
      .as[(String, Long)].collect.toMap
    assert(est == Map("a" -> 2L, "b" -> 1L))
  }

  test("sketch and estimates are partitioning-invariant") {
    val df = (1L to 3000L).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    def run(parts: Int) =
      Kmv.estimateDistinct(
        Kmv.sketch(df.repartition(parts), "g", "v", k = 128), "g", 128)
        .orderBy("g").as[(String, Long)].collect.toSeq
    assert(run(11) == run(2))
  }

  test("distinct estimates land within 15% at k=128 over 10k values") {
    val df = (1L to 10000L).map(i => ("g", i)).toDF("g", "v")
    val est = Kmv.estimateDistinct(
      Kmv.sketch(df, "g", "v", k = 128), "g", 128)
      .as[(String, Long)].collect.head._2
    assert(math.abs(est - 10000L).toDouble / 10000 < 0.15, s"est=$est")
  }

  test("set estimates: disjoint sets intersect near zero, union near sum") {
    val a = (1L to 4000L).map(i => ("a", i))
    val b = (100001L to 104000L).map(i => ("b", i))
    val df = (a ++ b).toDF("g", "v")
    val se = Kmv.setEstimates(Kmv.sketch(df, "g", "v", k = 128), "g", 128)
      .as[(String, String, Long, Long)].collect.head
    val (_, _, estU, estI) = se
    assert(math.abs(estU - 8000L).toDouble / 8000 < 0.2, s"union=$estU")
    assert(estI < 400, s"disjoint intersect should be near 0, got $estI")
  }

  test("difference estimates: sub-k exact; calibrated on overlap; symmetric") {
    // below k the union sketch IS the union → differences are EXACT
    val small = (1L to 30L).map(i => ("a", i)) ++ (21L to 50L).map(i => ("b", i))
    val de = Kmv.differenceEstimates(
      Kmv.sketch(small.toDF("g", "v"), "g", "v", k = 128), "g", 128)
      .as[(String, String, Long, Long)].collect.head
    assert(de == ("a", "b", 20L, 20L), de.toString)
    // above k: |A|=6000 with 2000 shared, |B|=4000 → A∖B=4000, B∖A=2000
    val big = (1L to 6000L).map(i => ("a", i)) ++
      (4001L to 8000L).map(i => ("b", i))
    val db = Kmv.differenceEstimates(
      Kmv.sketch(big.toDF("g", "v"), "g", "v", k = 256), "g", 256)
      .as[(String, String, Long, Long)].collect.head
    assert(math.abs(db._3 - 4000L).toDouble / 4000 < 0.25, db.toString)
    assert(math.abs(db._4 - 2000L).toDouble / 2000 < 0.25, db.toString)
  }

  test("pairwise estimators fail fast past the group-count guard") {
    val df = (1L to 300L).map(i => (s"g${i % 5}", i)).toDF("g", "v")
    val sk = Kmv.sketch(df, "g", "v", k = 16)
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    // the guard is LAZY (row-level assert riding the estimator's own
    // job — no separate eager sketch evaluation), so it fires at action
    val e = intercept[Exception] {
      Kmv.setEstimates(sk, "g", 16, maxGroups = 3).collect()
    }
    assert(chain(e).exists(_.contains("maxGroups")), chain(e).mkString("|"))
    val e2 = intercept[Exception] {
      Kmv.differenceEstimates(sk, "g", 16, maxGroups = 3).collect()
    }
    assert(chain(e2).exists(_.contains("maxGroups")), chain(e2).mkString("|"))
    // at the cap, both run
    assert(Kmv.setEstimates(sk, "g", 16, maxGroups = 5).count() == 10L)
    assert(Kmv.differenceEstimates(sk, "g", 16, maxGroups = 5).count() == 10L)
    val e3 = intercept[Exception] {
      Kmv.setAlgebra(sk, "g", 16, maxGroups = 3).collect()
    }
    assert(chain(e3).exists(_.contains("maxGroups")), chain(e3).mkString("|"))
  }

  test("the guard kills the job before the pair grid materializes") {
    // the assert rides the distinct-GROUPS frame (the grid join's
    // INPUTS), so an oversized group set dies scanning O(|groups|) rows
    // — the quadratic (pairs × sketch) union/groupBy shuffle never runs.
    // Observable: with the guard tripping, NO stage ever writes the
    // grid's shuffle partitions for the rk window; we assert via timing
    // proxy-free plan structure instead — the assert_true filter sits
    // BELOW the pair join in the optimized plan.
    val df = (1L to 100L).map(i => (s"g${i % 5}", i)).toDF("g", "v")
    val plan = Kmv.setAlgebra(Kmv.sketch(df, "g", "v", 16), "g", 16,
      maxGroups = 3).queryExecution.optimizedPlan
    // find the join that builds the (ga < gb) grid; the guard's
    // assert_true must appear in its subtree (i.e. upstream of the join),
    // not above the final aggregate
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    val gridJoin = joins.find(
      _.condition.exists(_.sql.contains("<"))).getOrElse(
      fail("no grid join in plan:\n" + plan.treeString))
    // assert_true lowers to raise_error in the optimized plan
    assert(gridJoin.toString.contains("raise_error"),
      "guard not upstream of the grid join:\n" + plan.treeString)
  }

  test("setAlgebra equals the two separate estimators, byte for byte") {
    val rows = (1L to 6000L).map(i => ("a", i)) ++
      (4001L to 8000L).map(i => ("b", i)) ++
      (1L to 500L).map(i => ("c", i * 7))
    val sk = Kmv.sketch(rows.toDF("g", "v"), "g", "v", k = 256)
    val one = Kmv.setAlgebra(sk, "g", 256)
      .orderBy("ga", "gb")
      .as[(String, String, Long, Long, Long, Long)].collect.toSeq
    val se = Kmv.setEstimates(sk, "g", 256)
      .as[(String, String, Long, Long)].collect
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val de = Kmv.differenceEstimates(sk, "g", 256)
      .as[(String, String, Long, Long)].collect
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(one.size == 3)
    one.foreach { case (ga, gb, u, i, anb, bna) =>
      assert(se((ga, gb)) == ((u, i)), s"($ga,$gb) set mismatch")
      assert(de((ga, gb)) == ((anb, bna)), s"($ga,$gb) diff mismatch")
    }
    // one pass: setAlgebra's plan carries exactly as many grid joins as
    // ONE of the separate estimators (the pairs subtree appears once per
    // union side), so one call replaces the two — half the sketch-land
    // work
    def gridJoins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.sql.contains("<")) => j }.size
    assert(gridJoins(Kmv.setAlgebra(sk, "g", 256)) ==
      gridJoins(Kmv.setEstimates(sk, "g", 256)))
  }
}
