package graft

import graft.ext.Dedup

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Dedup.lshPlanner]]: the analytic S-curve table in exact
  * 1e9 fixed point. Oracle twin: q320.
  */
class LshPlannerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def cells(
      numHashes: Int = 128, rows: Seq[Int] = Seq(1, 2, 4, 8, 16),
      grid: Seq[Int] = (5 to 95 by 5), target: Int = 70) =
    Dedup.lshPlanner(spark, numHashes, rows, grid, target)
      .as[(Int, Int, Int, Long, Long, Long, Long, Boolean)].collect()

  test("hand-exact cell: r=2, b=2 at s=0.5") {
    // s² = 0.25 → t = 0.75 → t² = 0.5625 → p = 0.4375, all exact;
    // s=0.5 sits below the 0.7 target, so p is pure FP mass and fn = 0
    val out = cells(numHashes = 4, rows = Seq(2), grid = Seq(50))
    assert(out.toSeq == Seq((2, 2, 50, 437500000L,
      437500000L, 0L, 437500000L, true)))
  }

  test("r=1 saturates: 128 independent lanes catch s=0.5 certainly") {
    val p = cells().find(c => c._1 == 1 && c._3 == 50).get._4
    assert(p == 1000000000L, "1-(0.5)^128 floors to exactly 1.0 in fix")
  }

  test("every split's curve is monotone non-decreasing in s") {
    val bySplit = cells().groupBy(c => (c._1, c._2))
    bySplit.foreach { case (k, cs) =>
      val ps = cs.sortBy(_._3).map(_._4).toSeq
      assert(ps == ps.sorted, s"split $k not monotone: $ps")
    }
  }

  test("exactly one split is flagged best, on all its grid rows") {
    val out = cells()
    val best = out.filter(_._8).map(c => (c._1, c._2)).distinct
    assert(best.length == 1, s"best splits: ${best.toSeq}")
    assert(out.count(_._8) == 19, "flag rides every grid row of the split")
    // the flagged split's cost is the global minimum
    val costs = out.map(c => (c._1, c._2) -> c._7).toMap
    assert(costs(best.head) == costs.values.min)
  }

  test("invalid shapes refuse") {
    intercept[IllegalArgumentException] {
      Dedup.lshPlanner(spark, numHashes = 128, rows = Seq(3))
    }
    intercept[IllegalArgumentException] {
      Dedup.lshPlanner(spark, gridPct = Seq(0))
    }
  }
}
