package graft

import graft.ext.Intervals

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the gaps-and-islands sweep (q114's operator): on
  * random interval sets the distributed two-window form must match a
  * brute-force sequential merge, including the adjacency-merges rule and
  * duplicate/contained/equal-start edge cases the generator is biased to
  * produce (small coordinate range → heavy overlap). Generators run from
  * a fixed seed (no scalatestplus bridge on the classpath), so failures
  * replay deterministically.
  */
class IntervalUnionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def bruteForce(iv: Seq[(Long, Long)]): (Long, Long) = {
    // sequential sweep over the sorted intervals; merge when s <= curEnd
    val sorted = iv.sortBy(x => (x._1, x._2))
    var nIslands = 0L
    var covered = 0L
    var curS = 0L
    var curT = Long.MinValue
    for ((s, t) <- sorted) {
      if (curT == Long.MinValue || s > curT) {
        if (curT != Long.MinValue) covered += curT - curS
        nIslands += 1; curS = s; curT = t
      } else if (t > curT) curT = t
    }
    if (curT != Long.MinValue) covered += curT - curS
    (nIslands, covered)
  }

  private val intervalsGen: Gen[List[(Int, Long, Long)]] =
    Gen.listOfN(60, for {
      key <- Gen.choose(0, 3)
      s <- Gen.choose(0L, 40L)
      len <- Gen.choose(1L, 12L)
    } yield (key, s, s + len))

  test("coverage matches brute-force merge on random heavy-overlap sets") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(4242L)
    for (i <- 1 to 20) {
      val iv = intervalsGen.apply(params, seed)
        .getOrElse(fail(s"generator returned no sample at iteration $i"))
      seed = seed.next
      val got = Intervals.coverage(iv.toDF("k", "s", "t"), "k", "s", "t")
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val want = iv.groupBy(_._1).view
        .mapValues(xs => bruteForce(xs.map(x => (x._2, x._3)))).toMap
      assert(got == want, s"iteration $i: iv=$iv")
    }
  }

  test("adjacent intervals merge into one island") {
    val df = Seq((1, 0L, 10L), (1, 10L, 20L)).toDF("k", "s", "t")
    val Array(r) = Intervals.coverage(df, "k", "s", "t").collect()
    assert((r.getLong(1), r.getLong(2)) == ((1L, 20L)))
  }
}
