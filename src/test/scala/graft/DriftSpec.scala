package graft

import graft.ext.Drift

import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tvd(rows: Seq[(String, Boolean, Long)], parts: Int = 4) =
    Drift.tvdPpm(rows.toDF("g", "isa", "bin").repartition(parts),
      grpCol = "g", inACol = "isa", binCol = "bin")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("identical binned distributions have TVD 0") {
    val rows = for {
      bin <- 0L until 10L
      isa <- Seq(true, false)
      _ <- 0 until 3
    } yield ("g", isa, bin)
    assert(tvd(rows) == Map("g" -> ((30L, 30L, Some(0L)))))
  }

  test("disjoint supports have TVD 1e6; hand value in between") {
    val disjoint = Seq(("g", true, 1L), ("g", true, 2L),
      ("g", false, 7L), ("g", false, 8L), ("g", false, 9L))
    assert(tvd(disjoint)("g") == ((2L, 3L, Some(1000000L))))
    // A: {1:3, 2:1}, B: {1:1, 2:3} → ½(|3/4−1/4|+|1/4−3/4|) = 1/2
    val half = Seq.fill(3)(("h", true, 1L)) ++ Seq(("h", true, 2L)) ++
      Seq(("h", false, 1L)) ++ Seq.fill(3)(("h", false, 2L))
    assert(tvd(half)("h") == ((4L, 4L, Some(500000L))))
  }

  test("a group with one empty sample reports null TVD") {
    val rows = Seq(("g", true, 1L), ("g", true, 2L))
    assert(tvd(rows)("g") == ((2L, 0L, None)))
  }

  test("TVD is partition-invariant") {
    val rows = (0 until 200).map { i =>
      ("g", i % 3 == 0, (i * 7919L) % 12L)
    }
    assert(tvd(rows, 1) == tvd(rows, 13))
  }

  private def u2(rows: Seq[(String, Boolean, Long)], parts: Int = 4) =
    Drift.mannWhitneyU2(rows.toDF("g", "isa", "v").repartition(parts),
      grpCol = "g", inACol = "isa", valCol = "v")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  /** Brute-force doubled U: 2·#{(a,b): a>b} + #{(a,b): a=b}. */
  private def bruteU2(a: Seq[Long], b: Seq[Long]): Long =
    a.map(x => 2L * b.count(x > _) + b.count(x == _)).sum

  test("matches the pairwise-comparison definition, with and without ties") {
    val a = Seq(1L, 4L, 7L, 7L, 12L)
    val b = Seq(2L, 4L, 7L, 9L)
    val rows = a.map(("g", true, _)) ++ b.map(("g", false, _))
    assert(u2(rows)("g") == ((5L, 4L, bruteU2(a, b))))
    // all-distinct case, A strictly above B → U = na·nb
    val hi = Seq(10L, 11L, 12L)
    val lo = Seq(1L, 2L)
    val rows2 = hi.map(("h", true, _)) ++ lo.map(("h", false, _))
    assert(u2(rows2)("h") == ((3L, 2L, 12L))) // 2·(3·2)
  }

  test("U2 is symmetric: u2_a + u2_b = 2·na·nb") {
    val rows = (0 until 120).map { i =>
      ("g", i % 5 < 2, (i * 104729L) % 37L)
    }
    val (na, nb, u2a) = u2(rows)("g")
    val flipped = rows.map { case (g, isa, v) => (g, !isa, v) }
    val (_, _, u2b) = u2(flipped)("g")
    assert(u2a + u2b == 2L * na * nb)
  }
}
