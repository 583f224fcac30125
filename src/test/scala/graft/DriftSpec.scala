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

  private def ks(rows: Seq[(String, Boolean, Long)], parts: Int = 4) =
    Drift.ksPpm(rows.toDF("g", "isa", "v").repartition(parts),
      grpCol = "g", inACol = "isa", valCol = "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  /** Brute-force sup over observed values of |F_A − F_B| in ppm. */
  private def bruteKs(a: Seq[Long], b: Seq[Long]): Long = {
    val sup = (a ++ b).distinct.map { x =>
      math.abs(a.count(_ <= x).toLong * b.size - b.count(_ <= x).toLong * a.size)
    }.max
    1000000L * sup / (a.size.toLong * b.size)
  }

  test("KS matches the brute-force CDF supremum, with ties") {
    val a = Seq(1L, 4L, 7L, 7L, 12L)
    val b = Seq(2L, 4L, 7L, 9L)
    assert(ks(a.map(("g", true, _)) ++ b.map(("g", false, _)))("g") ==
      ((5L, 4L, Some(bruteKs(a, b)))))
  }

  test("identical samples give KS 0; disjoint ranges give KS 1e6") {
    val same = Seq(1L, 2L, 3L)
    val rows = same.map(("g", true, _)) ++ same.map(("g", false, _))
    assert(ks(rows)("g") == ((3L, 3L, Some(0L))))
    val split = Seq(1L, 2L).map(("h", true, _)) ++
      Seq(10L, 11L, 12L).map(("h", false, _))
    assert(ks(split)("h") == ((2L, 3L, Some(1000000L))))
  }

  test("KS sees a shape change TVD's wide bins miss") {
    // A uniform on 0..9, B concentrated at 4..5: same mass in a 0..9 bin,
    // very different CDFs.
    val a = (0L until 10L).map(("g", true, _))
    val b = Seq.fill(5)(4L).map(("g", false, _)) ++
      Seq.fill(5)(5L).map(("g", false, _))
    val (_, _, Some(kppm)) = ks(a ++ b)("g")
    assert(kppm == 400000L) // sup at x=3: |4/10 − 0| = 0.4
  }

  test("KS is partition-invariant and null on an empty sample") {
    val rows = (0 until 150).map { i =>
      ("g", i % 4 == 0, (i * 7919L) % 23L)
    }
    assert(ks(rows, 1) == ks(rows, 11))
    assert(ks(Seq(("e", true, 1L)))("e") == ((1L, 0L, None)))
  }

  private def emd(rows: Seq[(Long, Long)], tPpm: Long = 150000L,
      parts: Int = 4) =
    Drift.emdClosenessPpm(rows.toDF("band", "bin").repartition(parts),
      grpCol = "band", binCol = "bin", tPpm = tPpm)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  /** Brute-force ordered EMD in ppm: Σ_b |cumP_g − cumP_G| / (m−1),
    * cross-multiplied to integers before the single division. */
  private def bruteEmd(rows: Seq[(Long, Long)], band: Long): Long = {
    val bins = rows.map(_._2).distinct.sorted
    val mine = rows.filter(_._1 == band)
    val (n, nn) = (mine.size.toLong, rows.size.toLong)
    val num = bins.map { b =>
      math.abs(mine.count(_._2 <= b) * nn - rows.count(_._2 <= b) * n)
    }.sum
    if (bins.size <= 1) 0L else 1000000L * num / ((bins.size - 1) * n * nn)
  }

  test("EMD matches brute force; cohort equal to global scores 0") {
    // band 0 uniform over 0..3; band 1 skewed to bin 3.
    val rows = (0L until 4L).flatMap(b => Seq.fill(5)((0L, b))) ++
      (Seq.fill(2)(0L) ++ Seq.fill(18)(3L)).map((1L, _))
    val out = emd(rows)
    Seq(0L, 1L).foreach { band =>
      assert(out(band)._2 == bruteEmd(rows, band), s"band $band")
    }
    // a cohort that IS the whole table trivially matches the global dist
    val solo = (0L until 4L).map((7L, _))
    assert(emd(solo)(7L) == ((4L, 0L, true)))
  }

  test("EMD orders cohorts by distance and gates on tPpm") {
    // global: half at bin 0, half at bin 9 (from the two cohorts).
    val rows = Seq.fill(10)((0L, 0L)) ++ Seq.fill(10)((1L, 9L))
    val out = emd(rows, tPpm = 400000L)
    // each cohort's CDF differs from global by 1/2 at every step:
    // EMD = (9 · 1/2) / 9 = 1/2
    assert(out(0L) == ((10L, 500000L, false)))
    assert(out(1L) == ((10L, 500000L, false)))
    assert(emd(rows, tPpm = 500000L)(0L)._3)
  }

  test("EMD is partition-invariant; single global bin scores 0") {
    val rows = (0 until 160).map { i =>
      ((i % 4).toLong, (i * 104729L) % 8L)
    }
    assert(emd(rows, parts = 1) == emd(rows, parts = 13))
    val one = Seq((0L, 5L), (0L, 5L), (1L, 5L))
    assert(emd(one)(0L) == ((2L, 0L, true)))
  }
}
