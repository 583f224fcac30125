package graft

import graft.ext.Cdc

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test: [[graft.ext.Cdc.apply]] agrees with a 15-line in-memory
  * model on arbitrary change logs — keys overlapping or not, duplicate
  * sequence numbers, delete/insert interleavings. ScalaCheck generators
  * are driven from a fixed seed (no scalatestplus bridge on the
  * classpath), so failures replay deterministically.
  */
class CdcModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def model(
      cur: Map[Long, String],
      chg: Seq[(Long, String, String, Long)]): Map[Long, String] = {
    val winners = chg.groupBy(_._1).map { case (k, cs) =>
      // highest seq; at equal seq delete first, then op asc, then value
      // asc with nulls first — mirrors Cdc's window ordering exactly
      k -> cs.sortBy(c => (-c._4, c._2 != "D", c._2, Option(c._3))).head
    }
    val afterUpserts = winners.foldLeft(cur) {
      case (m, (k, (_, "D", _, _))) => m - k
      case (m, (k, (_, _, v, _))) => m.updated(k, v)
    }
    afterUpserts
  }

  private val genCase = for {
    curKeys <- Gen.listOfN(6, Gen.choose(0L, 9L)).map(_.distinct)
    nChg <- Gen.choose(0, 12)
    chg <- Gen.listOfN(nChg, for {
      k <- Gen.choose(0L, 11L)
      op <- Gen.oneOf("I", "U", "D")
      v <- Gen.alphaLowerStr.map(_.take(4))
      seq <- Gen.choose(1L, 4L)
    } yield (k, op, if (op == "D") null else s"v$v", seq))
  } yield (curKeys.map(k => (k, s"cur$k")), chg)

  test("Cdc.apply agrees with the in-memory model") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    for (i <- 1 to 30) {
      val (cur, chg) = genCase.apply(params, seed)
        .getOrElse(fail(s"generator returned no sample at iteration $i"))
      seed = seed.next
      val got = Cdc.apply(
          cur.toDF("k", "v"), chg.toDF("k", "op", "v", "seq"),
          keyCol = "k", opCol = "op", seqCol = "seq")
        .as[(Long, String, String)].collect()
        .map(r => r._1 -> r._2).toMap
      val expected = model(cur.toMap, chg)
      assert(got == expected, s"iteration $i: cur=$cur chg=$chg")
    }
  }
}
