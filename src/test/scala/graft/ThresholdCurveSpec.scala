package graft

import graft.ext.Dedup

import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.jaccardThresholdCurve]]: exact agreement with the independently
  * verified banded pair machinery at a shared threshold, and ladder
  * monotonicity.
  */
class ThresholdCurveSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
    (3L, "alpha beta gamma delta epsilon zeta eta iota"), // near dup of 1
    (4L, "one two three four five six seven eight"),
    (5L, "totally different words appear in this document here"))
    .toDF("doc_id", "text")

  test("curve counts match the banded near-dup pair set at 70pct") {
    val curve = Dedup.jaccardThresholdCurve(fixture, "doc_id", "text",
        k = 3, thresholdsPct = Seq(70))
      .as[(Long, Long, Long)].collect.toSeq
    val pairs = Dedup.minhashNearDupPairs(fixture, "doc_id", "text",
        k = 3, numHashes = 128, bandRows = 2,
        thresholdNum = 7, thresholdDen = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect.toSet
    assert(curve.size == 1)
    val (_, nPairs, nDocs) = curve.head
    assert(nPairs == pairs.size,
      s"curve pairs $nPairs != banded pairs ${pairs.size}")
    assert(nDocs == pairs.flatMap(p => Seq(p._1, p._2)).size)
  }

  test("pair and doc counts are non-increasing in the threshold") {
    val rows = Dedup.jaccardThresholdCurve(fixture, "doc_id", "text",
        k = 3, thresholdsPct = Seq(10, 30, 50, 70, 90))
      .as[(Long, Long, Long)].collect.toSeq.sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Seq((t1, p1, d1), (t2, p2, d2)) =>
        assert(p2 <= p1, s"pairs increased from $t1 to $t2")
        assert(d2 <= d1, s"docs increased from $t1 to $t2")
      case _ =>
    }
    // the exact dup (1, 2) survives every threshold
    assert(rows.last._2 >= 1L)
  }
}
