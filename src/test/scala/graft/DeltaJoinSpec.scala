package graft

import graft.ext.Incremental

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Incremental.deltaJoinParts]]: the four-term delta-join
  * decomposition must reproduce the full recomputed join exactly, for any
  * split of either input. Oracle twin: q183.
  */
class DeltaJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val facts = (1 to 200).map(i => (i.toLong, i % 7, i * 10L))
  private val dims = (0 until 7).map(k => (k, s"dim$k"))

  test("delta decomposition equals full recompute for arbitrary splits") {
    val f = facts.toDF("id", "k", "v")
    val d = dims.toDF("dk", "name")
    val full = f.join(d, col("k") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(_.toSeq).toSet
    for (fCut <- Seq(0, 57, 200); dCut <- Seq(0, 3, 7)) {
      val parts = Incremental.deltaJoinParts(
        f.filter(col("id") <= fCut), f.filter(col("id") > fCut),
        d.filter(col("dk") < dCut), d.filter(col("dk") >= dCut),
        col("k") === col("dk"))
      assert(parts.size == 4)
      val merged = Incremental.mergeStates(
        parts.map(_.groupBy("name")
          .agg(count(lit(1)).as("n"), sum("v").as("sv"))),
        keys = Seq("name"), sumCols = Seq("n", "sv"))
        .collect().map(_.toSeq).toSet
      assert(merged == full, s"split fCut=$fCut dCut=$dCut diverged")
    }
  }

  test("delta terms are disjoint: row counts add up exactly") {
    val f = facts.toDF("id", "k", "v")
    val d = dims.toDF("dk", "name")
    val parts = Incremental.deltaJoinParts(
      f.filter(col("id") <= 100), f.filter(col("id") > 100),
      d.filter(col("dk") < 4), d.filter(col("dk") >= 4),
      col("k") === col("dk"))
    val total = f.join(d, col("k") === col("dk")).count()
    assert(parts.map(_.count()).sum == total)
  }
}
