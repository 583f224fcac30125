package graft

import graft.ext.BloomPrune

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[BloomPrune]] invariants: no false negatives (the pruned fact side
  * still contains every truly-matching row, so the downstream join is
  * result-invariant) and real pruning (rows provably absent from the dim
  * side are dropped before any shuffle).
  */
class BloomPruneSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pruned join equals plain join") {
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey"))
    val viaBloom = BloomPrune
      .filterByDim(lineitem, "l_orderkey", urgent, "o_orderkey")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
    assert(viaBloom.count() == plain.count())
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("no false negatives, and absent keys are actually pruned") {
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val pruned = BloomPrune
      .filterByDim(lineitem, "l_orderkey", urgent, "o_orderkey")
    // every truly-matching row survived
    val lost = lineitem
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .exceptAll(pruned
        .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi"))
    assert(lost.isEmpty)
    // and the filter did real work: at 1% fpp over ~20% selectivity the
    // survivor fraction must sit well under half the fact table
    val total = lineitem.count()
    assert(pruned.count() < total / 2,
      s"pruned ${pruned.count()} of $total — bloom filter pruned nothing")
  }

  test("probe predicate evaluates inside the scan stage, not post-shuffle") {
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plan = BloomPrune
      .filterByDim(lineitem, "l_orderkey", urgent, "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe missing from plan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"pruning plan must be map-only (no shuffle):\n$plan")
  }
}
