package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity and layout-independence for [[graft.functions.TopKAgg]]: the
  * k-bounded aggregate must equal the window `row_number() <= k`
  * formulation on any partitioning, including heavy rank ties (the
  * tiebreak is part of the contract) and groups smaller than k.
  */
class TopKAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def windowForm(df: DataFrame, k: Int): Set[(String, Long, Long, Long)] = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .as[(String, Long, Long, Long)].collect().toSet
  }

  private def aggForm(df: DataFrame, k: Int): Set[(String, Long, Long, Long)] = {
    graft.functions.VectorExpressions.register(spark)
    df.groupBy("g")
      .agg(expr(s"graft_top_k(v, id, $k)").as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.rank_val"), col("col.id"),
        (col("pos") + 1).cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, v, id, rk) => (g, v, id, rk) }.toSet
  }

  // deterministic pseudo-random rows with many rank ties (v in 0..9)
  private val rows: Seq[(String, Long, Long)] =
    (1L to 400L).map(i => (s"g${i % 5}", (i * 7919) % 10, i))

  test("equals the window formulation, including ties, at k=3") {
    val df = rows.toDF("g", "v", "id")
    assert(aggForm(df, 3) == windowForm(df, 3))
  }

  test("layout-independent: 1-partition and 13-partition inputs agree") {
    val df = rows.toDF("g", "v", "id")
    val a = aggForm(df.repartition(1), 3)
    val b = aggForm(df.repartition(13, col("id")), 3)
    assert(a == b)
    assert(a == windowForm(df, 3))
  }

  test("groups smaller than k emit all their rows, best-first") {
    val df = Seq(("a", 5L, 1L), ("a", 9L, 2L)).toDF("g", "v", "id")
    assert(aggForm(df, 10) ==
      Set(("a", 9L, 2L, 1L), ("a", 5L, 1L, 2L)))
  }

  test("Long.MinValue ranks last, not first (no negation overflow)") {
    graft.functions.VectorExpressions.register(spark)
    val df = Seq((Long.MinValue, 1L), (5L, 2L), (3L, 3L))
      .toDF("v", "id")
    val got = df.agg(expr("graft_top_k(v, id, 2)").as("top"))
      .selectExpr("inline(top)")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((5L, 2L), (3L, 3L)))
  }

  test("null rank values are skipped") {
    graft.functions.VectorExpressions.register(spark)
    val df = Seq((Some(5L), 1L), (None, 2L), (Some(7L), 3L))
      .toDF("v", "id")
    val got = df.agg(expr("graft_top_k(v, id, 2)").as("top"))
      .selectExpr("inline(top)")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((7L, 3L), (5L, 1L)))
  }
}
