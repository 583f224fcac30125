package graft

import graft.ext.{Incremental, Skew}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Skew.heavyKeys]] detection soundness and
  * [[Skew.adaptiveSaltedJoin]] result-invariance: the join must equal the
  * plain join for ANY hot-set choice (empty, exact, superset), because
  * detection may only ever affect performance. Plus
  * [[Incremental.mergeStates]] merge ≡ recompute.
  */
class AdaptiveSkewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("heavyKeys finds exactly the planted hot keys, any partitioning") {
    // 1200 rows: hot1 = 41.7%, hot2 = 25%, every cold key < 0.1%
    val rows = (Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      (0 until 400).map(i => s"cold$i")).map(Tuple1(_))
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("k").repartition(parts)
      val got = Skew.heavyKeys(df, col("k"), minShare = 0.1).toSet
      assert(got == Set("hot1", "hot2"))
    }
  }

  test("heavyKeys on uniform data returns nothing") {
    val df = (0 until 300).map(i => Tuple1(s"k$i")).toDF("k")
    assert(Skew.heavyKeys(df, col("k"), minShare = 0.02).isEmpty)
  }

  test("heavyKeys rejects shares below the sketch guarantee") {
    val df = Seq(Tuple1("a")).toDF("k")
    intercept[IllegalArgumentException] {
      Skew.heavyKeys(df, col("k"), minShare = 0.001, k = 256)
    }
  }

  test("adaptive join is row-identical to the plain join for any hot set") {
    val left = (0 until 400).map(i =>
      (if (i % 4 == 0) 0L else i.toLong, s"L$i")).toDF("lk", "lv")
    val right = (0 until 100).map(i => (i.toLong, s"R$i")).toDF("rk", "rv")
    val plain = left.join(right, col("lk") === col("rk"))
      .select("lk", "lv", "rv").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    for (hot <- Seq(Seq.empty[String], Seq("0"), Seq("0", "17", "999"))) {
      val got = Skew.adaptiveSaltedJoin(left, right,
          col("lk"), col("rk"), saltFrom = col("lv"), s = 4, hotKeys = hot)
        .select("lk", "lv", "rv").collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      assert(got == plain, s"hot set $hot diverged")
    }
  }

  test("adaptive join keeps duplicate right keys multiplying correctly") {
    val left = Seq((1L, "a"), (1L, "b")).toDF("lk", "lv")
    val right = Seq((1L, "x"), (1L, "y")).toDF("rk", "rv")
    val got = Skew.adaptiveSaltedJoin(left, right,
      col("lk"), col("rk"), col("lv"), s = 3, hotKeys = Seq("1"))
    assert(got.count() == 4) // full 2x2 match preserved under salting
  }

  test("mergeStates over split partials equals one-shot recompute") {
    val df = (0 until 500).map(i =>
      (s"g${i % 5}", (i % 97).toLong, i.toLong)).toDF("g", "v", "ts")
    val oneShot = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
        min("ts").as("mn"), max("ts").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    def state(part: org.apache.spark.sql.DataFrame) = part.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
        min("ts").as("mn"), max("ts").as("mx"))
    val merged = Incremental.mergeStates(
        Seq(state(df.filter(col("ts") < 200)),
          state(df.filter(col("ts") >= 200 && col("ts") < 350)),
          state(df.filter(col("ts") >= 350))),
        keys = Seq("g"), sumCols = Seq("n", "sv"),
        minCols = Seq("mn"), maxCols = Seq("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(merged == oneShot)
  }
}
