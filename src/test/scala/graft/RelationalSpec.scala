package graft

import graft.queries.{EventQueries, RelationalQueries}

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the relational additions: the distributed exact-ntile formula
  * against Spark's own single-partition `ntile` window, the z-order key
  * against a bit-twiddling reference plus its aligned-bucket locality
  * claim, the star join's broadcast plan shape, and stream ≡ batch for the
  * watermarked stream-stream join.
  */
class RelationalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"

  test("ntileBucket matches Spark's ntile window, including remainders") {
    for (n <- Seq(1L, 7L, 17L, 40L, 101L); k <- Seq(1, 3, 10)) {
      val df = (0L until n).map(i => (i, n - i)).toDF("idx", "v")
      val expected = df
        .withColumn("bin", ntile(k).over(Window.orderBy("idx")))
        .select("idx", "bin").as[(Long, Int)].collect().toMap
      val got = (0L until n)
        .map(i => i -> RelationalQueries.ntileBucket(i, n, k)).toMap
      assert(got == expected, s"n=$n k=$k")
    }
  }

  test("q74 distributed binning equals the single-partition ntile window") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val viaWindow = orders
      .withColumn("bin",
        ntile(10).over(Window.orderBy("o_totalprice", "o_orderkey")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")) * 100).cast("long").as("min_cents"),
        round(max(col("o_totalprice")) * 100).cast("long").as("max_cents"))
      .orderBy("bin")
      .collect().toSeq
    val distributed =
      RelationalQueries.q74EquidepthBins.fn(spark, sf0001).collect().toSeq
    assert(distributed == viaWindow)
  }

  test("q120 distributed rank equals the single-partition window rank") {
    val viaWindow = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("rk", row_number()
        .over(Window.orderBy("o_totalprice", "o_orderkey")).cast("long"))
      .filter(col("rk") % 100 === 0)
      .select(col("rk"), col("o_orderkey").cast("long"), col("o_totalprice"))
      .orderBy("rk")
      .as[(Long, Long, Double)].collect().toSeq
    val distributed = RelationalQueries.q120GlobalSort.fn(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(distributed == viaWindow)
  }

  test("zOrderKey matches a reference bit interleave") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", RelationalQueries.zOrderKey(col("x"), col("y"), 4))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 4), s"($x,$y)") }
    // the curve is a bijection on the 16×16 grid
    assert(got.map(_._3).distinct.length == 256)
  }

  test("q76 aligned z-buckets bound BOTH dimensions (32×32 tiles)") {
    val rows = RelationalQueries.q76ZOrder.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minX, maxX) = (r.getAs[Long]("min_x"), r.getAs[Long]("max_x"))
      val (minY, maxY) = (r.getAs[Long]("min_y"), r.getAs[Long]("max_y"))
      assert(maxX - minX <= 31 && maxY - minY <= 31,
        s"bucket ${r.get(0)} spans ($minX..$maxX, $minY..$maxY)")
    }
  }

  test("q71 star join broadcasts every dimension table") {
    val df = RelationalQueries.q71StarJoin.fn(spark, sf0001)
    df.collect()
    def broadcastJoins(p: SparkPlan): Int = {
      val self = p match {
        case _: BroadcastHashJoinExec => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      self + kids.map(broadcastJoins).sum
    }
    val n = broadcastJoins(df.queryExecution.executedPlan)
    assert(n >= 4, s"expected >=4 broadcast hash joins, saw $n")
  }

  test("q77 stream-stream join equals the batch self-join") {
    val streamed = EventQueries.q77StreamStreamJoin.fn(spark, sf0001)
      .collect().toSeq
    val e = graft.queries.CoreQueries.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("tus").as("vt"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("tus").as("ct"))
    val batch = v.join(c,
        col("user_id") === col("cu") && col("ct") > col("vt") &&
          col("ct") <= col("vt") + 1800000000L)
      .select(col("user_id"), col("view_id"), col("click_id"),
        (col("ct") - col("vt")).as("lag_us"))
      .orderBy("user_id", "view_id", "click_id")
      .collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty || streamed.isEmpty)
  }
}
