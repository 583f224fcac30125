package graft

import graft.ext.QuantileSketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.QuantileSketch]]: bottom-k-by-hash quantile sketch —
  * exactly mergeable, deterministic, rank error O(1/√k). Oracle twins:
  * q277 (batch beside exact), q278 (streamed maintenance).
  */
class QuantileSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val G = Seq("g")

  private def rows(n: Int, group: String = "a") =
    (1 to n).map(i => (i.toLong, group, i.toLong * 10))

  test("merge of split sketches equals the one-shot sketch exactly") {
    val all = (rows(400, "a") ++ rows(300, "b")).toDF("id", "g", "v")
    val ann = QuantileSketch.annotate(all, "id")
    val oneShot = QuantileSketch.sketch(ann, G, "id", 64)
      .collect().map(_.toSeq).toSet
    // any split: by parity, and by unequal thirds
    val byParity = QuantileSketch.merge(
      QuantileSketch.sketch(ann.filter(col("id") % 2 === 0), G, "id", 64),
      QuantileSketch.sketch(ann.filter(col("id") % 2 === 1), G, "id", 64),
      G, "id", 64).collect().map(_.toSeq).toSet
    val byThirds = QuantileSketch.merge(
      QuantileSketch.merge(
        QuantileSketch.sketch(ann.filter(col("id") <= 100), G, "id", 64),
        QuantileSketch.sketch(
          ann.filter(col("id") > 100 && col("id") <= 150), G, "id", 64),
        G, "id", 64),
      QuantileSketch.sketch(ann.filter(col("id") > 150), G, "id", 64),
      G, "id", 64).collect().map(_.toSeq).toSet
    assert(byParity == oneShot)
    assert(byThirds == oneShot)
  }

  test("groups at or under k yield exact order statistics") {
    val df = rows(50).toDF("id", "g", "v") // 50 rows < k = 64
    val ann = QuantileSketch.annotate(df, "id")
    val sk = QuantileSketch.sketch(ann, G, "id", 64)
    val est = QuantileSketch.estimates(
        sk, G, "id", "v", Seq(10, 50, 100))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // values are 10..500; rank ceil(p*50/100): p10 → rank 5 → 50,
    // p50 → rank 25 → 250, p100 → rank 50 → 500
    assert(est == Map(10L -> 50L, 50L -> 250L, 100L -> 500L))
  }

  test("rank error is bounded on the gate corpus") {
    val ev = graft.queries.CoreQueries.events(
        spark, "/root/testdata/sf0.01")
      .filter(col("value").isNotNull)
      .select(col("event_id").as("id"), col("event_type").as("g"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    val ann = QuantileSketch.annotate(ev, "id")
    val sk = QuantileSketch.sketch(ann, G, "id", 256)
    val est = QuantileSketch.estimates(sk, G, "id", "v", Seq(10, 50, 90))
    // the true rank (in percent points) of each estimated value must sit
    // near its target percentile: |rank_pct - pct| <= 12 at k = 256
    // (≈ 4 σ of the sampling error √(p(1-p)/k) ≤ 3.2 points)
    val ranks = est.join(ev, Seq("g"))
      .groupBy("g", "pct", "q_value")
      .agg((sum(when(col("v") <= col("q_value"), 1L).otherwise(0L)) * 100 /
        count(lit(1))).as("rank_pct"))
    val worst = ranks
      .select(max(abs(col("rank_pct") - col("pct"))).cast("double").as("m"))
      .as[Double].collect().head
    info(s"worst rank error = $worst points")
    assert(worst <= 12.0, s"rank error too large: $worst")
  }

  test("sketch and estimates are partition-invariant") {
    val df = (rows(500, "a") ++ rows(200, "b")).toDF("id", "g", "v")
    def run(parts: Int) = QuantileSketch.estimates(
      QuantileSketch.sketch(
        QuantileSketch.annotate(df.repartition(parts), "id"), G, "id", 32),
      G, "id", "v", Seq(25, 50, 75)).collect().map(_.toSeq).toSet
    assert(run(2) == run(13))
  }

  test("batch fold of sketched halves equals the one-shot (stream ≡ batch)") {
    val df = rows(1000).toDF("id", "g", "v")
    val ann = QuantileSketch.annotate(df, "id")
    val oneShot = QuantileSketch.estimates(
      QuantileSketch.sketch(ann, G, "id", 100), G, "id", "v", Seq(50))
      .collect().map(_.toSeq).toSet
    // fold: state = sketch(half1); state = merge(state, sketch(half2))
    var state = QuantileSketch.sketch(
      ann.filter(col("id") <= 377), G, "id", 100)
    state = QuantileSketch.merge(state,
      QuantileSketch.sketch(ann.filter(col("id") > 377), G, "id", 100),
      G, "id", 100)
    val folded = QuantileSketch.estimates(state, G, "id", "v", Seq(50))
      .collect().map(_.toSeq).toSet
    assert(folded == oneShot)
  }
}
