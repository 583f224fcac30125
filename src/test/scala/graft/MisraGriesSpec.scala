package graft

import graft.functions.VectorExpressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The [[graft.functions.MisraGriesAgg]] deterministic guarantee: every
  * item with true frequency > n/(k+1) is in the sketch output, under ANY
  * partition layout (the merge path preserves the bound), and the sketch
  * never exceeds k candidates.
  */
class MisraGriesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int): Seq[String] = {
    VectorExpressions.register(spark)
    items.toDF("item").repartition(parts)
      .agg(expr(s"graft_misra_gries(item, $k)").as("cand"))
      .head().getSeq[String](0)
  }

  test("heavy items survive any partitioning (property)") {
    val rnd = new Random(47)
    for (trial <- 0 until 8) {
      val k = 4 + rnd.nextInt(20)
      // zipf-ish stream: item i appears ~ n / (i+1) times
      val items = (0 until 40).flatMap(i =>
        Seq.fill(1 + rnd.nextInt(600) / (i + 1))(s"w$i"))
      val shuffled = rnd.shuffle(items)
      val n = shuffled.size
      val exact = shuffled.groupBy(identity).view.mapValues(_.size)
      val heavy = exact.filter(_._2 > n / (k + 1)).keys.toSet
      for (parts <- Seq(1, 3, 16)) {
        val cand = sketch(shuffled, k, parts).toSet
        assert(cand.size <= k, s"trial $trial parts $parts: size ${cand.size} > k=$k")
        assert(heavy.subsetOf(cand),
          s"trial $trial parts $parts: missed ${heavy -- cand}")
      }
    }
  }

  test("all-distinct stream yields at most k candidates, no crash") {
    val items = (0 until 500).map(i => s"u$i")
    val cand = sketch(items, 8, 4)
    assert(cand.size <= 8)
  }

  test("single dominant item is always caught") {
    val items = Seq.fill(900)("the") ++ (0 until 300).map(i => s"x$i")
    for (parts <- Seq(1, 7))
      assert(sketch(items, 4, parts).contains("the"))
  }

  test("nulls are ignored") {
    VectorExpressions.register(spark)
    val cand = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("item")
      .agg(expr("graft_misra_gries(item, 4)").as("cand"))
      .head().getSeq[String](0)
    assert(cand.toSet == Set("a", "b"))
  }

  test("q94 two-pass plan equals exact heavy hitters on documents") {
    VectorExpressions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.ext.TextStats.tokensCol("text")).as("tok"))
    val exact = toks.groupBy("tok").count()
    val n = toks.count()
    val expected = exact.filter(col("count") * 100 > n)
      .select("tok").as[String].collect().toSet
    val got = graft.queries.TextQueries.q94HeavyHitters
      .fn(spark, dir).select("tok").as[String].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty) // threshold must actually select something
  }
}
