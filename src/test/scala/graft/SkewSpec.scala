package graft

import graft.ext.Skew

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.ext.Skew]]'s result-invariance claims on a deliberately
  * skewed fixture (one key carries 90% of the rows, including duplicate
  * join keys on both sides) and the phase-1 spread that makes the salted
  * forms worth their replication cost.
  */
class SkewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // hot key 1L: 900 rows; keys 2-101: one row each; right side has 3 rows
  // per key (dup matches multiply)
  private lazy val left = ((1 to 900).map(i => (1L, s"h$i")) ++
    (2 to 101).map(i => (i.toLong, s"c$i"))).toDF("k", "lv")
  private lazy val right = (1 to 101).flatMap(k =>
    (1 to 3).map(j => (k.toLong, s"r$k-$j"))).toDF("rk", "rv")

  test("saltedJoin equals the plain join, duplicates included") {
    for (s <- Seq(1, 4, 7)) {
      val salted = Skew.saltedJoin(left, right,
          col("k"), col("rk"), col("lv"), s)
        .select("k", "lv", "rv").as[(Long, String, String)]
        .collect().sorted.toSeq
      val plain = left.join(right, col("k") === col("rk"))
        .select("k", "lv", "rv").as[(Long, String, String)]
        .collect().sorted.toSeq
      assert(salted == plain, s"s=$s")
      assert(plain.count(_._1 == 1L) == 2700) // 900 × 3 hot matches survive
    }
  }

  test("saltedJoin spreads the hot key across salt groups") {
    val spread = left
      .withColumn("__salt", pmod(xxhash64(col("lv")), lit(4)))
      .filter(col("k") === 1L)
      .groupBy("__salt").count().as[(Long, Long)].collect().toMap
    assert(spread.size == 4, s"hot key landed in ${spread.size} salt groups")
    assert(spread.values.max < 900, "one salt group still holds every row")
  }

  test("saltedCountDistinct equals one-shot countDistinct") {
    // values repeat across rows so within-cell dedup is actually exercised
    val df = ((1 to 900).map(i => ("hot", s"v${i % 37}")) ++
      (1 to 50).map(i => ("cold", s"v${i % 7}"))).toDF("key", "v")
    for (s <- Seq(1, 8)) {
      val salted = Skew.saltedCountDistinct(df, col("key"), col("v"), s)
        .withColumnRenamed("__key", "key")
        .as[(String, Long)].collect().toMap
      val plain = df.groupBy("key").agg(countDistinct("v").as("n"))
        .as[(String, Long)].collect().toMap
      assert(salted == plain, s"s=$s")
    }
    assert(df.select("v").distinct().count() == 37)
  }
}
