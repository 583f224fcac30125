package graft

import graft.functions.{Md5Hash60, VectorExpressions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class VectorExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("graft_dot matches the higher-order-function fold bit-for-bit") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val rnd = new Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      expr("graft_dot(a, b)").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * " +
        "CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)").as("hof"))
      .collect()
    cmp.foreach { r =>
      // bit-exact, not epsilon: same fold order, same IEEE ops
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot rejects non-float-array inputs at analysis time") {
    VectorExpressions.register(spark)
    val df = spark.range(1).selectExpr("array(1.0D) AS a", "array(1.0D) AS b")
    intercept[Exception] {
      df.select(expr("graft_dot(a, b)")).collect()
    }
  }

  test("graft_md5_60 equals conv(substr(md5,1,15),16,10)") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val rnd = new Random(11)
    val strs = (0 until 500).map(_ => rnd.alphanumeric.take(
      1 + rnd.nextInt(40)).mkString) :+ "" :+ "héllo wörld ünïcode"
    val df = strs.toDF("s")
    val bad = df.select(
      expr("graft_md5_60(s)").as("fast"),
      expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)").as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0L)
    // scala-side helper agrees too (used by Similarity plane generation)
    assert(Md5Hash60.hash("abc".getBytes("UTF-8")) ==
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex("abc")
          .substring(0, 15), 16))
  }
}
