package graft

import graft.ext.TextStats
import graft.functions.{FingerprintExpr, VectorExpressions}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class FingerprintSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("fused fingerprint is bit-identical to the composed HOF fold") {
    VectorExpressions.register(spark)
    val rnd = new Random(29)
    val strs = (0 until 300).map(_ =>
      Seq.fill(5 + rnd.nextInt(60))(
        rnd.alphanumeric.take(1 + rnd.nextInt(9)).mkString).mkString(" ")) ++
      Seq(
        "", " ", "a",
        "héllo wörld ünïcode",          // 2-byte sequences
        "中文文档指纹测试",                // 3-byte sequences
        "mixed ascii 和 中文 with ñ",
        "emoji 😀 pair",      // 4-byte (surrogate pair in UTF-16)
        "tab\tand\nnewline")
    val df = strs.toDF("text")
    val bad = df.select(
      TextStats.fingerprint("text").as("fused"),
      TextStats.fingerprintComposed("text").as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(bad == 0L)
  }

  test("scala-side helper agrees with the column form") {
    VectorExpressions.register(spark)
    val s = "the quick brown fox 123"
    val fromDf = Seq(s).toDF("text")
      .select(TextStats.fingerprint("text")).head().getLong(0)
    assert(FingerprintExpr.hash(s.getBytes("UTF-8")) == fromDf)
  }

  test("null text yields null fingerprint in both forms") {
    VectorExpressions.register(spark)
    val df = Seq(Option.empty[String]).toDF("text")
    val r = df.select(
      TextStats.fingerprint("text"),
      TextStats.fingerprintComposed("text")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
