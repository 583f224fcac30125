package graft

import graft.ext.TextStats
import graft.functions.{TokenCountExpr, VectorExpressions}

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Bit-parity of the fused count-only [[TokenCountExpr]] against the
  * composed `size(regexp_extract_all(lower(text), ...))` form — on random
  * corpora, adversarial Unicode fixtures, and the real documents table.
  */
class TokenCountSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    VectorExpressions.register(spark)
    val bad = df.select(
      expr("graft_token_count(text)").as("fused"),
      TextStats.reTokensComposed("text").as("composed"))
      .filter(not(col("fused") <=> col("composed"))).count()
    assert(bad == 0L)
  }

  test("fused count matches composed regexp on random + adversarial text") {
    val rnd = new Random(31)
    val alphabet = "abcXYZ019 .,!\t\n\f\r中文的émoji😀ß-"
    val strs = (0 until 400).map(_ =>
      Seq.fill(rnd.nextInt(80))(
        alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq(
        "", " ", "\t\n\f\r",       // whitespace only → 0
        "abc123def",                      // run alternation → 3
        "a1b2c3",                         // 6 runs
        "...", "a.b.c",                   // punct singles
        "MIXED Case RUNS",                // uppercase folds into runs
        "中文文档", "中 文",                // CJK: one match per char
        "emoji 😀😀 pair",                // surrogate pair = ONE match each
        "KK kelvin",                 // U+212A lowercases to 'k'
        "weiß straße",                    // ß stays non-ASCII
        "é combining")              // combining mark = its own match
    assertParity(strs.toDF("text"))
  }

  test("fused count matches composed regexp on the real documents corpus") {
    assertParity(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("text")))
  }

  test("null text yields null in both forms") {
    VectorExpressions.register(spark)
    val r = Seq(Option.empty[String]).toDF("text")
      .select(expr("graft_token_count(text)"),
        TextStats.reTokensComposed("text")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("scala-side scanner handles known counts") {
    assert(TokenCountExpr.count(UTF8String.fromString("")) == 0L)
    assert(TokenCountExpr.count(UTF8String.fromString("abc123def")) == 3L)
    assert(TokenCountExpr.count(UTF8String.fromString("Hello, World!")) == 4L)
    assert(TokenCountExpr.count(UTF8String.fromString("中文")) == 2L)
    assert(TokenCountExpr.count(UTF8String.fromString("😀")) == 1L)
  }
}
