package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShingleHashesSpec extends AnyFunSuite with SparkSpec {

  test("fused expression equals hash of the composed shingle pipeline") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq( // whitespace edge cases: tabs survive trim()
        (100001L, "\tfoo bar baz x"),
        (100002L, "foo  bar\tbaz qux\n"),
        (100003L, "MIXED Case\tTokens here too")).toDF("doc_id", "text"))
    val fused = Dedup.withShingleHashSets(docs, "doc_id", "text", 3)
      .select(col("doc_id"), expr("array_sort(hsh)").as("h"))
    // composed: string shingles → md5 hash60 per shingle → distinct
    val composed = Dedup.withShingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), expr(
        "array_sort(array_distinct(transform(sh, " +
          "s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))))")
        .as("h"))
    val mismatches = fused.alias("f")
      .join(composed.alias("c"), "doc_id")
      .filter(expr("f.h <> c.h"))
      .count()
    assert(mismatches == 0L)
  }

  test("edge cases: short/empty/whitespace-only text") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "one two"), (4L, "one two three"),
      (5L, "  A  B\tC \n D  ")).toDF("doc_id", "text")
    val got = Dedup.withShingleHashSets(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).length)
      .toMap
    // docs with fewer than k tokens are excluded from the dedup family
    // (family-wide semantics, mirrored by the oracles' len(s) > 0 filter)
    assert(got == Map(4L -> 1, 5L -> 2))
  }
}
