package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Production observability affordances, pinned as specs:
  *
  *  - `df.observe` — named accumulator metrics collected DURING a pass
  *    (no second scan): the way a 100 TB load reports row/violation
  *    counts without paying the q85 audit twice.
  *  - PERMISSIVE JSONL ingestion — malformed lines land in
  *    `_corrupt_record` and are COUNTED, never silently dropped (the
  *    reference's keep-unparsable-JSON stance, applied to line-level
  *    corruption at the source boundary).
  */
class ObservabilitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("observe reports row and violation counts in the same pass") {
    val df = Seq((1L, "a"), (2L, null), (3L, "c"), (4L, null))
      .toDF("id", "v")
    val observed = df.observe("load_metrics",
      count(lit(1)).as("n_rows"),
      count(when(col("v").isNull, 1)).as("n_null_v"))
    // the action that triggers the metrics is the load itself — metrics
    // land on the executed Dataset's own QueryExecution
    assert(observed.collect().length == 4)
    val row = observed.queryExecution.observedMetrics("load_metrics")
    assert(row.getAs[Long]("n_rows") == 4)
    assert(row.getAs[Long]("n_null_v") == 2)
  }

  test("permissive JSONL routes malformed lines to _corrupt_record") {
    val dir = tmpDir("corrupt_jsonl")
    val lines = Seq(
      """{"id": 1, "v": "ok"}""",
      """{"id": 2 BROKEN""",
      """{"id": 3, "v": "ok2"}""",
      """not json at all""").mkString("\n")
    Files.write(Paths.get(s"$dir/data.jsonl"),
      lines.getBytes(StandardCharsets.UTF_8))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/data.jsonl")
      .cache() // corrupt-record column requires a materialized scan
    try {
      assert(df.count() == 4) // nothing silently dropped
      val bad = df.filter(col("_corrupt_record").isNotNull)
      assert(bad.count() == 2)
      val good = df.filter(col("_corrupt_record").isNull)
        .select("id", "v").as[(Long, String)].collect().toSet
      assert(good == Set((1L, "ok"), (3L, "ok2")))
    } finally { df.unpersist(); () }
  }
}
