package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the bounded-state streaming dedup (q54's
  * `dropDuplicatesWithinWatermark`):
  *  1. within the watermark horizon it equals batch DISTINCT (duplicates
  *     dropped), and
  *  2. past the horizon the key's state is EVICTED, so a later recurrence
  *     re-emits — the bounded-state trade-off all-history
  *     `dropDuplicates` (q43) doesn't make.
  *
  * Driven as a two-file stream with maxFilesPerTrigger=1 so the watermark
  * actually advances between the batches.
  */
class BoundedDedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("dedups within the horizon, re-emits after state eviction") {
    val dir = tmpDir("bounded_dedup")
    def ts(hour: Int, minute: Int = 0): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

    // Batch 1: k1 twice (intra-horizon dup), k2 once, plus a far-forward
    // sentinel that advances the watermark to 19:00 (delay 1h) after the
    // batch — well past k1/k2's 10:00 + 1h state deadline.
    Seq(
      ("k1", ts(10)), ("k1", ts(10, 5)), ("k2", ts(10, 10)),
      ("wm", ts(20)))
      .toDF("key", "event_ts").coalesce(1).write.parquet(s"$dir/in/b1")
    // Batch 2: only a second sentinel — state cleanup runs at batch END,
    // so this batch is what actually evicts k1/k2 (expired since 11:00).
    Seq(("wm2", ts(20, 30)))
      .toDF("key", "event_ts").coalesce(1).write.parquet(s"$dir/in/b2")
    // Batch 3 (watermark 19:30): k1 again at 19:45 — its state was
    // evicted, so it re-emits; k3 is new.
    Seq(("k1", ts(19, 45)), ("k3", ts(19, 50)))
      .toDF("key", "event_ts").coalesce(1).write.parquet(s"$dir/in/b3")

    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def flatten(sub: String, name: String): Unit = {
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/in/$sub"))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/in/$name"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/in/$sub"), true)
      ()
    }
    flatten("b1", "00.parquet")
    flatten("b2", "01.parquet")
    flatten("b3", "02.parquet")
    // staggered mtimes so maxFilesPerTrigger=1 processes 00, 01, 02 in order
    val now = System.currentTimeMillis()
    Seq("00" -> 120000L, "01" -> 60000L, "02" -> 0L).foreach {
      case (name, back) =>
        java.nio.file.Files.setLastModifiedTime(
          java.nio.file.Paths.get(s"$dir/in/$name.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(now - back))
    }

    val schema = spark.read.parquet(s"$dir/in/00.parquet").schema
    val deduped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in")
      .withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("key")
      .select("key")
    spark.streams.active.filter(_.name == "bounded_dedup_mem")
      .foreach(_.stop())
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("bounded_dedup_mem")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val emitted = spark.table("bounded_dedup_mem")
      .groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(emitted("k1") == 2L,
      s"k1 should re-emit after eviction, got $emitted")  // eviction proof
    assert(emitted("k2") == 1L && emitted("k3") == 1L)    // horizon DISTINCT
    assert(emitted("wm") == 1L && emitted("wm2") == 1L)
  }
}
