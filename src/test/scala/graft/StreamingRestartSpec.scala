package graft

import graft.operators.{Snapshot, SnapshotOptions}
import graft.streaming.StreamingSnapshot

import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint restart for the streaming snapshot (q100's operator): a
  * drained stream restarted with the same checkpoint must (1) pick up
  * only files that arrived after the first run, and (2) never re-apply
  * already-committed batches. The second claim is made FALSIFIABLE by
  * the fixture: the late file overwrites a PK from the early file, so if
  * a restart re-processed the early file, keep-last (later batch beats
  * earlier) would resurrect the STALE value — the assert would see it.
  */
class StreamingRestartSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def promote(srcDir: String, sub: String, name: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$srcDir/$sub"))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$srcDir/$name"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$srcDir/$sub"), true)
    ()
  }

  test("restart consumes only new files and never re-applies old batches") {
    val dir = tmpDir("stream_restart")
    val srcDir = s"$dir/src"
    new java.io.File(srcDir).mkdirs()
    val opts = SnapshotOptions(pk = Seq("id"))

    def drain(): Unit = {
      val schema = spark.read.parquet(s"$srcDir/00.parquet").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      StreamingSnapshot.start(spark, stream, "ev", s"$dir/snap",
        opts, s"$dir/ckpt").awaitTermination()
    }
    def snap(): Seq[(Long, String)] =
      Snapshot.readSnapshots(spark, "ev", s"$dir/snap").get
        .orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSeq

    // run 1: only file 00 exists
    Seq((1L, "stale"), (2L, "b1")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$srcDir/w0")
    promote(srcDir, "w0", "00.parquet")
    drain()
    assert(snap() == Seq((1L, "stale"), (2L, "b1")))

    // run 2, same checkpoint: a late file overwrites PK 1
    Seq((1L, "fresh"), (3L, "c1")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$srcDir/w1")
    promote(srcDir, "w1", "01.parquet")
    drain()
    assert(snap() == Seq((1L, "fresh"), (2L, "b1"), (3L, "c1")))

    // run 3, same checkpoint, nothing new: if 00.parquet were re-applied
    // here, keep-last would resurrect "stale" for PK 1
    drain()
    assert(snap() == Seq((1L, "fresh"), (2L, "b1"), (3L, "c1")))
  }
}
