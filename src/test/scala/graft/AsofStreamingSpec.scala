package graft

import graft.operators.{AsofJoin, Snapshot, SnapshotOptions}
import graft.streaming.StreamingSnapshot

import org.scalatest.funsuite.AnyFunSuite

class AsofStreamingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("asof backward: latest right at-or-before left time, per key") {
    val left = Seq(
      ("k1", 10L, "L1"), ("k1", 20L, "L2"), ("k1", 5L, "L0"),
      ("k2", 15L, "L3")).toDF("k", "t", "lv")
    val right = Seq(
      ("k1", 10L, "R10"), ("k1", 15L, "R15"), ("k2", 99L, "R99"))
      .toDF("k", "rt", "rv")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt",
      Seq("rv"))
      .select("k", "t", "lv", "asof_rv").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSet
    assert(got == Set(
      ("k1", 5L, null), // before any right row
      ("k1", 10L, "R10"), // ties match in non-strict mode
      ("k1", 20L, "R15"),
      ("k2", 15L, null))) // right row is later
  }

  test("asof tolerance: far matches null out, not replaced by older candidates") {
    import org.apache.spark.sql.functions._
    val left = Seq(("k1", 100L), ("k1", 13L), ("k1", 5L)).toDF("k", "t")
    val right = Seq(("k1", 3L, "R3"), ("k1", 10L, "R10"))
      .toDF("k", "rt", "rv")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt",
      Seq("rv"), tolerance = Some(lit(5L)))
      .select("t", "asof_rv").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(5L).contains("R3"))    // gap 2 ≤ 5
    assert(got(13L).contains("R10"))  // picked R10 (gap 3), within
    // t=100 picks R10 (gap 90 > 5): nulled, NOT replaced by R3
    assert(got(100L).isEmpty)
  }

  test("asof attaches whole right rows — null values never blend across rows") {
    val left = Seq(("k1", 3L, "L")).toDF("k", "t", "lv")
    val right = Seq(
      ("k1", 1L, Some("a1"), Some("b1")),
      ("k1", 2L, Some("a2"), Option.empty[String])) // latest row has b=null
      .toDF("k", "rt", "a", "b")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt",
      Seq("a", "b")).select("asof_a", "asof_b").head
    assert(got.getString(0) == "a2")
    assert(got.isNullAt(1)) // NOT "b1" from the older row
  }

  test("asof forward: earliest right at-or-after left time") {
    val left = Seq(("k1", 10L, "L1"), ("k1", 99L, "L2")).toDF("k", "t", "lv")
    val right = Seq(("k1", 10L, "R10"), ("k1", 20L, "R20"))
      .toDF("k", "rt", "rv")
    val nonStrict = AsofJoin.asofForward(left, right, Seq("k"), "t", "rt",
      Seq("rv")).select("t", "asof_rv").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nonStrict == Map(10L -> "R10", 99L -> null))
    val strict = AsofJoin.asofForward(left, right, Seq("k"), "t", "rt",
      Seq("rv"), strict = true).select("t", "asof_rv").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strict == Map(10L -> "R20", 99L -> null))
  }

  test("asof strict excludes equal timestamps") {
    val left = Seq(("k1", 10L, "L")).toDF("k", "t", "lv")
    val right = Seq(("k1", 10L, "R10"), ("k1", 9L, "R9"))
      .toDF("k", "rt", "rv")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt",
      Seq("rv"), strict = true).select("asof_rv").head.getString(0)
    assert(got == "R9")
  }

  test("streaming foreachBatch snapshot equals batch upsert of all data") {
    val dir = tmpDir("stream_snap")
    val srcDir = s"$dir/src"
    new java.io.File(srcDir).mkdirs()
    // two micro-batch files with overlapping PKs
    Seq((1L, "a1", 1L), (2L, "b1", 1L)).toDF("id", "v", "seq")
      .coalesce(1).write.parquet(s"$srcDir/batch0")
    // file source reads dirs of parquet: stage as flat files
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // move part files up as sequential files so the source sees two files
    def promote(sub: String, name: String): Unit = {
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$srcDir/$sub"))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$srcDir/$name"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$srcDir/$sub"), true)
    }
    promote("batch0", "00.parquet")
    Seq((2L, "b2", 2L), (3L, "c1", 2L)).toDF("id", "v", "seq")
      .coalesce(1).write.parquet(s"$srcDir/batch1")
    promote("batch1", "01.parquet")

    val schema = spark.read.parquet(s"$srcDir/00.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = StreamingSnapshot.start(spark, stream, "ev", s"$dir/snap",
      SnapshotOptions(pk = Seq("id")), s"$dir/ckpt")
    q.awaitTermination()

    val snap = Snapshot.readSnapshots(spark, "ev", s"$dir/snap").get
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSeq
    // 2 -> b2 must win (later batch beats earlier on PK collision)
    assert(snap == Seq((1L, "a1"), (2L, "b2"), (3L, "c1")))
  }
}
