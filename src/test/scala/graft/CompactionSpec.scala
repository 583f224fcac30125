package graft

import graft.ext.Compaction

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.ext.Compaction]]: output file counts track the byte
  * target, data round-trips exactly, and degenerate targets still produce
  * at least one file.
  */
class CompactionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq

  test("compaction hits a bounded file count and preserves rows") {
    val dir = tmpDir("compact")
    val df = (1 to 10000).map(i => (i.toLong, s"value_$i")).toDF("id", "v")
    // fragment: 50 input files
    df.repartition(50).write.parquet(s"$dir/frag")
    val frag = spark.read.parquet(s"$dir/frag")
    assert(parquetFiles(s"$dir/frag").size == 50)

    val rowsPerFile = Compaction.compactTo(frag, s"$dir/out", 64 * 1024)
    val out = parquetFiles(s"$dir/out")
    assert(rowsPerFile > 0)
    // ~30 bytes/row estimated → ~2k rows/file → ~5 files; bound loosely
    assert(out.size < 15, s"still fragmented: ${out.size} files")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 10000)
    assert(back.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      df.as[(Long, String)].collect().sortBy(_._1).toSeq)
  }

  test("tiny target still writes at least one file per partition cap") {
    val dir = tmpDir("compact_tiny")
    val df = (1 to 10).map(i => (i.toLong, "x")).toDF("id", "v")
    Compaction.compactTo(df, s"$dir/out", 1L)
    assert(spark.read.parquet(s"$dir/out").count() == 10)
  }

  test("empty input writes an empty but readable dataset") {
    val dir = tmpDir("compact_empty")
    val df = Seq.empty[(Long, String)].toDF("id", "v")
    Compaction.compactTo(df, s"$dir/out", 1024 * 1024)
    assert(spark.read.parquet(s"$dir/out").count() == 0)
  }
}
