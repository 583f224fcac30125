package graft

import graft.ext.TextStats

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class ChunkPackSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("chunk windows tile the doc: stride offsets, full coverage, short tail") {
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val rows = TextStats.chunkTokens(
      Seq((1L, text)).toDF("id", "text"), "id", "text",
      chunkSize = 64, stride = 48)
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // starts at 0, 48, 96, 144; windows 64,64,54(=150-96),6(=150-144)
    assert(rows.toSeq == Seq((0, 0L, 64L), (1, 48L, 64L), (2, 96L, 54L),
      (3, 144L, 6L)))
    // every token position is inside at least one window
    val covered = rows.flatMap { case (_, off, n) => off until (off + n) }
    assert(covered.toSet == (0L until 150L).toSet)
  }

  test("doc shorter than one chunk is a single short window") {
    val rows = TextStats.chunkTokens(
      Seq((1L, "a b c")).toDF("id", "text"), "id", "text", 64, 48)
      .collect().map(r => (r.getInt(1), r.getLong(3)))
    assert(rows.toSeq == Seq((0, 3L)))
  }

  test("packing lays buckets head-to-tail with consistent block spans") {
    val docs = (1L to 40L)
      .map(i => (i, (1L to (i % 7 + 1)).map(j => s"w$j").mkString(" ")))
    val rows = TextStats.packSequences(
      docs.toDF("id", "text"), "id", "text", blockSize = 8, buckets = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    rows.groupBy(_._2).foreach { case (_, bucketRows) =>
      val sorted = bucketRows.sortBy(_._1)
      // contiguous: each doc starts where the previous one ended
      val offsets = sorted.scanLeft(0L) { case (acc, r) => acc + r._3 }
      assert(sorted.map(_._4).toSeq == offsets.init.toSeq)
      // block span is derived from offset and length, floor-division
      sorted.foreach { case (_, _, n, off, first, last) =>
        assert(first == off / 8 && last == (off + n - 1) / 8)
      }
    }
    // straddlers exist in this fixture (spans of 2+ blocks)
    assert(rows.exists(r => r._6 > r._5))
  }

  // ---- packingCurve (oracle twin: q296) ----

  test("packing curve: hand-computed blocks, waste, and splits") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 5).map(i => s"w$i").mkString(" ")),   // 5 tokens
      (2L, (1 to 4).map(i => s"w$i").mkString(" ")),   // 4
      (3L, (1 to 3).map(i => s"w$i").mkString(" ")))   // 3 → T = 12
      .toDF("doc_id", "text")
    val got = graft.ext.TextStats.packingCurve(
      docs, "doc_id", "text", blockSizes = Seq(4, 8), buckets = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // rung 4: 3 blocks, zero waste, docs 1 and 2 straddle a boundary
    assert(got(4L) == ((3L, 12L, 0L, 2L)))
    // rung 8: 2 blocks, 4 of 16 slots padded, doc 2 straddles
    assert(got(8L) == ((2L, 12L, 250000L, 1L)))
  }

  test("curve split counts agree with packSequences block spans") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val fromPack = graft.ext.TextStats.packSequences(
      docs, "doc_id", "text", blockSize = 256, buckets = 32)
      .filter(col("block_first") =!= col("block_last")).count()
    val fromCurve = graft.ext.TextStats.packingCurve(
      docs, "doc_id", "text", blockSizes = Seq(64, 256), buckets = 32)
      .filter(col("block_size") === 256)
      .collect().head.getLong(4)
    assert(fromCurve == fromPack)
  }
}
