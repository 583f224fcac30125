package graft

import graft.ext.Dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Dedup.duplicatedSpanFraction]]: cross-document duplicated
  * 64-char windows at stride 32, per-doc ppm. Oracle twin: q177.
  */
class DupSpansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** 64 deterministic varied chars from a salt (no intra-run collisions
    * unless two salts match). */
  private def block(salt: Int): String =
    (0 until 64).map(i => ('a' + ((i * 7 + salt * 11) % 26)).toChar).mkString

  private def run(rows: Seq[(Long, String)], parts: Int = 3) = {
    val df = rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(parts)
    Dedup.duplicatedSpanFraction(df, "doc_id", "text", "n_chars")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("identical docs are fully duplicated; unique doc is 0 ppm") {
    val shared = block(1) + block(2)
    val out = run(Seq(1L -> shared, 2L -> shared, 3L -> (block(7) + block(8))))
    // 128 chars → windows at offsets 0/32/64 → 3 windows each.
    assert(out(1L) == ((3L, 3L, 1000000L)))
    assert(out(2L) == ((3L, 3L, 1000000L)))
    assert(out(3L) == ((3L, 0L, 0L)))
  }

  test("intra-doc repetition alone does not count as duplication") {
    val rep = block(3) + block(3) // same 64-block twice in ONE doc
    val out = run(Seq(1L -> rep, 2L -> (block(9) + block(10))))
    assert(out(1L)._2 == 0L, "self-repeats must not count")
  }

  test("shared prefix block marks exactly the aligned window") {
    val p = block(4)
    val out = run(Seq(1L -> (p + block(5)), 2L -> (p + block(6))))
    // 3 windows; only the offset-0 window (= p) is shared.
    assert(out(1L) == ((3L, 1L, 333333L)))
    assert(out(2L) == ((3L, 1L, 333333L)))
  }

  test("docs shorter than the window are excluded; partition-invariant") {
    val rows = Seq(1L -> block(1).take(63), 2L -> (block(1) + block(2)))
    val out = run(rows)
    assert(!out.contains(1L))
    assert(run(rows, parts = 1) == run(rows, parts = 7))
  }
}
