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

  // ---- removeDuplicatedSpans (oracle twin: q275) ----

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def runRemove(rows: Seq[(Long, String)], parts: Int = 3) = {
    val df = rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(parts)
    Dedup.removeDuplicatedSpans(df, "doc_id", "text", "n_chars")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("a planted cross-doc span is excised from EVERY doc; unique text kept") {
    val shared = block(1) + block(2) // 128 chars, duplicated across docs
    val u1 = block(7) + block(8)
    val u2 = block(11) + block(12)
    val out = runRemove(Seq(
      1L -> (u1 + shared), 2L -> (shared + u2), 3L -> u2))
    // doc 1: windows at 0..128 step 32; the shared block spans chars
    // 128..256 but only ALIGNED windows fully inside dup text hash-match
    // doc 2's copy (doc 2 has it at offset 0) — windows are aligned to
    // the DOC, so matching hashes require equal 64-char content at both
    // stride positions. Here window [128,192) of doc1 = shared[0,64) =
    // window [0,64) of doc2, and [160,224) = shared[32,96) = [32,96) of
    // doc2, and [192,256) = shared[64,128) = [64,128) of doc2 — all
    // three dup windows merge to one [128, 256) span in doc 1.
    assert(out(1L)._1 == 1L)
    assert(out(1L)._2 == 128L)
    assert(out(1L)._3 == 128L)
    assert(out(1L)._4 == md5hex(u1))
    // doc 2 keeps its unique suffix; doc 3 untouched — but doc 3 shares
    // u2 with doc 2's suffix, so BOTH lose u2 (the ExactSubstr rule:
    // every occurrence goes)
    assert(out(2L)._4 == md5hex(""))
    assert(out(3L)._4 == md5hex(""))
  }

  test("intra-doc repetition alone is not removed") {
    val rep = block(3) + block(3)
    val out = runRemove(Seq(1L -> rep, 2L -> (block(9) + block(10))))
    assert(out(1L) == ((0L, 0L, 128L, md5hex(rep))))
  }

  test("overlapping dup windows merge into one maximal span") {
    val p = block(4) + block(5) // 128 shared chars → 3 overlapping windows
    val t1 = p + block(6)
    val t2 = p + block(13)
    val out = runRemove(Seq(1L -> t1, 2L -> t2))
    // one merged span [0, 128): spans=1, removed=128, remainder kept
    assert(out(1L) == ((1L, 128L, 64L, md5hex(block(6)))))
    assert(out(2L) == ((1L, 128L, 64L, md5hex(block(13)))))
  }

  test("short docs pass through unchanged; partition-invariant") {
    val tiny = block(1).take(63)
    val rows = Seq(1L -> tiny, 2L -> (block(1) + block(2)),
      3L -> (block(1) + block(14)))
    val out = runRemove(rows)
    assert(out(1L) == ((0L, 0L, 63L, md5hex(tiny))))
    // docs 2 and 3 share the aligned prefix block → both lose [0, 64)
    assert(out(2L) == ((1L, 64L, 64L, md5hex(block(2)))))
    assert(runRemove(rows, parts = 1) == runRemove(rows, parts = 7))
  }

  test("removal agrees with the q177 signal: spans exist iff dup windows do") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val frac = Dedup.duplicatedSpanFraction(
        docs, "doc_id", "text", "n_chars")
      .filter(col("n_dup") > 0).select("doc_id")
      .as[Long].collect().toSet
    val rem = Dedup.removeDuplicatedSpans(
        docs, "doc_id", "text", "n_chars")
      .filter(col("n_spans") > 0).select("doc_id")
      .as[Long].collect().toSet
    assert(frac == rem)
  }

  // ---- removeExactSubstr (oracle twin: q305) ----

  private def runExact(rows: Seq[(Long, String)], minLen: Int) = {
    val df = rows.toDF("doc_id", "text").repartition(3)
    Dedup.removeExactSubstr(df, "doc_id", "text", minLen)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("exact-substr: a planted variable-length run is excised everywhere") {
    def w(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
    // a 7-token run shared between docs 1 and 2; minLen 5 → variable
    // length > minLen caught whole; doc 3 untouched
    val shared = "dup1 dup2 dup3 dup4 dup5 dup6 dup7"
    val out = runExact(Seq(
      1L -> s"${w(1, 10)} $shared ${w(11, 20)}",
      2L -> s"${w(31, 36)} $shared",
      3L -> w(41, 60)), minLen = 5)
    // both occurrences removed, as ONE merged span of 7 tokens each
    assert(out(1L)._1 == 1L && out(1L)._2 == 7L && out(1L)._3 == 20L)
    assert(out(2L)._1 == 1L && out(2L)._2 == 7L && out(2L)._3 == 6L)
    assert(out(3L) == ((0L, 0L, 20L, md5hex(w(41, 60)))))
    // the cleaned text is exactly the kept tokens space-joined
    assert(out(2L)._4 == md5hex(w(31, 36)))
    assert(out(1L)._4 == md5hex(s"${w(1, 10)} ${w(11, 20)}"))
  }

  test("exact-substr: within-document repetition counts (unlike q275)") {
    val run5 = "r1 r2 r3 r4 r5"
    val out = runExact(Seq(
      1L -> s"$run5 a1 a2 a3 a4 a5 a6 $run5",
      2L -> "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"), minLen = 5)
    assert(out(1L)._1 == 2L && out(1L)._2 == 10L, out(1L).toString)
    assert(out(2L)._1 == 0L)
  }

  test("exact-substr: runs shorter than minLen survive") {
    val short = "s1 s2 s3"
    val out = runExact(Seq(
      1L -> s"$short x1 x2 x3 x4 x5",
      2L -> s"$short y1 y2 y3 y4 y5"), minLen = 5)
    assert(out.values.forall(_._1 == 0L), out.toString)
  }

  test("exact-substr curve rows equal independent per-rung runs") {
    def w(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
    val shared = (1 to 10).map(i => s"d$i").mkString(" ") // 10-token run
    val rows = Seq(
      1L -> s"${w(1, 10)} $shared",
      2L -> s"$shared ${w(21, 30)}",
      3L -> w(41, 70))
    val df = rows.toDF("doc_id", "text").repartition(3)
    val curve = Dedup.exactSubstrCurve(df, "doc_id", "text", Seq(4, 8, 16))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (l <- Seq(4, 8, 16)) {
      val run = Dedup.removeExactSubstr(df, "doc_id", "text", l)
        .filter(col("n_spans") > 0)
        .agg(count(lit(1)), coalesce(sum("n_spans"), lit(0L)),
          coalesce(sum("removed_toks"), lit(0L)))
        .as[(Long, Long, Long)].head()
      assert(curve(l.toLong) == run, s"rung $l: ${curve(l.toLong)} vs $run")
    }
    // the 10-token plant is visible at 4 and 8, gone at 16
    assert(curve(4L)._1 == 2L && curve(8L)._1 == 2L && curve(16L)._1 == 0L)
    assert(curve(4L)._3 == 20L)
    intercept[IllegalArgumentException] {
      Dedup.exactSubstrCurve(df, "doc_id", "text", Seq(4, 4))
    }
  }

  test("sampled exact-substr curve equals the unsampled curve over the md5 slice") {
    def w(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
    val shared = (1 to 10).map(i => s"d$i").mkString(" ")
    val rows = (0L until 20L).map(i =>
      i -> s"${w(i.toInt * 10, i.toInt * 10 + 9)} $shared")
    val df = rows.toDF("doc_id", "text")
    val keep = org.apache.spark.sql.functions.expr(
      "CAST(conv(substring(md5(concat('s9', ':', " +
        "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) " +
        "% 1000000 < 500000")
    val manual = Dedup.exactSubstrCurve(df.filter(keep), "doc_id", "text",
        Seq(4, 8)).as[(Long, Long, Long, Long, Long)].collect().toSet
    val sampled = Dedup.exactSubstrCurve(df, "doc_id", "text", Seq(4, 8),
        samplePpm = 500000, sampleSalt = "s9")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(sampled == manual && sampled.nonEmpty)
    val full = Dedup.exactSubstrCurve(df, "doc_id", "text", Seq(4, 8))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(sampled != full)
  }

  test("exact-substr: overlapping duplicated grams merge to one maximal span") {
    // a 9-token duplicated run with minLen 4: grams at starts 0..5 all
    // duplicated → ONE island of 9, not six spans
    val run9 = "m1 m2 m3 m4 m5 m6 m7 m8 m9"
    val out = runExact(Seq(
      1L -> s"$run9 p1 p2 p3 p4",
      2L -> s"q1 q2 q3 q4 $run9"), minLen = 4)
    assert(out(1L)._1 == 1L && out(1L)._2 == 9L)
    assert(out(2L)._1 == 1L && out(2L)._2 == 9L)
    assert(out(1L)._4 == md5hex("p1 p2 p3 p4"))
    assert(out(2L)._4 == md5hex("q1 q2 q3 q4"))
  }
}
