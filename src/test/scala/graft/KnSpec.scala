package graft

import graft.ext.TextStats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.TextStats.knBigramBits]]: interpolated Kneser–Ney at
  * D = 1/2 in exact rationals + integer-log₂ bits. Oracle twin: q316.
  *
  * Train corpus "a b a b a c": c(a,b)=2, c(b,a)=2, c(a,c)=1;
  * c(a)=3 with 2 continuations, c(b)=2 with 1; N₁₊(·b)=N₁₊(·a)=
  * N₁₊(·c)=1; bigram types N₁₊(··)=3.
  */
class KnSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], parts: Int = 3) = {
    val df = rows.toDF("doc_id", "text").repartition(parts)
    TextStats.knBigramBits(
        df.filter(col("doc_id") % 2 === 0), df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
  }

  private val fixture = Seq(
    0L -> "a b a b a c", // train (even)
    1L -> "a b", // seen: num = 3·3 + 2·1 = 11, den = 18 → 18/11 → 0 bits
    3L -> "a c", // seen: num = 1·3 + 2·1 = 5, den = 18 → 18/5 = 3 → 1 bit
    5L -> "b c", // unseen bigram, seen ctx: num = 1·1, den = 12 → 3 bits
    7L -> "z a", // unseen ctx: num = n1w(a) = 1, den = 3 → 1 bit
    9L -> "b z") // unseen w: num floors to 1, den = 12 → 3 bits

  test("hand-computed rationals per backoff level") {
    val out = run(fixture)
    assert(out(1L) == ((1L, 1L, 0L, 0L, 0L, 0L)))
    assert(out(3L) == ((1L, 1L, 0L, 0L, 1L, 1000L)))
    assert(out(5L) == ((1L, 0L, 1L, 0L, 3L, 3000L)))
    assert(out(7L) == ((1L, 0L, 0L, 1L, 1L, 1000L)))
    assert(out(9L) == ((1L, 0L, 1L, 0L, 3L, 3000L)))
  }

  test("train doc scores against itself and multi-bigram docs sum") {
    val out = run(fixture)
    // doc 0: bigrams (a,b),(b,a),(a,b),(b,a),(a,c) — all seen.
    // (a,b): 0 bits ×2; (b,a): num = 3·3 + 1·1 = 10, den = 12 → 12/10
    //   → 0 bits ×2; (a,c): 1 bit. Total 1 bit over 5 → 200 milli.
    assert(out(0L) == ((5L, 5L, 0L, 0L, 1L, 200L)))
  }

  test("continuation mass, not raw frequency, drives unseen contexts") {
    // "f" is FREQUENT in train but always follows "x" (one left context);
    // "g" is rare but follows two distinct contexts. After an unseen
    // context, KN must prefer g (higher N₁₊(·g)) over f.
    val rows = Seq(
      0L -> "x f x f x f y g z g",
      1L -> "q f", // unseen ctx q: num = n1w(f) = 1
      3L -> "q g") // unseen ctx q: num = n1w(g) = 2
    val out = run(rows)
    assert(out(1L)._5 > out(3L)._5,
      s"f must cost more bits than g after an unseen context: $out")
  }

  test("partition invariance") {
    val rows = (0L until 20L).map(i =>
      i -> s"w${i % 5} w${(i + 1) % 4} w${i % 3} w${(i + 2) % 5}")
    assert(run(rows, parts = 1) == run(rows, parts = 8))
  }
}
