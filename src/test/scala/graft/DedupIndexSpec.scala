package graft

import graft.ext.{Dedup, DedupIndex}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.DedupIndex]]: versioned persisted MinHash-LSH dedup index —
  * fold/pairsAgainst ≡ the in-memory incremental operator, marker-gated
  * delta commits, params frozen in the artifact, compaction is a pure
  * rewrite. Oracle twin: q313.
  */
class DedupIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Small corpus with planted near-dups across slices: doc 3k+1 and
    * 3k+2 and 3k share a long common body with tiny per-doc tails, other
    * families are mutually far.
    */
  private def docs(ids: Seq[Long]): DataFrame =
    ids.map { i =>
      val fam = i / 3
      val body = (0 until 30)
        .map(j => s"w${fam}x${(j * 7 + fam) % 11}").mkString(" ")
      (i, s"$body tail${i % 3} t${i % 3}")
    }.toDF("doc_id", "text")

  private def pairs(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("id_a", "id_b", "inter_size", "union_size")
      .as[(Long, Long, Long, Long)].collect.toSet

  test("fold pairs equal the in-memory incremental operator") {
    val dir = tmpDir("didx_eq")
    val base = docs(0L until 30L)
    val fresh = docs(30L until 45L)
    DedupIndex.build(spark, base, dir, "d", "doc_id", "text")
    val folded = pairs(DedupIndex.fold(
      spark, fresh, dir, "d", "doc_id", "text"))
    val oneShot = pairs(Dedup.minhashNearDupPairsIncremental(
      base, fresh, "doc_id", "text"))
    assert(folded == oneShot && folded.nonEmpty)
  }

  test("pairsAgainst previews without committing; a later fold still sees g1") {
    val dir = tmpDir("didx_ro")
    DedupIndex.build(spark, docs(0L until 30L), dir, "d", "doc_id", "text")
    val fresh = docs(30L until 45L)
    val preview = pairs(DedupIndex.pairsAgainst(
      spark, fresh, dir, "d", "doc_id", "text"))
    // nothing committed: no fold markers, version unchanged
    assert(DedupIndex.currentVersion(spark, dir, "d").contains(1))
    assert(!new java.io.File(s"$dir/d.dedupindex/v1/_folds").exists())
    val folded = pairs(DedupIndex.fold(
      spark, fresh, dir, "d", "doc_id", "text"))
    assert(folded == preview)
  }

  test("second-generation fold joins base + committed delta") {
    val dir = tmpDir("didx_g2")
    val a = docs(0L until 30L)
    val b = docs(30L until 45L)
    val c = docs(45L until 60L)
    DedupIndex.build(spark, a, dir, "d", "doc_id", "text")
    DedupIndex.fold(spark, b, dir, "d", "doc_id", "text").count()
    val g2 = pairs(DedupIndex.fold(spark, c, dir, "d", "doc_id", "text"))
    val oneShot = pairs(Dedup.minhashNearDupPairsIncremental(
      a.unionByName(b), c, "doc_id", "text"))
    assert(g2 == oneShot && g2.nonEmpty)
  }

  test("an uncommitted orphan delta is invisible and the retry overwrites it") {
    val dir = tmpDir("didx_orphan")
    val a = docs(0L until 30L)
    val fresh = docs(30L until 45L)
    DedupIndex.build(spark, a, dir, "d", "doc_id", "text")
    // fake a crashed fold: delta dir for g1 with GARBAGE content, no marker
    val orphan = s"$dir/d.dedupindex/v1/deltas/g1"
    docs(900L until 905L).write.parquet(s"$orphan/sets")
    val before = pairs(DedupIndex.pairsAgainst(
      spark, fresh, dir, "d", "doc_id", "text"))
    val clean = pairs(Dedup.minhashNearDupPairsIncremental(
      a, fresh, "doc_id", "text"))
    assert(before == clean, "orphan delta must be invisible")
    // the retry takes generation 1 again, overwrites the garbage, commits
    val folded = pairs(DedupIndex.fold(
      spark, fresh, dir, "d", "doc_id", "text"))
    assert(folded == clean)
    val again = pairs(DedupIndex.pairsAgainst(
      spark, docs(60L until 63L), dir, "d", "doc_id", "text"))
    assert(again.forall(p => p._1 < 900L || p._1 >= 60L),
      s"garbage rows must never surface: $again")
  }

  test("banding params are frozen in the artifact and honored by folds") {
    val dir = tmpDir("didx_params")
    val a = docs(0L until 30L)
    val fresh = docs(30L until 45L)
    // non-default scheme: bigram shingles, 64 hashes, 4-row bands
    DedupIndex.build(spark, a, dir, "d", "doc_id", "text",
      k = 2, numHashes = 64, bandRows = 4)
    val folded = pairs(DedupIndex.fold(
      spark, fresh, dir, "d", "doc_id", "text"))
    val oneShot = pairs(Dedup.minhashNearDupPairsIncremental(
      a, fresh, "doc_id", "text", k = 2, numHashes = 64, bandRows = 4))
    assert(folded == oneShot)
  }

  test("compact rewrites deltas into one base with identical answers") {
    val dir = tmpDir("didx_compact")
    val a = docs(0L until 30L)
    val b = docs(30L until 45L)
    DedupIndex.build(spark, a, dir, "d", "doc_id", "text")
    DedupIndex.fold(spark, b, dir, "d", "doc_id", "text").count()
    val probe = docs(45L until 60L)
    val before = pairs(DedupIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text"))
    DedupIndex.compact(spark, dir, "d")
    assert(DedupIndex.currentVersion(spark, dir, "d").contains(2))
    val after = pairs(DedupIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text"))
    assert(after == before && after.nonEmpty)
    val names = new java.io.File(s"$dir/d.dedupindex")
      .listFiles().map(_.getName).toSet
    // newest-2 retention: the compacted-away v1 SURVIVES the v2 commit
    assert(names.contains("v2") && names.contains("v1"), names.toString)
    assert(!new java.io.File(s"$dir/d.dedupindex/v2/deltas").exists())
    // a second compact promotes v3 and GCs v1 (window slides)
    DedupIndex.compact(spark, dir, "d")
    val names2 = new java.io.File(s"$dir/d.dedupindex")
      .listFiles().map(_.getName).toSet
    assert(names2.contains("v3") && names2.contains("v2") &&
      !names2.contains("v1"), names2.toString)
    assert(DedupIndex.versions(spark, dir, "d") == Seq(2, 3))
  }

  test("in-flight reader of v(N) survives a concurrent compact commit") {
    val dir = tmpDir("didx_race")
    val a = docs(0L until 30L)
    DedupIndex.build(spark, a, dir, "d", "doc_id", "text")
    DedupIndex.fold(spark, docs(30L until 45L), dir, "d", "doc_id", "text")
      .count()
    val probe = docs(45L until 60L)
    // the reader resolves the pointer (v1) NOW; evaluation comes later
    val inFlight = DedupIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text")
    val expected = pairs(DedupIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text"))
    DedupIndex.compact(spark, dir, "d") // commits v2
    // falsifiability (q293 idiom): delete v2 entirely — if the in-flight
    // plan still answers, it really reads v1's retained files
    graft.io.VersionPointer.dropDir(spark, s"$dir/d.dedupindex/v2")
    assert(pairs(inFlight) == expected && expected.nonEmpty)
  }

  test("time-travel: atVersion queries a retained historical version") {
    val dir = tmpDir("didx_tt")
    val a = docs(0L until 30L)
    val ab = docs(0L until 45L)
    DedupIndex.build(spark, a, dir, "d", "doc_id", "text") // v1 = slice a
    DedupIndex.build(spark, ab, dir, "d", "doc_id", "text") // v2 = a + b
    // probe: fresh ids carrying slice-b families, so v1 (which lacks b)
    // and v2 answer DIFFERENTLY
    val probe = docs(30L until 45L)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val atV1 = pairs(DedupIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text", atVersion = Some(1)))
    val current = pairs(DedupIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text"))
    assert(atV1 == pairs(Dedup.minhashNearDupPairsIncremental(
      a, probe, "doc_id", "text")))
    assert(current == pairs(Dedup.minhashNearDupPairsIncremental(
      ab, probe, "doc_id", "text")))
    assert(atV1.nonEmpty && atV1 != current)
    // uncommitted / GC'd versions are refused loudly
    intercept[IllegalArgumentException] {
      DedupIndex.pairsAgainst(spark, probe, dir, "d", "doc_id", "text",
        atVersion = Some(3))
    }
    DedupIndex.build(spark, ab, dir, "d", "doc_id", "text") // v3 GCs v1
    intercept[IllegalArgumentException] {
      DedupIndex.pairsAgainst(spark, probe, dir, "d", "doc_id", "text",
        atVersion = Some(1))
    }
  }

  test("a committed generation replays as a no-op instead of double-inserting") {
    val dir = tmpDir("didx_idem")
    val a = docs(0L until 30L)
    val fresh = docs(30L until 45L)
    DedupIndex.build(spark, a, dir, "d", "doc_id", "text")
    val first = pairs(DedupIndex.fold(
      spark, fresh, dir, "d", "doc_id", "text", generation = Some(7L)))
    // at-least-once retry: same batch identity AFTER the marker committed
    val retry = pairs(DedupIndex.fold(
      spark, fresh, dir, "d", "doc_id", "text", generation = Some(7L)))
    assert(retry == first && first.nonEmpty)
    // the index holds ONE copy of the fold: a later preview against a
    // third slice matches the clean two-slice incremental answer
    val probe = docs(45L until 60L)
    val preview = pairs(DedupIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text"))
    assert(preview == pairs(Dedup.minhashNearDupPairsIncremental(
      a.unionByName(fresh), probe, "doc_id", "text")))
    // out-of-order batch identities are refused loudly
    intercept[IllegalArgumentException] {
      DedupIndex.fold(spark, probe, dir, "d", "doc_id", "text",
        generation = Some(3L)).count()
    }
  }

  test("pairsWithin equals the one-shot pairs over the indexed corpus") {
    val dir = tmpDir("didx_within")
    val a = docs(0L until 30L)
    val b = docs(30L until 45L)
    DedupIndex.build(spark, a, dir, "d", "doc_id", "text")
    DedupIndex.fold(spark, b, dir, "d", "doc_id", "text").count()
    // computed entirely off the stored artifacts (base + committed
    // delta) — must equal re-signing the accumulated corpus from text
    val within = pairs(DedupIndex.pairsWithin(spark, dir, "d"))
    val oneShot = pairs(Dedup.minhashNearDupPairs(
      a.unionByName(b), "doc_id", "text",
      k = 3, numHashes = 128, bandRows = 2,
      thresholdNum = 7, thresholdDen = 10))
    assert(within == oneShot && within.nonEmpty)
  }

  test("build refuses an indivisible banding scheme; fold requires an index") {
    val dir = tmpDir("didx_req")
    intercept[IllegalArgumentException] {
      DedupIndex.build(spark, docs(0L until 3L), dir, "d", "doc_id",
        "text", numHashes = 10, bandRows = 3)
    }
    intercept[IllegalArgumentException] {
      DedupIndex.fold(spark, docs(0L until 3L), dir, "nope", "doc_id",
        "text")
    }
  }
}
