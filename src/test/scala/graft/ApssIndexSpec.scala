package graft

import graft.ext.{ApssIndex, Dedup}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.ApssIndex]]: versioned persisted exact-APSS index —
  * fold/pairsAgainst ≡ the one-shot [[Dedup.apssCosinePairs]] over the
  * accumulated corpus restricted to fresh involvement (the prefix filter
  * stays lossless under the FROZEN df order), floor honored, marker-gated
  * idempotent folds, compact re-derives the order without changing
  * answers, retention + time-travel. Oracle twin: q326.
  */
class ApssIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Families keyed by id % 10 so near-dups CROSS the build/fold/probe
    * slices: shared 30-token body, tiny per-doc tail (cosine ≈ 0.88).
    */
  private def docs(ids: Seq[Long]): DataFrame =
    ids.map { i =>
      val fam = i % 10
      val body = (0 until 30)
        .map(j => s"w${fam}x${(j * 7 + fam) % 11}").mkString(" ")
      (i, s"$body tail${i / 10} t${i / 10}")
    }.toDF("doc_id", "text")

  private def pairs(df: DataFrame): Set[(Long, Long, Long, Long, Long, Long)] =
    df.select("doc_a", "doc_b", "overlap", "n_a", "n_b", "cos_ppb")
      .as[(Long, Long, Long, Long, Long, Long)].collect.toSet

  /** The adjudication target: the one-shot exact join over the
    * accumulated corpus, restricted to pairs involving a fresh id.
    */
  private def oneShot(
      stored: DataFrame, fresh: DataFrame, t: Int,
      k: Int = 3): Set[(Long, Long, Long, Long, Long, Long)] = {
    val freshIds = fresh.select("doc_id").as[Long].collect.toSet
    pairs(Dedup.apssCosinePairs(
      stored.unionByName(fresh), "doc_id", "text", t, k))
      .filter(p => freshIds(p._1) || freshIds(p._2))
  }

  test("fold equals the one-shot exact join restricted to fresh involvement") {
    val dir = tmpDir("apsx_eq")
    val a = docs(0L until 30L)
    val fresh = docs(30L until 45L)
    ApssIndex.build(spark, a, dir, "d", "doc_id", "text",
      floorPermil = 500)
    val folded = pairs(ApssIndex.fold(
      spark, fresh, dir, "d", "doc_id", "text", thresholdPermil = 700))
    assert(folded == oneShot(a, fresh, 700) && folded.nonEmpty)
    // a second fold joins base + committed delta
    val more = docs(45L until 55L)
    val g2 = pairs(ApssIndex.fold(
      spark, more, dir, "d", "doc_id", "text", thresholdPermil = 700))
    assert(g2 == oneShot(docs(0L until 45L), more, 700) && g2.nonEmpty)
  }

  test("pairsAgainst previews read-only; below-floor thresholds refused") {
    val dir = tmpDir("apsx_ro")
    ApssIndex.build(spark, docs(0L until 30L), dir, "d", "doc_id", "text",
      floorPermil = 600)
    val fresh = docs(30L until 45L)
    val preview = pairs(ApssIndex.pairsAgainst(
      spark, fresh, dir, "d", "doc_id", "text", thresholdPermil = 700))
    assert(ApssIndex.currentVersion(spark, dir, "d").contains(1))
    assert(!new java.io.File(s"$dir/d.apssindex/v1/_folds").exists())
    assert(preview == oneShot(docs(0L until 30L), fresh, 700))
    // the stored prefixes are cut at floor 600: a looser query would be
    // lossy, so it is refused loudly
    intercept[IllegalArgumentException] {
      ApssIndex.pairsAgainst(spark, fresh, dir, "d", "doc_id", "text",
        thresholdPermil = 550)
    }
    intercept[IllegalArgumentException] {
      ApssIndex.fold(spark, fresh, dir, "d", "doc_id", "text",
        thresholdPermil = 550)
    }
  }

  test("a committed generation replays as a no-op instead of double-inserting") {
    val dir = tmpDir("apsx_idem")
    val a = docs(0L until 30L)
    val fresh = docs(30L until 45L)
    ApssIndex.build(spark, a, dir, "d", "doc_id", "text")
    val first = pairs(ApssIndex.fold(spark, fresh, dir, "d", "doc_id",
      "text", thresholdPermil = 700, generation = Some(4L)))
    val retry = pairs(ApssIndex.fold(spark, fresh, dir, "d", "doc_id",
      "text", thresholdPermil = 700, generation = Some(4L)))
    assert(retry == first && first.nonEmpty)
    // exactly ONE copy folded in: a later preview equals the clean
    // two-slice accumulated answer
    val probe = docs(45L until 55L)
    val preview = pairs(ApssIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text", thresholdPermil = 700))
    assert(preview == oneShot(docs(0L until 45L), probe, 700))
    intercept[IllegalArgumentException] {
      ApssIndex.fold(spark, probe, dir, "d", "doc_id", "text",
        thresholdPermil = 700, generation = Some(2L)).count()
    }
  }

  test("compact re-derives the df order without changing answers; retention + time travel") {
    val dir = tmpDir("apsx_compact")
    val a = docs(0L until 30L)
    ApssIndex.build(spark, a, dir, "d", "doc_id", "text")
    ApssIndex.fold(spark, docs(30L until 45L), dir, "d", "doc_id", "text",
      thresholdPermil = 700).count()
    val probe = docs(45L until 55L)
    val before = pairs(ApssIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text", thresholdPermil = 700))
    ApssIndex.compact(spark, dir, "d")
    assert(ApssIndex.currentVersion(spark, dir, "d").contains(2))
    val after = pairs(ApssIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text", thresholdPermil = 700))
    assert(after == before && after.nonEmpty)
    // newest-2 retention keeps v1; time-travel to it answers the
    // PRE-compaction state (same content here — compaction is
    // answer-invariant — so the point is that the read WORKS off v1)
    assert(ApssIndex.versions(spark, dir, "d") == Seq(1, 2))
    val atV1 = pairs(ApssIndex.pairsAgainst(
      spark, probe, dir, "d", "doc_id", "text", thresholdPermil = 700,
      atVersion = Some(1)))
    assert(atV1 == before)
    // window slides on the next compact; v1 refused loudly
    ApssIndex.compact(spark, dir, "d")
    assert(ApssIndex.versions(spark, dir, "d") == Seq(2, 3))
    intercept[IllegalArgumentException] {
      ApssIndex.pairsAgainst(spark, probe, dir, "d", "doc_id", "text",
        thresholdPermil = 700, atVersion = Some(1))
    }
  }

  test("frozen params honored: non-default k and floor survive folds") {
    val dir = tmpDir("apsx_params")
    val a = docs(0L until 30L)
    val fresh = docs(30L until 45L)
    ApssIndex.build(spark, a, dir, "d", "doc_id", "text",
      floorPermil = 500, k = 2)
    val folded = pairs(ApssIndex.fold(
      spark, fresh, dir, "d", "doc_id", "text", thresholdPermil = 800))
    assert(folded == oneShot(a, fresh, 800, k = 2) && folded.nonEmpty)
  }
}
