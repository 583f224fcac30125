package graft

import graft.ext.{AnnIndex, Similarity}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.AnnIndex]]: versioned persisted IVF index — fold IO is
  * delta-sized (no scan of stored postings), retrain ≡ the one-shot
  * in-memory operator, pointer commit survives torn manifests.
  */
class AnnIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Dim = 8
  private val Cent = 4

  /** Deterministic synthetic vectors: id-seeded, mildly clustered. */
  private def vecs(ids: Seq[Long]) =
    ids.map { i =>
      (i, Array.tabulate(Dim)(d =>
        (((i * 31 + d * 7) % 13).toFloat / 13f) +
          (if (i % 3 == 0) 1f else 0f)))
    }.toDF("vec_id", "embedding")

  test("build + fold + topK equals the oracle contract; retrain equals one-shot") {
    val dir = tmpDir("annidx_eq")
    val a = vecs(1L to 60L)
    val b = vecs(61L to 100L)
    AnnIndex.build(spark, a, dir, "e", "vec_id", "embedding", Cent, Dim)
    assert(AnnIndex.currentVersion(spark, dir, "e").contains(1))
    AnnIndex.fold(spark, b, dir, "e", "vec_id", "embedding")
    // still v1 — folds extend postings, they don't version
    assert(AnnIndex.currentVersion(spark, dir, "e").contains(1))
    val q = vecs(1L to 5L)
    val maintained = AnnIndex.topK(
      spark, q, dir, "e", "vec_id", "embedding", k = 3, numProbes = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    assert(maintained.nonEmpty)
    // RETRAIN re-fits the quantizer over the accumulated corpus — from
    // there the persisted index must answer EXACTLY like the one-shot
    // in-memory operator over the same corpus (same fixed-point Lloyd,
    // same assignment, same re-rank)
    AnnIndex.retrain(spark, dir, "e", "vec_id", "embedding", Cent, Dim)
    assert(AnnIndex.currentVersion(spark, dir, "e").contains(2))
    val persisted = AnnIndex.topK(
      spark, q, dir, "e", "vec_id", "embedding", k = 3, numProbes = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    val oneShot = Similarity.ivfTopKLloyd(
      vecs(1L to 100L), q, "vec_id", "embedding", k = 3,
      numCentroids = Cent, dim = Dim, numProbes = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    assert(persisted == oneShot)
    // newest-2 retention: the superseded v1 SURVIVES the v2 commit (an
    // in-flight reader's files stay), and time-travel still reads it —
    // at v1 the index holds only slice `a`, so the answer matches the
    // one-shot over `a` under v1's quantizer
    val names = new java.io.File(s"$dir/e.annindex")
      .listFiles().map(_.getName).toSet
    assert(names.contains("v2") && names.contains("v1"), names.toString)
    assert(AnnIndex.versions(spark, dir, "e") == Seq(1, 2))
    val atV1 = AnnIndex.topK(
      spark, q, dir, "e", "vec_id", "embedding", k = 3, numProbes = 2,
      atVersion = Some(1))
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    // v1 = slice `a` base + slice `b` committed fold delta: the
    // maintained-at-v1 state, whose one-shot twin assigns a∪b under a
    // quantizer trained on `a` — already pinned equal by the fold tests;
    // here it must DIFFER from v2 (retrained quantizer) for at least
    // some query while staying non-empty
    assert(atV1.nonEmpty && atV1 == maintained)
    // a third version slides the window: v1 is GC'd and refused loudly
    AnnIndex.retrain(spark, dir, "e", "vec_id", "embedding", Cent, Dim)
    intercept[IllegalArgumentException] {
      AnnIndex.topK(spark, q, dir, "e", "vec_id", "embedding", k = 3,
        numProbes = 2, atVersion = Some(1))
    }
    assert(AnnIndex.versions(spark, dir, "e") == Seq(2, 3))
  }

  test("fold order and granularity do not change the maintained answer") {
    // the q281 streaming contract: folds are append-only assignments
    // against FROZEN centroids, so many small folds in any order must
    // answer identically to one big fold
    val train = vecs(1L to 50L)
    val d1 = vecs(51L to 70L)
    val d2 = vecs(71L to 90L)
    val q = vecs(3L to 8L)
    def answer(dir: String, folds: Seq[org.apache.spark.sql.DataFrame]) = {
      AnnIndex.build(spark, train, dir, "e", "vec_id", "embedding",
        Cent, Dim)
      folds.foreach(f =>
        AnnIndex.fold(spark, f, dir, "e", "vec_id", "embedding"))
      AnnIndex.topK(spark, q, dir, "e", "vec_id", "embedding",
          k = 3, numProbes = 2)
        .orderBy("query_id", "rank")
        .as[(Long, Int, Long, Double)].collect.toSeq
    }
    val oneFold = answer(tmpDir("annidx_one"), Seq(d1.unionByName(d2)))
    val twoFolds = answer(tmpDir("annidx_two"), Seq(d1, d2))
    val reversed = answer(tmpDir("annidx_rev"), Seq(d2, d1))
    assert(twoFolds == oneFold)
    assert(reversed == oneFold)
  }

  test("a committed fold generation replays as a no-op (at-least-once safety)") {
    val dir = tmpDir("annidx_idem")
    AnnIndex.build(spark, vecs(1L to 50L), dir, "e", "vec_id", "embedding",
      Cent, Dim)
    val d1 = vecs(51L to 70L)
    AnnIndex.fold(spark, d1, dir, "e", "vec_id", "embedding",
      generation = Some(3L))
    // the retried batch (same identity) must not double-insert: the
    // maintained answer stays equal to the single-fold answer
    AnnIndex.fold(spark, d1, dir, "e", "vec_id", "embedding",
      generation = Some(3L))
    val q = vecs(3L to 8L)
    val got = AnnIndex.topK(spark, q, dir, "e", "vec_id", "embedding",
        k = 3, numProbes = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    val cleanDir = tmpDir("annidx_idem_clean")
    AnnIndex.build(spark, vecs(1L to 50L), cleanDir, "e", "vec_id",
      "embedding", Cent, Dim)
    AnnIndex.fold(spark, d1, cleanDir, "e", "vec_id", "embedding")
    val clean = AnnIndex.topK(spark, q, cleanDir, "e", "vec_id",
        "embedding", k = 3, numProbes = 2)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    assert(got == clean && got.nonEmpty)
    // one committed delta, not two (hidden .crc sidecars excluded)
    assert(new java.io.File(s"$dir/e.annindex/v1/_folds")
      .listFiles().map(_.getName).filterNot(_.startsWith("."))
      .toSet == Set("g3.ok"))
    intercept[IllegalArgumentException] {
      AnnIndex.fold(spark, vecs(71L to 72L), dir, "e", "vec_id",
        "embedding", generation = Some(1L))
    }
  }

  test("a fold never reads stored postings (delta-sized IO)") {
    val dir = tmpDir("annidx_noscan")
    AnnIndex.build(spark, vecs(1L to 50L), dir, "e", "vec_id", "embedding",
      Cent, Dim)
    // delete every stored postings FILE — a fold that scanned them would
    // fail; one that writes only its own delta dir cannot notice
    val postings = new java.io.File(s"$dir/e.annindex/v1/postings")
    def parquetFiles(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory)
        .flatMap(parquetFiles)
    }
    val stored = parquetFiles(postings)
      .filter(_.getName.endsWith(".parquet"))
    assert(stored.nonEmpty)
    stored.foreach(f => assert(f.delete()))
    AnnIndex.fold(spark, vecs(51L to 70L), dir, "e", "vec_id", "embedding")
    // the fold landed as its own committed delta dir, not an append into
    // the base layout
    val delta = new java.io.File(s"$dir/e.annindex/v1/deltas/g1")
    assert(parquetFiles(delta).exists(_.getName.endsWith(".parquet")),
      "fold wrote no delta files")
    assert(new java.io.File(s"$dir/e.annindex/v1/_folds/g1.ok").isFile,
      "fold did not commit its marker")
    val ids = spark.read.parquet(delta.toString)
      .select("vec_id").as[Long].collect.toSet
    assert(ids == (51L to 70L).toSet, ids.toString)
  }

  test("an uncommitted fold delta is invisible; the retry overwrites it") {
    val dir = tmpDir("annidx_crash")
    AnnIndex.build(spark, vecs(1L to 30L), dir, "e", "vec_id", "embedding",
      Cent, Dim)
    AnnIndex.fold(spark, vecs(31L to 40L), dir, "e", "vec_id", "embedding")
    // simulate a crash between the delta write and the marker PUT by
    // deleting the marker: the delta dir is now an orphan
    val marker = new java.io.File(s"$dir/e.annindex/v1/_folds/g1.ok")
    assert(marker.isFile)
    assert(marker.delete())
    val q = vecs(31L to 33L)
    val blind = AnnIndex.topK(
      spark, q, dir, "e", "vec_id", "embedding", k = 3, numProbes = Cent)
      .select("neighbor_id").as[Long].collect.toSet
    assert(blind.intersect((31L to 40L).toSet).isEmpty,
      s"orphan delta leaked into topK: $blind")
    // the RETRY recomputes the same generation, overwrites the orphan,
    // and commits — the rows appear exactly once
    AnnIndex.fold(spark, vecs(31L to 40L), dir, "e", "vec_id", "embedding")
    val seen = spark.read
      .parquet(s"$dir/e.annindex/v1/deltas/g1")
      .groupBy("vec_id").count()
      .filter(col("count") > 1).count()
    assert(seen == 0L, "retried fold double-inserted rows")
    val after = AnnIndex.topK(
      spark, q, dir, "e", "vec_id", "embedding", k = 3, numProbes = Cent)
      .select("neighbor_id").as[Long].collect.toSet
    assert(after.intersect((31L to 40L).toSet).nonEmpty)
  }

  test("maintained PQ index ADC top-k equals the one-shot operator") {
    // same corpus, same params: the persisted build trains the same
    // fixed-point Lloyd quantizer + md5-seeded codebooks the one-shot
    // trains, so the maintained ADC answer must be BIT-identical
    val dir = tmpDir("annidx_pq_eq")
    val corpus = vecs(1L to 100L)
    val q = vecs(1L to 5L)
    AnnIndex.buildPq(spark, corpus, dir, "e", "vec_id", "embedding",
      numCentroids = Cent, dim = Dim, numSub = 4, codebookSize = 8)
    val maintained = AnnIndex.topKPq(
      spark, q, dir, "e", "vec_id", "embedding", k = 3, numProbes = 2,
      candidates = 10)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    val oneShot = Similarity.ivfPqTopK(
      corpus, q, "vec_id", "embedding", k = 3,
      numCentroids = Cent, dim = Dim, numProbes = 2, numSub = 4,
      codebookSize = 8, candidates = 10)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    assert(maintained == oneShot)
  }

  test("a PQ fold never reads stored codes or postings; plain fold refuses") {
    val dir = tmpDir("annidx_pq_fold")
    AnnIndex.buildPq(spark, vecs(1L to 60L), dir, "e", "vec_id",
      "embedding", numCentroids = Cent, dim = Dim, numSub = 4,
      codebookSize = 8)
    // fold() on a PQ index would leave codes stale — must refuse
    intercept[IllegalArgumentException] {
      AnnIndex.fold(spark, vecs(61L to 70L), dir, "e", "vec_id",
        "embedding")
    }
    // delete every stored code AND posting file — a fold that scanned
    // either would fail; one that encodes only its delta cannot notice
    def parquetFiles(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory)
        .flatMap(parquetFiles)
    }
    for (sub <- Seq("codes", "postings")) {
      val stored = parquetFiles(new java.io.File(s"$dir/e.annindex/v1/$sub"))
        .filter(_.getName.endsWith(".parquet"))
      assert(stored.nonEmpty)
      stored.foreach(f => assert(f.delete()))
    }
    AnnIndex.foldPq(spark, vecs(61L to 70L), dir, "e", "vec_id",
      "embedding")
    // both deltas landed under the one committed generation
    assert(new java.io.File(s"$dir/e.annindex/v1/_folds/g1.ok").isFile)
    val codeIds = spark.read
      .parquet(s"$dir/e.annindex/v1/codes_deltas/g1")
      .select("vec_id").as[Long].collect.toSet
    assert(codeIds == (61L to 70L).toSet, codeIds.toString)
    val vecIds = spark.read
      .parquet(s"$dir/e.annindex/v1/deltas/g1")
      .select("vec_id").as[Long].collect.toSet
    assert(vecIds == (61L to 70L).toSet, vecIds.toString)
  }

  test("PQ fold + retrainPq equal a one-shot over the accumulated corpus") {
    val dir = tmpDir("annidx_pq_retrain")
    AnnIndex.buildPq(spark, vecs(1L to 60L), dir, "e", "vec_id",
      "embedding", numCentroids = Cent, dim = Dim, numSub = 4,
      codebookSize = 8)
    AnnIndex.foldPq(spark, vecs(61L to 100L), dir, "e", "vec_id",
      "embedding")
    val q = vecs(2L to 6L)
    // folded state answers (codebooks frozen on the build corpus)
    assert(AnnIndex.topKPq(spark, q, dir, "e", "vec_id", "embedding",
      k = 3, numProbes = 2, candidates = 10).count() > 0)
    // retrainPq re-fits everything over base + deltas: from there the
    // index must answer exactly like the one-shot over the full corpus
    AnnIndex.retrainPq(spark, dir, "e", "vec_id", "embedding",
      numCentroids = Cent, dim = Dim, numSub = 4, codebookSize = 8)
    assert(AnnIndex.currentVersion(spark, dir, "e").contains(2))
    val maintained = AnnIndex.topKPq(
      spark, q, dir, "e", "vec_id", "embedding", k = 3, numProbes = 2,
      candidates = 10)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    val oneShot = Similarity.ivfPqTopK(
      vecs(1L to 100L), q, "vec_id", "embedding", k = 3,
      numCentroids = Cent, dim = Dim, numProbes = 2, numSub = 4,
      codebookSize = 8, candidates = 10)
      .orderBy("query_id", "rank")
      .as[(Long, Int, Long, Double)].collect.toSeq
    assert(maintained == oneShot)
  }

  test("pointer: torn manifests are skipped; missing index fails fast") {
    val dir = tmpDir("annidx_ptr")
    intercept[IllegalArgumentException] {
      AnnIndex.fold(spark, vecs(1L to 3L), dir, "e", "vec_id", "embedding")
    }
    AnnIndex.build(spark, vecs(1L to 30L), dir, "e", "vec_id", "embedding",
      Cent, Dim)
    val layout = new java.io.File(s"$dir/e.annindex")
    // a torn higher-seq manifest (digit-prefix tear included) is not
    // trusted — readers fall back to the committed one
    val torn = new java.io.File(layout, "_current.999999999")
    val w = new java.io.FileWriter(torn); w.write("2"); w.close()
    assert(AnnIndex.currentVersion(spark, dir, "e").contains(1))
    torn.delete()
    ()
  }
}
