package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained MinHash-LSH dedup index — the
  * artifact form of [[Dedup.minhashNearDupPairsIncremental]]. That
  * operator's scaladoc already names this shape: "a production deployment
  * persists the banded corpus AND the incoming bands/sets between
  * batches". This is that artifact, under the same commit discipline as
  * [[AnnIndex]] (shared [[graft.io.VersionPointer]]: create-only manifest
  * PUTs, `ok` terminator, newest-2 retention, no renames — object-store
  * safe).
  *
  * Layout, one version dir per build/compact:
  *  - `v<N>/params` — one row (k, num_hashes, band_rows): the banding
  *    scheme, FROZEN for the index's lifetime. [[fold]] reads it instead
  *    of taking parameters, so a fold can never band differently than
  *    the stored corpus (bucket equality across generations is the whole
  *    correctness argument).
  *  - `v<N>/sign` — the two artifacts as one `__what`-partitioned table
  *    (r10: a batch commits in ONE write action; readers address the
  *    partition subdirs directly): `__what=sets` (doc_id, hsh) — each
  *    indexed doc's distinct 60-bit shingle-hash set, the
  *    exact-verification side; `__what=bands` (doc_id, band, bucket) —
  *    the LSH candidate-join side.
  *  - `v<N>/deltas/g<G>/sign` — one unified delta PER FOLD,
  *    committed by a create-only `v<N>/_folds/g<G>.ok` marker. A crash
  *    mid-fold leaves an invisible orphan; the retry recomputes the same
  *    generation, overwrites it, and commits — never double-inserted.
  *
  * [[fold]] is the per-ingest-batch dedup step a 100 TB pipeline runs
  * daily: shingle+sign ONLY the fresh docs (the fused one-pass exprs —
  * write IO is delta-sized), join fresh bands against stored ∪ fresh
  * bands (ids-only equi-join; the asymmetric join's skew exposure is
  * bounded by the batch side's bucket width), verify candidates with the
  * exact integer Jaccard against stored ∪ fresh sets, RETURN the
  * qualifying pairs (every pair involves ≥ 1 fresh doc), and commit the
  * fresh delta so the next batch sees it. Maintained pair sets are
  * identical to a one-shot [[Dedup.minhashNearDupPairs]] over the
  * accumulated corpus restricted to fresh involvement — same fused
  * signature expr, same banding, same verify arithmetic (q313
  * adjudicates; DedupIndexSpec pins fold ≡ the in-memory incremental
  * operator).
  *
  * Contract: fold ids must be NEW (dedup corpora are append-only;
  * reprocessing is a rebuild concern) and the index is single-writer
  * (the marker create fails loudly if a concurrent fold wins the
  * generation). [[compact]] folds the delta dirs back into one base at
  * version N+1 (pure rewrite — nothing is re-signed) with a pointer
  * promote.
  *
  * Retention + time-travel (the [[graft.operators.BucketedSnapshot]]
  * discipline): [[build]] and [[compact]] keep the newest
  * `retainVersions` (default 2) version dirs and GC older ones — so a
  * reader that resolved the pointer to v(N) mid-scan survives a
  * concurrent compact's v(N+1) commit; [[pairsAgainst]] takes
  * `atVersion` to query a retained historical version, and [[versions]]
  * lists what is readable.
  *
  * Fold idempotency: at-least-once callers (streaming `foreachBatch`)
  * pass their batch identity as `generation` — a retry of an
  * ALREADY-COMMITTED generation becomes a pure replay (recompute the
  * pairs from the stored delta against the state below it; nothing is
  * re-written), so the same docs are never double-inserted even when
  * the failure happened after the marker PUT. Auto-numbered folds
  * (generation omitted) are safe against pre-marker crashes only.
  */
object DedupIndex {

  private def layoutDir(dir: String, name: String): String =
    s"$dir/$name.dedupindex"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  def currentVersion(
      spark: SparkSession, dir: String, name: String): Option[Int] =
    graft.io.VersionPointer.current(spark, layoutDir(dir, name))

  /** Committed versions still inside the retention window — the
    * time-travel targets [[pairsAgainst]]'s `atVersion` accepts.
    */
  def versions(
      spark: SparkSession, dir: String, name: String): Seq[Int] = {
    val cur = currentVersion(spark, dir, name)
    graft.io.VersionPointer.versionDirs(spark, layoutDir(dir, name))
      .filter(v => cur.exists(v <= _))
  }

  private def paramsPath(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/params"
  private def signPath(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/sign"
  private def foldsDir(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/_folds"
  private def deltaPath(dir: String, name: String, v: Int, g: Long): String =
    s"${layoutDir(dir, name)}/v$v/deltas/g$g"

  private val FoldMarkerRe = """g(\d+)\.ok""".r

  private def committedFolds(
      spark: SparkSession, dir: String, name: String, v: Int): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(foldsDir(dir, name, v))
    val f = fs(spark, p.toString)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.flatMap(_.getPath.getName match {
      case FoldMarkerRe(g) => Some(g.toLong)
      case _ => None
    }).sorted
  }

  private def requireVersion(
      spark: SparkSession, dir: String, name: String): Int =
    currentVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(
        s"dedup index '$name' at $dir does not exist — build() it first"))

  /** The frozen banding scheme: (k, numHashes, bandRows). */
  // r9: the banding scheme is FROZEN for an index version's lifetime (the
  // whole correctness argument) — memoize the one-row read so every fold /
  // pairsAgainst call on a long-lived index skips a head() job. Cache keys
  // are VERSION-QUALIFIED paths, so compact() needs no invalidation: it
  // writes v+1 with the same frozen params and v+1's first read populates
  // its own entry. build() invalidates because a REBUILD may change the
  // scheme at the new version before any read happens.
  private val paramsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int, Int)]()

  private def invalidateParams(dir: String, name: String): Unit = {
    // trailing separator: "<dir>/a.dedupindex" must not cross-invalidate a
    // sibling "<dir>/a.dedupindex2" whose layout dir it string-prefixes
    val prefix = layoutDir(dir, name) + "/"
    paramsCache.keySet.removeIf(_.startsWith(prefix))
    schemaCache.keySet.removeIf(_.startsWith(prefix))
    ()
  }

  private def readParams(
      spark: SparkSession, dir: String, name: String,
      v: Int): (Int, Int, Int) =
    paramsCache.computeIfAbsent(paramsPath(dir, name, v), { p =>
      val row = spark.read.parquet(p).head()
      (row.getAs[Int]("k"), row.getAs[Int]("num_hashes"),
        row.getAs[Int]("band_rows"))
    })

  // r10 (guide §1.2 — fixed costs): every schema-inferring
  // spark.read.parquet pays a footer-read job (~30 ms) plus its driver
  // round-trip; a fold used to run ~10 of them. Artifact schemas are
  // frozen per version (same sign exprs write base and every delta), so
  // memoize the base artifact's schema per version-qualified path and
  // hand it to every internal read — and read base + deltas as ONE
  // multi-path scan instead of a union of per-path reads (smaller plan,
  // single relation). Invalidated alongside the params memo.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def readStored(
      spark: SparkSession, schemaKey: String,
      paths: Seq[String]): DataFrame = {
    val sch = schemaCache.computeIfAbsent(
      schemaKey, p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(paths: _*)
  }

  /** (sets, bands) of `docs` under the index's scheme — the SAME fused
    * exprs and band transform as [[Dedup.minhashNearDupPairs]], so a
    * doc's buckets are identical whether signed at build or at any later
    * fold.
    */
  private def signAndBand(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      numHashes: Int, bandRows: Int): (DataFrame, DataFrame) = {
    val numBands = numHashes / bandRows
    // persisted (r9): sets and bands are materialized by SEPARATE write
    // actions at build/fold — without the cache the bands write re-runs
    // the whole fused shingle + minhash pass
    val sets = Dedup.withShingleHashSets(docs, idCol, textCol, k).persist()
    val bands = sets
      .select(col("doc_id"),
        expr(s"graft_minhash(hsh, $numHashes)").as("sig"))
      .select(
        col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, ${numBands - 1}), b -> concat_ws(':', " +
            s"transform(slice(sig, b * $bandRows + 1, $bandRows), " +
            "x -> CAST(x AS STRING))))"))
          .as(Seq("band", "bucket")))
    (sets, bands)
  }

  /** The two sign artifacts as ONE `__what`-partitioned frame — r10: a
    * batch's sets + bands commit in a SINGLE write action.
    */
  private def signedUnion(sets: DataFrame, bands: DataFrame): DataFrame =
    sets.select(lit("sets").as("__what"), col("doc_id"), col("hsh"),
        lit(null).cast("int").as("band"),
        lit(null).cast("string").as("bucket"))
      .unionByName(bands.select(lit("bands").as("__what"), col("doc_id"),
        lit(null).cast("array<bigint>").as("hsh"), col("band"),
        col("bucket")))

  private val whatCols = Map(
    "sets" -> Seq("doc_id", "hsh"),
    "bands" -> Seq("doc_id", "band", "bucket"))

  /** One artifact out of unified sign dirs. */
  private def readSigned(
      spark: SparkSession, dir: String, name: String, v: Int,
      signRoots: Seq[String], what: String): DataFrame = {
    val cols = whatCols(what)
    readStored(spark, s"${signPath(dir, name, v)}/__what=$what",
      signRoots.map(r => s"$r/__what=$what"))
      .select(cols.head, cols.tail: _*)
  }

  /** All committed sets / bands of version `v` (base + committed fold
    * deltas) — orphan delta dirs are invisible, the marker is the commit.
    * `belowGen` bounds the visible fold generations (exclusive): a fold
    * REPLAY reads exactly the state that preceded its own commit.
    */
  private def readCommitted(
      spark: SparkSession, dir: String, name: String, v: Int,
      sub: String, belowGen: Long = Long.MaxValue): DataFrame =
    readSigned(spark, dir, name, v,
      signPath(dir, name, v) +:
        committedFolds(spark, dir, name, v).filter(_ < belowGen)
          .map(g => s"${deltaPath(dir, name, v, g)}/sign"),
      sub)

  /** Sign + band + write (uncommitted) version `version` from `docs`,
    * dropping any orphan dir a failed predecessor left.
    */
  private def writeVersion(
      spark: SparkSession, sets: DataFrame, bands: DataFrame, dir: String,
      name: String, k: Int, numHashes: Int, bandRows: Int,
      version: Int): Unit = {
    graft.io.VersionPointer.dropDir(
      spark, s"${layoutDir(dir, name)}/v$version")
    import spark.implicits._
    Seq((k, numHashes, bandRows)).toDF("k", "num_hashes", "band_rows")
      .coalesce(1).write.mode("errorifexists")
      .parquet(paramsPath(dir, name, version))
    signedUnion(sets, bands).write.partitionBy("__what")
      .mode("errorifexists").parquet(signPath(dir, name, version))
  }

  /** Sign + index `corpus` as version 1 (or N+1 — a manual rebuild),
    * then apply the retention window (newest `retainVersions` version
    * dirs kept; an in-flight reader of the previous version keeps its
    * files at the default 2).
    */
  def build(
      spark: SparkSession, corpus: DataFrame, dir: String, name: String,
      idCol: String, textCol: String, k: Int = 3, numHashes: Int = 128,
      bandRows: Int = 2, retainVersions: Int = 2): Unit = {
    require(numHashes % bandRows == 0,
      s"numHashes ($numHashes) must be divisible by bandRows ($bandRows)")
    graft.functions.VectorExpressions.register(spark)
    invalidateParams(dir, name)
    val v = currentVersion(spark, dir, name).getOrElse(0) + 1
    val (sets, bands) =
      signAndBand(corpus, idCol, textCol, k, numHashes, bandRows)
    // the two writes are this operator's only actions over the cached
    // sign pass — release it afterwards (r10, advisor: operators that own
    // their action own the cleanup)
    try writeVersion(spark, sets, bands, dir, name, k, numHashes, bandRows, v)
    finally sets.unpersist()
    graft.io.VersionPointer.commit(spark, layoutDir(dir, name), v)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v, retainVersions)
  }

  /** The incremental pair algebra shared by [[fold]] and
    * [[pairsAgainst]]: candidates = fresh bands ⋈ (prior ∪ fresh) bands
    * (ids only, canonical unordered form — fresh×fresh pairs meet twice
    * and collapse), verified with the exact integer Jaccard via the
    * family's exploded-hash overlap join.
    */
  private def pairsOf(
      setsI: DataFrame, bandsI: DataFrame, priorSets: DataFrame,
      priorBands: DataFrame, thresholdNum: Int,
      thresholdDen: Int): DataFrame = {
    val cands = bandsI.select(col("doc_id").as("id_n"),
        col("band"), col("bucket"))
      .join(priorBands.unionByName(bandsI)
        .select(col("doc_id").as("id_o"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_n") =!= col("id_o"))
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    Dedup.withOverlapExploded(cands, priorSets.unionByName(setsI))
      .filter(col("inter_size") * thresholdDen >=
        col("union_size") * thresholdNum)
  }

  /** READ-ONLY preview of an ingest batch against the index: every
    * qualifying near-dup pair involving ≥ 1 `fresh` doc, under the
    * index's frozen banding scheme — nothing is written or committed
    * (the admission check a pipeline runs before deciding what to keep;
    * [[fold]] is the committing form). The fresh side is signed once and
    * lineage-cut so the candidate and verify legs can't re-shingle it.
    * `atVersion` time-travels to a retained historical version (its
    * committed folds included) — auditing what an admission decision
    * WOULD have been against last week's corpus.
    */
  def pairsAgainst(
      spark: SparkSession, fresh: DataFrame, dir: String, name: String,
      idCol: String, textCol: String, thresholdNum: Int = 7,
      thresholdDen: Int = 10, atVersion: Option[Int] = None): DataFrame = {
    val v = graft.io.VersionPointer.resolveRead(
      spark, layoutDir(dir, name), atVersion, s"dedup index '$name' at $dir")
    graft.functions.VectorExpressions.register(spark)
    val (k, numHashes, bandRows) = readParams(spark, dir, name, v)
    val (setsI0, bandsI0) =
      signAndBand(fresh, idCol, textCol, k, numHashes, bandRows)
    val setsI = setsI0.localCheckpoint()
    val bandsI = bandsI0.localCheckpoint()
    // both checkpoints are materialized — the sign-pass cache has no
    // consumers left (the returned plan reads the checkpoints)
    setsI0.unpersist()
    pairsOf(setsI, bandsI,
      readCommitted(spark, dir, name, v, "sets"),
      readCommitted(spark, dir, name, v, "bands"),
      thresholdNum, thresholdDen)
  }

  /** Every qualifying near-dup pair WITHIN the indexed corpus itself —
    * computed entirely from the stored (sets, bands) artifacts, nothing
    * re-shingled: the audit entry for "what duplication does the index
    * already hold" (and the seed-pair source for a maintained
    * [[ClusterIndex]] — q330 uses it so the pipeline signs each document
    * exactly once, at build/fold time). Same candidate/verify algebra as
    * the fold path; `atVersion` time-travels.
    */
  def pairsWithin(
      spark: SparkSession, dir: String, name: String,
      thresholdNum: Int = 7, thresholdDen: Int = 10,
      atVersion: Option[Int] = None): DataFrame = {
    val v = graft.io.VersionPointer.resolveRead(
      spark, layoutDir(dir, name), atVersion, s"dedup index '$name' at $dir")
    graft.functions.VectorExpressions.register(spark)
    val sets = readCommitted(spark, dir, name, v, "sets")
    val bands = readCommitted(spark, dir, name, v, "bands")
    val cands = bands.select(col("doc_id").as("id_n"),
        col("band"), col("bucket"))
      .join(bands.select(col("doc_id").as("id_o"), col("band"),
        col("bucket")), Seq("band", "bucket"))
      .filter(col("id_n") < col("id_o"))
      .select(col("id_n").as("id_a"), col("id_o").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    Dedup.withOverlapExploded(cands, sets)
      .filter(col("inter_size") * thresholdDen >=
        col("union_size") * thresholdNum)
  }

  /** Fold an ingest batch: sign ONLY `fresh`, return every qualifying
    * near-dup pair involving ≥ 1 fresh doc (verified with the exact
    * integer Jaccard at `thresholdNum/thresholdDen`), and commit the
    * fresh (sets, bands) delta so later batches join against it. The
    * returned frame is computed from the delta just written plus the
    * PREVIOUSLY committed state — stable against concurrent readers.
    * Pairs where BOTH sides are fresh appear once (canonical unordered
    * form).
    *
    * `generation` is the caller's batch identity (a streaming batchId):
    * when the named generation is ALREADY COMMITTED, the call is a pure
    * replay — the stored delta's pairs against the state below it are
    * recomputed and returned, nothing is written — so an at-least-once
    * caller retrying after a post-commit failure never double-inserts.
    * Omitted, the generation auto-increments (safe against pre-marker
    * crashes only; at-least-once callers must pass their identity).
    */
  def fold(
      spark: SparkSession, fresh: DataFrame, dir: String, name: String,
      idCol: String, textCol: String, thresholdNum: Int = 7,
      thresholdDen: Int = 10, generation: Option[Long] = None): DataFrame = {
    val v = requireVersion(spark, dir, name)
    graft.functions.VectorExpressions.register(spark)
    val (k, numHashes, bandRows) = readParams(spark, dir, name, v)
    val committed = committedFolds(spark, dir, name, v)
    val g = generation.getOrElse(committed.lastOption.getOrElse(0L) + 1L)
    if (committed.contains(g)) {
      // replay of a committed generation: the delta is immutable (an
      // at-least-once source redelivers the same batch), so recompute
      // its pairs against exactly the state that preceded it
      val setsW = readSigned(spark, dir, name, v,
        Seq(s"${deltaPath(dir, name, v, g)}/sign"), "sets")
      val bandsW = readSigned(spark, dir, name, v,
        Seq(s"${deltaPath(dir, name, v, g)}/sign"), "bands")
      return pairsOf(setsW, bandsW,
        readCommitted(spark, dir, name, v, "sets", belowGen = g),
        readCommitted(spark, dir, name, v, "bands", belowGen = g),
        thresholdNum, thresholdDen)
    }
    require(committed.forall(_ < g),
      s"fold generation $g is below already-committed generations " +
        s"${committed.filter(_ > g).mkString(", ")} — out-of-order " +
        "batch identities would make replay state ambiguous")
    // committed state BEFORE this fold — the join targets
    val priorSets = readCommitted(spark, dir, name, v, "sets")
    val priorBands = readCommitted(spark, dir, name, v, "bands")
    val (setsI, bandsI) =
      signAndBand(fresh, idCol, textCol, k, numHashes, bandRows)
    // overwrite mode: a retry of a crashed fold recomputes the same
    // generation and replaces the orphan before committing. r10: both
    // artifacts commit in ONE __what-partitioned write (one job instead
    // of two); it is the sign-pass cache's only consumer — release it
    // afterwards (advisor).
    try signedUnion(setsI, bandsI).write.partitionBy("__what")
      .mode("overwrite").parquet(s"${deltaPath(dir, name, v, g)}/sign")
    finally setsI.unpersist()
    val marker = new org.apache.hadoop.fs.Path(
      s"${foldsDir(dir, name, v)}/g$g.ok")
    val f = fs(spark, marker.toString)
    val out = f.create(marker, false)
    try out.write("ok".getBytes("UTF-8")) finally out.close()
    // pairs off the JUST-WRITTEN delta (read back — not the lineage of
    // the input frame, so the verify never re-signs fresh docs) against
    // prior committed state
    val setsW = readSigned(spark, dir, name, v,
      Seq(s"${deltaPath(dir, name, v, g)}/sign"), "sets")
    val bandsW = readSigned(spark, dir, name, v,
      Seq(s"${deltaPath(dir, name, v, g)}/sign"), "bands")
    pairsOf(setsW, bandsW, priorSets, priorBands,
      thresholdNum, thresholdDen)
  }

  /** Compact the delta dirs back into one base at version N+1 — a pure
    * rewrite of already-signed rows (nothing re-shingles), pointer
    * promote, then the retention window (newest `retainVersions` version
    * dirs kept — the just-compacted v(N) survives at the default 2, so a
    * reader that resolved the pointer to it mid-scan still has its
    * parquet). The amortized cleanup once fold deltas accumulate (the
    * MOR compaction tradeoff).
    */
  def compact(
      spark: SparkSession, dir: String, name: String,
      retainVersions: Int = 2): Unit = {
    val v = requireVersion(spark, dir, name)
    val (k, numHashes, bandRows) = readParams(spark, dir, name, v)
    val sets = readCommitted(spark, dir, name, v, "sets")
    val bands = readCommitted(spark, dir, name, v, "bands")
    writeVersion(spark, sets, bands, dir, name, k, numHashes, bandRows, v + 1)
    graft.io.VersionPointer.commit(spark, layoutDir(dir, name), v + 1)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v + 1, retainVersions)
  }
}
