package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained IVF ANN index — the artifact form
  * of [[Similarity.ivfTopKLloyd]]. Training inside every query call
  * re-pays the quantizer fit per invocation; real pipelines train once,
  * then FOLD new vectors into the index as the corpus grows (FAISS's
  * train()/add() split). The index is two versioned artifacts under a
  * manifest pointer (the [[graft.operators.BucketedSnapshot]] commit
  * discipline — create-only manifest PUTs, `ok` terminator, newest-2
  * retention, no renames on the commit path, object-store safe):
  *
  *  - `v<N>/centroids`  — the trained coarse quantizer (numCentroids
  *    rows), FROZEN between retrains: a fold assigns new vectors
  *    against it without touching stored postings, so maintained cell
  *    membership is identical to a one-shot assignment of the whole
  *    corpus — maintained topK ≡ one-shot topK under the same
  *    quantizer, exactly (q271 adjudicates this; the assignment is the
  *    SHARED [[Similarity.assignCells]], so drift is impossible by
  *    construction).
  *  - `v<N>/postings`   — (id, vector) parquet PARTITIONED BY CELL: the
  *    inverted lists from the build/retrain. A query joins postings to
  *    its probed cells, so only probed partitions' files are read.
  *  - `v<N>/deltas/g<G>` — one cell-partitioned delta dir PER FOLD,
  *    committed by a create-only `v<N>/_folds/g<G>.ok` marker (single
  *    PUT). Readers union the base with COMMITTED deltas only, so a
  *    crash mid-fold leaves an invisible orphan dir — never a
  *    partially-visible delta — and the retry recomputes the same
  *    generation and overwrites the orphan before committing (no
  *    double-insert). Fold IO stays delta-sized (AnnIndexSpec proves a
  *    fold plans no scan of stored postings by deleting them first).
  *
  * Contract: fold ids must be NEW (an ANN corpus is append-only; updates
  * are a retrain concern), and the index is single-writer (the foldMor
  * contract). [[retrain]] re-trains the quantizer over the accumulated
  * corpus (base + committed deltas) into version N+1 with a pointer
  * promote — the amortized rewrite that also compacts the delta dirs
  * back to one base, exactly the MOR compaction tradeoff.
  *
  * Retention + time-travel (the [[graft.operators.BucketedSnapshot]]
  * discipline): every version-producing entry ([[build]], [[retrain]],
  * [[buildPq]], [[retrainPq]]) keeps the newest `retainVersions`
  * (default 2) version dirs and GCs older ones, so a reader that
  * resolved the pointer to v(N) mid-scan survives a concurrent commit
  * of v(N+1); [[topK]]/[[topKPq]]/[[centroids]] take `atVersion` to
  * query a retained historical version, and [[versions]] lists what is
  * readable.
  *
  * Scale shape: build/fold cost is the assignment broadcast join (cent
  * is numCentroids rows) + a partitioned write of the delta; queries
  * broadcast (queries × probes) cell rows against a partition-pruned
  * postings scan and re-rank exactly inside probed cells only.
  */
object AnnIndex {

  private def layoutDir(dir: String, name: String): String =
    s"$dir/$name.annindex"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Newest committed version, if the index exists — the shared
    * [[graft.io.VersionPointer]] contract: `<version> ok` records,
    * create-only PUTs, torn manifests skipped, present-but-unreadable
    * pointers fail loudly.
    */
  def currentVersion(
      spark: SparkSession, dir: String, name: String): Option[Int] =
    graft.io.VersionPointer.current(spark, layoutDir(dir, name))

  /** Committed versions still inside the retention window — the
    * time-travel targets the readers' `atVersion` accepts.
    */
  def versions(
      spark: SparkSession, dir: String, name: String): Seq[Int] = {
    val cur = currentVersion(spark, dir, name)
    graft.io.VersionPointer.versionDirs(spark, layoutDir(dir, name))
      .filter(v => cur.exists(v <= _))
  }

  private def resolveRead(
      spark: SparkSession, dir: String, name: String,
      atVersion: Option[Int]): Int =
    graft.io.VersionPointer.resolveRead(spark, layoutDir(dir, name),
      atVersion, s"ann index '$name' at $dir")

  private def commitVersion(
      spark: SparkSession, dir: String, name: String, version: Int): Unit =
    graft.io.VersionPointer.commit(spark, layoutDir(dir, name), version)

  private def centroidsPath(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/centroids"

  // r10: memoized per-version artifact schemas — see DedupIndex.readStored
  // (schema-inferring reads each pay a footer job; artifact schemas are
  // frozen per version). Invalidated per version dir on writeVersion's
  // orphan drop (a rebuild of the same version number may change types).
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def readStored(
      spark: SparkSession, schemaKey: String, path: String): DataFrame = {
    val sch = schemaCache.computeIfAbsent(
      schemaKey, p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(path)
  }

  private def invalidateSchemas(
      dir: String, name: String, v: Int): Unit = {
    val prefix = s"${layoutDir(dir, name)}/v$v/"
    schemaCache.keySet.removeIf(_.startsWith(prefix))
    ()
  }

  private def postingsPath(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/postings"

  /** The frozen quantizer of the current (or a retained historical)
    * version.
    */
  def centroids(
      spark: SparkSession, dir: String, name: String,
      atVersion: Option[Int] = None): DataFrame = {
    val v = resolveRead(spark, dir, name, atVersion)
    readStored(spark, centroidsPath(dir, name, v),
      centroidsPath(dir, name, v))
  }

  private def writeVersion(
      spark: SparkSession, corpus: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String, numCentroids: Int, dim: Int,
      version: Int): Unit = {
    // `version` is by construction uncommitted (callers pass
    // currentVersion+1): drop any orphan dir a failed predecessor left,
    // or its errorifexists writes below would fail permanently until
    // someone hand-deleted the orphan
    dropVersionDir(spark, dir, name, version)
    invalidateSchemas(dir, name, version)
    // lloydCentroids' seed assignment uses the fused graft_ivf_cells —
    // register here so a fresh session can build without having run an
    // ivfTopK* query first
    graft.functions.VectorExpressions.register(spark)
    graft.functions.HyperplaneExpressions.register(spark)
    val cent = Similarity.lloydCentroids(
      corpus, idCol, vecCol, numCentroids, dim)
    cent.coalesce(1).write.mode("errorifexists")
      .parquet(centroidsPath(dir, name, version))
    val frozen = readStored(spark, centroidsPath(dir, name, version),
      centroidsPath(dir, name, version))
    Similarity.assignCells(corpus, idCol, vecCol, frozen, probes = 1)
      .select(col(idCol), col(vecCol), col("__cell").as("cell"))
      .write.mode("errorifexists").partitionBy("cell")
      .parquet(postingsPath(dir, name, version))
  }

  /** Train + write version 1 (or N+1 over an existing index — a manual
    * retrain entry). The quantizer is trained on THIS corpus and frozen;
    * later [[fold]]s extend the postings under it.
    */
  def build(
      spark: SparkSession, corpus: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String, numCentroids: Int = 16,
      dim: Int = 64, retainVersions: Int = 2): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(0) + 1
    writeVersion(spark, corpus, dir, name, idCol, vecCol, numCentroids,
      dim, v)
    commitVersion(spark, dir, name, v)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v, retainVersions)
  }

  /** GC one version dir through the Hadoop FS API (the
    * BucketedSnapshot.dropVersion pattern) — a java.io.File delete is a
    * silent no-op on any non-local or scheme-qualified filesystem and
    * would leak every superseded version's centroids + postings.
    */
  private def dropVersionDir(
      spark: SparkSession, dir: String, name: String, v: Int): Unit =
    graft.io.VersionPointer.dropDir(spark, s"${layoutDir(dir, name)}/v$v")

  private def foldsDir(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/_folds"

  private def deltaPath(dir: String, name: String, v: Int, g: Long): String =
    s"${layoutDir(dir, name)}/v$v/deltas/g$g"

  private val FoldMarkerRe = """g(\d+)\.ok""".r

  /** Generations with a committed fold marker in this version. */
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

  /** All committed postings of version `v`: the base plus every
    * committed fold delta. Uncommitted (orphan) delta dirs are invisible
    * — the marker is the commit. Each root is read on its own (they are
    * sibling partitioned layouts, which a single multi-path read rejects
    * as conflicting directory structures) and unioned by name; the cell
    * partition column prunes per branch exactly as it does on one root.
    */
  private def readPostings(
      spark: SparkSession, dir: String, name: String, v: Int): DataFrame =
    (postingsPath(dir, name, v) +:
      committedFolds(spark, dir, name, v).map(deltaPath(dir, name, v, _)))
      .map(readStored(spark, postingsPath(dir, name, v), _))
      .reduce(_.unionByName(_))

  /** Fold new vectors into the current version: assign against the
    * FROZEN centroids (numCentroids-row broadcast — stored postings are
    * never read, the IO is delta-sized), write them as this fold's OWN
    * cell-partitioned delta dir, then commit it with one create-only
    * marker PUT. A crash before the marker leaves an orphan dir no
    * reader sees; the retry recomputes the same generation, overwrites
    * the orphan, and commits — idempotent, never double-inserted. Ids
    * must be new to the index; writers are single (the marker create
    * fails loudly if a concurrent fold won the generation).
    *
    * `generation` is the caller's batch identity (a streaming batchId):
    * a retry of an ALREADY-COMMITTED generation is a no-op, so an
    * at-least-once `foreachBatch` caller never double-inserts its
    * postings even when the failure happened AFTER the marker PUT.
    * Omitted, the generation auto-increments (safe against pre-marker
    * crashes only).
    */
  def fold(
      spark: SparkSession, fresh: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String,
      generation: Option[Long] = None): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(
        s"ann index '$name' at $dir does not exist — build() it first"))
    require(!hasCodebooks(spark, dir, name, v),
      s"ann index '$name' at $dir is a PQ index — fold() would leave its " +
        "code postings stale; use foldPq()")
    val cent = readStored(spark, centroidsPath(dir, name, v),
      centroidsPath(dir, name, v))
    val committed = committedFolds(spark, dir, name, v)
    val g = generation.getOrElse(committed.lastOption.getOrElse(0L) + 1L)
    if (committed.contains(g)) return // committed replay: pure no-op
    require(committed.forall(_ < g),
      s"fold generation $g is below already-committed generations " +
        s"${committed.filter(_ > g).mkString(", ")} — out-of-order " +
        "batch identities would make the replay no-op ambiguous")
    Similarity.assignCells(fresh, idCol, vecCol, cent, probes = 1)
      .select(col(idCol), col(vecCol), col("__cell").as("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(deltaPath(dir, name, v, g))
    val marker = new org.apache.hadoop.fs.Path(
      s"${foldsDir(dir, name, v)}/g$g.ok")
    val f = fs(spark, marker.toString)
    val out = f.create(marker, false)
    try out.write("ok".getBytes("UTF-8")) finally out.close()
    ()
  }

  /** Re-train the quantizer over the accumulated corpus into version
    * N+1, promote the pointer, apply the retention window (v(N)
    * survives at the default `retainVersions` = 2, so in-flight readers
    * keep their files) — the amortized rewrite that keeps cells adapted
    * as folds shift the distribution.
    */
  def retrain(
      spark: SparkSession, dir: String, name: String, idCol: String,
      vecCol: String, numCentroids: Int = 16, dim: Int = 64,
      retainVersions: Int = 2): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(
        s"ann index '$name' at $dir does not exist — build() it first"))
    require(!hasCodebooks(spark, dir, name, v),
      s"ann index '$name' at $dir is a PQ index — retrain() would drop " +
        "its codebooks and codes; use retrainPq()")
    val corpus = readPostings(spark, dir, name, v)
      .select(col(idCol), col(vecCol))
      // materialize before the promote: the lazy plan reads version v,
      // which retainVersions = 1 GCs right after
      .localCheckpoint()
    writeVersion(spark, corpus, dir, name, idCol, vecCol, numCentroids,
      dim, v + 1)
    commitVersion(spark, dir, name, v + 1)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v + 1, retainVersions)
  }

  // ---- persisted IVF-PQ: codebooks + packed code postings ----------------

  private def codebooksPath(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/codebooks"

  private def codesPath(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/codes"

  private def codesDeltaPath(
      dir: String, name: String, v: Int, g: Long): String =
    s"${layoutDir(dir, name)}/v$v/codes_deltas/g$g"

  private def hasCodebooks(
      spark: SparkSession, dir: String, name: String, v: Int): Boolean = {
    val p = new org.apache.hadoop.fs.Path(codebooksPath(dir, name, v))
    fs(spark, p.toString).exists(p)
  }

  /** All committed code postings of version `v` (base + committed fold
    * deltas), UNPACKED to (cid, cell, m, cw) rows for the ADC join.
    */
  private def readCodes(
      spark: SparkSession, dir: String, name: String, v: Int,
      idCol: String): DataFrame =
    (codesPath(dir, name, v) +:
      committedFolds(spark, dir, name, v).map(codesDeltaPath(dir, name, v, _)))
      .map(readStored(spark, codesPath(dir, name, v), _))
      .reduce(_.unionByName(_))
      .select(col(idCol).as("cid"), col("cell"),
        posexplode(col("codes")).as(Seq("m", "cw")))

  /** Encode `df` against FROZEN centroids + codebooks into packed code
    * rows (id, codes: array<int> ordered by sub-space, cell) — the
    * 8-bytes-per-vector artifact at the default 8 sub-spaces. Shared by
    * [[buildPq]] and [[foldPq]]: the encode is
    * [[Similarity.pqResidualSubRows]] + the same argmin as the one-shot
    * [[Similarity.ivfPqTopK]], so maintained codes can never diverge
    * from a one-shot encode under the same artifacts.
    */
  private def encodePacked(
      df: DataFrame, idCol: String, vecCol: String, cent: DataFrame,
      cb: DataFrame, numSub: Int, subDim: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cid", "m").orderBy(col("d2u"), col("cw"))
    Similarity
      .pqResidualSubRows(df, idCol, vecCol, cent, 1, numSub, subDim, "cid")
      .join(broadcast(cb), "m")
      .withColumn("d2u", Similarity.pqD2u)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("cid"), col("cell"))
      .agg(expr("transform(sort_array(collect_list(struct(m, cw))), " +
        "t -> t.cw)").as("codes"))
      .select(col("cid").as(idCol), col("codes"), col("cell"))
  }

  /** Sub-space count and sub-vector width, derived from the persisted
    * codebooks artifact (two scalar aggregates over a
    * numSub×codebookSize-row table — metadata, not data).
    */
  private def codebookShape(cb: DataFrame): (Int, Int) = {
    val row = cb.agg(max("m"), max(size(col("cvec")))).head()
    (row.getInt(0) + 1, row.getInt(1))
  }

  /** Train + write an IVF-PQ version: the plain-IVF artifacts (frozen
    * Lloyd quantizer + cell-partitioned float postings, so [[topK]]'s
    * exact re-rank works unchanged) PLUS residual PQ codebooks (frozen
    * between retrains, trained with the one-shot's md5 seed + one
    * fixed-point k-means step) and packed code postings. [[topKPq]]
    * ADC-scans the codes — at 100 TB the codes table is what fits in
    * memory (8 bytes/vector at the defaults) while the float postings
    * ride on disk for the candidates-sized exact re-rank.
    */
  def buildPq(
      spark: SparkSession, corpus: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String, numCentroids: Int = 16,
      dim: Int = 64, numSub: Int = 8, codebookSize: Int = 16,
      retainVersions: Int = 2): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(0) + 1
    buildPqAt(spark, corpus, dir, name, idCol, vecCol, numCentroids, dim,
      numSub, codebookSize, v)
    commitVersion(spark, dir, name, v)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v, retainVersions)
  }

  /** Writes (uncommitted) PQ version `version`: IVF artifacts via
    * [[writeVersion]] (which first drops any orphan dir), then the
    * frozen-seed codebooks and the packed code postings.
    */
  private def buildPqAt(
      spark: SparkSession, corpus: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String, numCentroids: Int, dim: Int,
      numSub: Int, codebookSize: Int, version: Int): Unit = {
    require(dim % numSub == 0,
      s"buildPq: dim $dim not divisible by numSub $numSub")
    val subDim = dim / numSub
    writeVersion(spark, corpus, dir, name, idCol, vecCol, numCentroids,
      dim, version)
    val cent = readStored(spark, centroidsPath(dir, name, version),
      centroidsPath(dir, name, version))
    val cSub = Similarity.pqResidualSubRows(
      corpus, idCol, vecCol, cent, 1, numSub, subDim, "cid")
    val seed = {
      import spark.implicits._
      Similarity.pqCodebook(numSub, codebookSize, subDim, tag = "ivfpq")
        .toDF("m", "cw", "cvec")
    }
    Similarity.pqTrainCore(cSub.select("cid", "m", "sub"), seed, subDim)
      .coalesce(1).write.mode("errorifexists")
      .parquet(codebooksPath(dir, name, version))
    val cb = readStored(spark, codebooksPath(dir, name, version),
      codebooksPath(dir, name, version))
    encodePacked(corpus, idCol, vecCol, cent, cb, numSub, subDim)
      .write.mode("errorifexists").partitionBy("cell")
      .parquet(codesPath(dir, name, version))
  }

  /** Fold new vectors into a PQ index: assign + encode against the
    * FROZEN centroids and codebooks (two tiny broadcasts — stored
    * postings and codes are never read), write the float delta AND the
    * code delta, then commit BOTH with the one marker PUT — a crash
    * leaves both invisible, never a codes/postings split-brain.
    */
  def foldPq(
      spark: SparkSession, fresh: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String,
      generation: Option[Long] = None): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(
        s"ann index '$name' at $dir does not exist — build() it first"))
    require(hasCodebooks(spark, dir, name, v),
      s"ann index '$name' at $dir has no PQ codebooks — buildPq() it, " +
        "or use fold() for a plain IVF index")
    val cent = readStored(spark, centroidsPath(dir, name, v),
      centroidsPath(dir, name, v))
    val cb = readStored(spark, codebooksPath(dir, name, v),
      codebooksPath(dir, name, v))
    val (numSub, subDim) = codebookShape(cb)
    val committed = committedFolds(spark, dir, name, v)
    val g = generation.getOrElse(committed.lastOption.getOrElse(0L) + 1L)
    if (committed.contains(g)) return // committed replay: pure no-op
    require(committed.forall(_ < g),
      s"foldPq generation $g is below already-committed generations " +
        s"${committed.filter(_ > g).mkString(", ")} — out-of-order " +
        "batch identities would make the replay no-op ambiguous")
    Similarity.assignCells(fresh, idCol, vecCol, cent, probes = 1)
      .select(col(idCol), col(vecCol), col("__cell").as("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(deltaPath(dir, name, v, g))
    encodePacked(fresh, idCol, vecCol, cent, cb, numSub, subDim)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(codesDeltaPath(dir, name, v, g))
    val marker = new org.apache.hadoop.fs.Path(
      s"${foldsDir(dir, name, v)}/g$g.ok")
    val f = fs(spark, marker.toString)
    val out = f.create(marker, false)
    try out.write("ok".getBytes("UTF-8")) finally out.close()
    ()
  }

  /** Re-train quantizer AND codebooks over the accumulated corpus into
    * version N+1 (pointer promote, GC N) — also the compaction that
    * folds the delta dirs back into one base.
    */
  def retrainPq(
      spark: SparkSession, dir: String, name: String, idCol: String,
      vecCol: String, numCentroids: Int = 16, dim: Int = 64,
      numSub: Int = 8, codebookSize: Int = 16,
      retainVersions: Int = 2): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(
        s"ann index '$name' at $dir does not exist — build() it first"))
    val corpus = readPostings(spark, dir, name, v)
      .select(col(idCol), col(vecCol))
    // materialize before the destination version is written: the plan
    // reads version v, which retainVersions = 1 GCs after the promote
    val staged = corpus.localCheckpoint()
    buildPqAt(spark, staged, dir, name, idCol, vecCol, numCentroids, dim,
      numSub, codebookSize, v + 1)
    commitVersion(spark, dir, name, v + 1)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v + 1, retainVersions)
  }

  /** ADC top-k against the persisted PQ index: queries price per-probe
    * distance tables against the FROZEN codebooks (broadcast), the
    * packed code postings are scanned cell-pruned and summed to integer
    * ADC distances, the best `candidates` ids per query are re-ranked
    * exactly against the float postings. Same output contract as
    * [[Similarity.ivfPqTopK]]: (query_id, rank, neighbor_id, cos_sim) —
    * and bit-identical to it when the index holds the same corpus the
    * one-shot trained on (AnnIndexSpec pins this).
    */
  def topKPq(
      spark: SparkSession, queries: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String, k: Int, numProbes: Int = 2,
      candidates: Int = 50, atVersion: Option[Int] = None): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val v = resolveRead(spark, dir, name, atVersion)
    require(hasCodebooks(spark, dir, name, v),
      s"ann index '$name' at $dir has no PQ codebooks — buildPq() it, " +
        "or use topK() for a plain IVF index")
    val cent = readStored(spark, centroidsPath(dir, name, v),
      centroidsPath(dir, name, v))
    val cb = readStored(spark, codebooksPath(dir, name, v),
      codebooksPath(dir, name, v))
    val (numSub, subDim) = codebookShape(cb)
    val qt = Similarity
      .pqResidualSubRows(queries, idCol, vecCol, cent, numProbes, numSub,
        subDim, "qid")
      .join(broadcast(cb), "m")
      .withColumn("qd2u", Similarity.pqD2u)
      .select(col("qid"), col("cell").as("qcell"), col("m").as("qm"),
        col("cw").as("qcw"), col("qd2u"))
    val wCand = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("ad2u"), col("cid"))
    val cand = readCodes(spark, dir, name, v, idCol)
      .join(broadcast(qt),
        col("cell") === col("qcell") && col("m") === col("qm") &&
          col("cw") === col("qcw"))
      .filter(col("cid") =!= col("qid"))
      .groupBy("qid", "cid")
      .agg(sum("qd2u").as("ad2u"))
      .withColumn("crk", row_number().over(wCand))
      .filter(col("crk") <= candidates)
      .select(col("qid"), col("cid"))
    val c = readPostings(spark, dir, name, v)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"),
        Similarity.selfNormFast(vecCol).as("n_c"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("v_q"), Similarity.selfNormFast(vecCol).as("n_q"))
    val scored = cand
      .join(c, col("cid") === col("neighbor_id"))
      .join(broadcast(q), col("qid") === col("query_id"))
      .withColumn("cosine",
        Similarity.dotFast("v_q", "v_c") / (col("n_q") * col("n_c")))
    Similarity.topK(scored, k)
  }

  /** Probe + exact re-rank against the persisted index: queries assign
    * to their `numProbes` nearest frozen centroids (broadcast), postings
    * join on the PARTITION column `cell` (only probed partitions' files
    * matter — the scan is cell-pruned), cosines re-rank exactly inside.
    * Same output contract as [[Similarity.ivfTopKLloyd]]:
    * (query_id, rank, neighbor_id, cos_sim).
    */
  def topK(
      spark: SparkSession, queries: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String, k: Int,
      numProbes: Int = 2, atVersion: Option[Int] = None): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val v = resolveRead(spark, dir, name, atVersion)
    val cent = readStored(spark, centroidsPath(dir, name, v),
      centroidsPath(dir, name, v))
    val q = Similarity.assignCells(queries, idCol, vecCol, cent, numProbes)
      .select(col(idCol).as("query_id"), col(vecCol).as("v_q"),
        Similarity.selfNormFast(vecCol).as("n_q"),
        col("__cell").as("cell"))
    val c = readPostings(spark, dir, name, v)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"),
        Similarity.selfNormFast(vecCol).as("n_c"), col("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        Similarity.dotFast("v_q", "v_c") / (col("n_q") * col("n_c")))
    Similarity.topK(scored, k)
  }
}
