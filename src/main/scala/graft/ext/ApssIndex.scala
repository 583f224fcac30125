package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained EXACT all-pairs-similarity index —
  * the artifact form of [[Dedup.apssCosinePairs]] (Bayardo, Ma & Srikant
  * 2007), the way [[DedupIndex]] is the artifact form of the MinHash
  * family. MinHash trades recall for speed; this is the
  * guaranteed-recall side: a daily ingest folds its batch against the
  * stored corpus and gets EVERY pair at cosine ≥ threshold, adjudicable
  * against the brute definition. Same commit discipline as its siblings
  * (shared [[graft.io.VersionPointer]]: create-only manifest PUTs, `ok`
  * terminator, marker-gated fold deltas, retention window + time-travel,
  * idempotent caller-supplied fold generations).
  *
  * Layout, one version dir per build/compact:
  *  - `v<N>/params`  — one row (k, floor_permil): the shingle length and
  *    the THRESHOLD FLOOR, frozen for the index's lifetime. Prefixes are
  *    stored at the floor, so any fold/query at threshold ≥ floor is
  *    lossless by monotonicity (the [[Dedup.apssCosineCurve]] argument);
  *    below-floor queries are refused loudly.
  *  - `v<N>/dforder` — (h, df): each shingle hash's document frequency
  *    in the BUILD corpus — the FROZEN global total order (df asc, h
  *    asc; hashes unseen at build order at df 0). The prefix-filter
  *    proof needs one total order shared by every side of every
  *    candidate join, and ANY total order is sound — df-asc is only the
  *    performance heuristic (rarest-first prefixes) — so freezing it at
  *    build keeps every later fold's prefixes join-compatible with the
  *    stored ones without re-signing anything. [[compact]]/a rebuild
  *    re-derives it when drift erodes the heuristic.
  *  - `v<N>/sign` — the three sign artifacts as one `__what`-partitioned
  *    table (r10: a batch commits in ONE write action; readers address
  *    the partition subdirs directly so each artifact scans only its own
  *    files): `__what=tokens` (doc_id, h) full distinct shingle-hash
  *    rows — the exact-verification side; `__what=sizes` (doc_id, n)
  *    distinct-set sizes; `__what=prefix` (doc_id, h) each doc's first
  *    `n − o + 1` hashes under the frozen order
  *    (`o = ceil(floor² · n / 10⁶)`) — the candidate-join side.
  *  - `v<N>/deltas/g<G>/sign` — one unified delta PER FOLD, committed by
  *    a create-only `v<N>/_folds/g<G>.ok` marker.
  *
  * [[fold]] signs ONLY the fresh batch (write IO is delta-sized), joins
  * fresh prefixes against stored ∪ fresh prefixes (ids-only equi-join on
  * the hash — fanout bounded by rare-shingle df exactly as in the
  * one-shot), verifies candidates with exact integer overlap counts
  * against stored ∪ fresh tokens, returns the qualifying pairs (every
  * pair involves ≥ 1 fresh doc, bit-identical to the one-shot
  * [[Dedup.apssCosinePairs]] over the accumulated corpus restricted to
  * fresh involvement — q326 adjudicates), and commits the delta.
  *
  * Contract: fold ids must be NEW (append-only corpora; reprocessing is
  * a rebuild concern) and the index is single-writer. Reference for
  * semantics parity: the reference library has no similarity operators
  * (SURVEY §2.0) — this extends the LLM-pipeline surface.
  */
object ApssIndex {

  private def layoutDir(dir: String, name: String): String =
    s"$dir/$name.apssindex"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  def currentVersion(
      spark: SparkSession, dir: String, name: String): Option[Int] =
    graft.io.VersionPointer.current(spark, layoutDir(dir, name))

  /** Committed versions still inside the retention window. */
  def versions(
      spark: SparkSession, dir: String, name: String): Seq[Int] = {
    val cur = currentVersion(spark, dir, name)
    graft.io.VersionPointer.versionDirs(spark, layoutDir(dir, name))
      .filter(v => cur.exists(v <= _))
  }

  private def sub(dir: String, name: String, v: Int, s: String): String =
    s"${layoutDir(dir, name)}/v$v/$s"
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
        s"apss index '$name' at $dir does not exist — build() it first"))

  /** The frozen (k, floorPermil). */
  // r9: params are FROZEN for an index version's lifetime — memoize the
  // one-row read so folds skip a head() job (the DedupIndex discipline).
  // Keys are version-qualified paths, so compact() needs no invalidation
  // (v+1 keeps the frozen params and populates its own entry); build()
  // invalidates because a rebuild may change the scheme.
  private val paramsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()

  private[ext] def invalidateParams(dir: String, name: String): Unit = {
    // trailing separator: don't cross-invalidate a sibling index whose
    // layout dir this one string-prefixes
    val prefix = layoutDir(dir, name) + "/"
    paramsCache.keySet.removeIf(_.startsWith(prefix))
    schemaCache.keySet.removeIf(_.startsWith(prefix))
    ()
  }

  // r10: memoized per-version artifact schemas + multi-path reads — see
  // the DedupIndex.readStored note (schema-inferring reads each pay a
  // footer job; artifact schemas are frozen per version).
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def readStored(
      spark: SparkSession, schemaKey: String,
      paths: Seq[String]): DataFrame = {
    val sch = schemaCache.computeIfAbsent(
      schemaKey, p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(paths: _*)
  }

  private def readParams(
      spark: SparkSession, dir: String, name: String,
      v: Int): (Int, Int) =
    paramsCache.computeIfAbsent(sub(dir, name, v, "params"), { p =>
      val row = spark.read.parquet(p).head()
      (row.getAs[Int]("k"), row.getAs[Int]("floor_permil"))
    })

  /** (tokens, sizes, prefix) of `docs` under the index's frozen scheme —
    * the SAME fused shingle-hash expr as [[Dedup.apssCosinePairs]], the
    * prefix under the frozen df order at the frozen floor, so a doc's
    * prefix is identical whether signed at build or at any later fold.
    */
  private def signFrozen(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      floorPermil: Int,
      dforder: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val tf2 = floorPermil.toLong * floorPermil
    // persisted (r9): the three outputs are materialized by SEPARATE
    // write actions (tokens / sizes / prefix) — without the cache each
    // write re-runs the fused shingle pass. The 4th element of the
    // return is the hs cache handle so callers can unpersist both caches
    // once their actions have run (r10, advisor).
    val hs = Dedup.withShingleHashSets(docs, idCol, textCol, k).persist()
    val tokens = Dedup.shingleHashes(hs).persist()
    val sizes = hs.select(col("doc_id"), size(col("hsh")).cast("long").as("n"))
    val pos = tokens
      .join(dforder.withColumnRenamed("df", "__df"), Seq("h"), "left")
      .withColumn("__df0", coalesce(col("__df"), lit(0L)))
      .withColumn("__pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("__df0"), col("h"))))
    val prefix = pos.join(sizes, "doc_id")
      .withColumn("__o", expr(s"($tf2 * n + 999999) div 1000000"))
      .filter(col("__pos") <= col("n") - col("__o") + 1)
      .select("doc_id", "h")
    (tokens, sizes, prefix, hs)
  }

  /** The three sign artifacts as ONE `__what`-partitioned frame — r10:
    * a batch's tokens/sizes/prefix commit in a SINGLE write action (one
    * job + one commit instead of three); readers address the partition
    * subdirs directly (`.../sign/__what=tokens`), so each artifact still
    * scans only its own files.
    */
  private def signedUnion(
      tokens: DataFrame, sizes: DataFrame, prefix: DataFrame): DataFrame =
    tokens.select(lit("tokens").as("__what"), col("doc_id"),
        col("h"), lit(null).cast("long").as("n"))
      .unionByName(sizes.select(lit("sizes").as("__what"), col("doc_id"),
        lit(null).cast("long").as("h"), col("n")))
      .unionByName(prefix.select(lit("prefix").as("__what"), col("doc_id"),
        col("h"), lit(null).cast("long").as("n")))

  private val whatCols = Map(
    "tokens" -> Seq("doc_id", "h"),
    "sizes" -> Seq("doc_id", "n"),
    "prefix" -> Seq("doc_id", "h"))

  /** One artifact out of a unified sign dir (or several). */
  private def readSigned(
      spark: SparkSession, dir: String, name: String, v: Int,
      signRoots: Seq[String], what: String): DataFrame = {
    val cols = whatCols(what)
    readStored(spark, s"${sub(dir, name, v, "sign")}/__what=$what",
      signRoots.map(r => s"$r/__what=$what"))
      .select(cols.head, cols.tail: _*)
  }

  /** All committed rows of one artifact of version `v` (base + committed
    * fold deltas below `belowGen`) — orphans invisible, the marker is
    * the commit; a fold REPLAY reads exactly the state below itself.
    */
  private def readCommitted(
      spark: SparkSession, dir: String, name: String, v: Int,
      what: String, belowGen: Long = Long.MaxValue): DataFrame =
    readSigned(spark, dir, name, v,
      sub(dir, name, v, "sign") +:
        committedFolds(spark, dir, name, v).filter(_ < belowGen)
          .map(g => s"${deltaPath(dir, name, v, g)}/sign"),
      what)

  private def writeVersion(
      spark: SparkSession, tokens: DataFrame, sizes: DataFrame,
      prefix: DataFrame, dforder: DataFrame, dir: String, name: String,
      k: Int, floorPermil: Int, version: Int): Unit = {
    graft.io.VersionPointer.dropDir(
      spark, s"${layoutDir(dir, name)}/v$version")
    import spark.implicits._
    Seq((k, floorPermil)).toDF("k", "floor_permil")
      .coalesce(1).write.mode("errorifexists")
      .parquet(sub(dir, name, version, "params"))
    dforder.write.mode("errorifexists")
      .parquet(sub(dir, name, version, "dforder"))
    signedUnion(tokens, sizes, prefix)
      .write.partitionBy("__what").mode("errorifexists")
      .parquet(sub(dir, name, version, "sign"))
  }

  /** Sign + index `corpus` as version 1 (or N+1 — a manual rebuild),
    * deriving the frozen df order FROM this corpus, then apply the
    * retention window.
    */
  def build(
      spark: SparkSession, corpus: DataFrame, dir: String, name: String,
      idCol: String, textCol: String, floorPermil: Int = 500, k: Int = 3,
      retainVersions: Int = 2): Unit = {
    require(floorPermil >= 1 && floorPermil <= 1000,
      s"build: floorPermil must be in [1, 1000], got $floorPermil")
    invalidateParams(dir, name)
    val v = currentVersion(spark, dir, name).getOrElse(0) + 1
    val hs = Dedup.withShingleHashSets(corpus, idCol, textCol, k)
    val dforder = Dedup.shingleHashes(hs)
      .groupBy("h").agg(count(lit(1)).as("df"))
    // the order table feeds the prefix window AND persists: cut its
    // lineage so the window's sort doesn't recompute the df aggregation
    val frozen = dforder.localCheckpoint()
    val (tokens, sizes, prefix, hsCache) =
      signFrozen(corpus, idCol, textCol, k, floorPermil, frozen)
    // writeVersion's writes are the cached sign pass's only consumers —
    // release both caches afterwards (r10, advisor)
    try writeVersion(spark, tokens, sizes, prefix, frozen, dir, name, k,
      floorPermil, v)
    finally { tokens.unpersist(); hsCache.unpersist(); () }
    graft.io.VersionPointer.commit(spark, layoutDir(dir, name), v)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v, retainVersions)
  }

  /** The incremental pair algebra shared by [[fold]] and
    * [[pairsAgainst]]: candidates = fresh prefixes ⋈ (prior ∪ fresh)
    * prefixes on the hash (ids only, canonical unordered form —
    * fresh×fresh pairs meet twice and collapse), verified with exact
    * integer overlap counts off (prior ∪ fresh) tokens, thresholded by
    * the cross-multiplied integer test. Output = the q309 contract:
    * (doc_a, doc_b, overlap, n_a, n_b, cos_ppb).
    */
  private def pairsOf(
      freshTokens: DataFrame, freshSizes: DataFrame, freshPrefix: DataFrame,
      priorTokens: DataFrame, priorSizes: DataFrame, priorPrefix: DataFrame,
      thresholdPermil: Int): DataFrame = {
    val tpm2 = thresholdPermil.toLong * thresholdPermil
    val allPrefix = priorPrefix.unionByName(freshPrefix)
    val allTokens = priorTokens.unionByName(freshTokens)
    val allSizes = priorSizes.unionByName(freshSizes)
    val cand = freshPrefix.select(col("doc_id").as("id_n"), col("h"))
      .join(allPrefix.select(col("doc_id").as("id_o"), col("h")), "h")
      .filter(col("id_n") =!= col("id_o"))
      .select(least(col("id_n"), col("id_o")).as("doc_a"),
        greatest(col("id_n"), col("id_o")).as("doc_b"))
      .distinct()
    val ov = cand
      .join(allTokens.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
      .join(allTokens.select(col("doc_id").as("doc_b"), col("h")),
        Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("overlap"))
    ov
      .join(allSizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        "doc_a")
      .join(allSizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        "doc_b")
      .filter(col("overlap") * col("overlap") * 1000000L >=
        lit(tpm2) * col("n_a") * col("n_b"))
      .select(col("doc_a"), col("doc_b"), col("overlap"),
        col("n_a"), col("n_b"),
        floor(col("overlap").cast("double") * 1e9 /
          sqrt((col("n_a") * col("n_b")).cast("double")) + lit(0.5))
          .cast("long").as("cos_ppb"))
  }

  private def requireThreshold(
      thresholdPermil: Int, floorPermil: Int): Unit =
    require(thresholdPermil >= floorPermil && thresholdPermil <= 1000,
      s"thresholdPermil $thresholdPermil is below the index's frozen " +
        s"floor $floorPermil (stored prefixes are lossless only at or " +
        "above the floor) or above 1000 — rebuild with a lower floor " +
        "for looser joins")

  /** READ-ONLY preview: every qualifying pair at `thresholdPermil`
    * (≥ the frozen floor) involving ≥ 1 `fresh` doc, against the
    * committed corpus — nothing written. `atVersion` time-travels to a
    * retained historical version.
    */
  def pairsAgainst(
      spark: SparkSession, fresh: DataFrame, dir: String, name: String,
      idCol: String, textCol: String, thresholdPermil: Int,
      atVersion: Option[Int] = None): DataFrame = {
    val v = graft.io.VersionPointer.resolveRead(
      spark, layoutDir(dir, name), atVersion, s"apss index '$name' at $dir")
    val (k, floorPermil) = readParams(spark, dir, name, v)
    requireThreshold(thresholdPermil, floorPermil)
    val dfoBase = sub(dir, name, v, "dforder")
    val dforder = readStored(spark, dfoBase, Seq(dfoBase))
    val (t0, s0, p0, hsCache) =
      signFrozen(fresh, idCol, textCol, k, floorPermil, dforder)
    // sign once, lineage-cut: the candidate and verify legs must not
    // re-shingle the fresh side
    val (ti, si, pi) =
      (t0.localCheckpoint(), s0.localCheckpoint(), p0.localCheckpoint())
    // the checkpoints are materialized — the sign-pass caches have no
    // consumers left (the returned plan reads the checkpoints)
    t0.unpersist(); hsCache.unpersist()
    pairsOf(ti, si, pi,
      readCommitted(spark, dir, name, v, "tokens"),
      readCommitted(spark, dir, name, v, "sizes"),
      readCommitted(spark, dir, name, v, "prefix"),
      thresholdPermil)
  }

  /** Fold an ingest batch: sign ONLY `fresh` under the frozen scheme,
    * return every qualifying pair at `thresholdPermil` involving ≥ 1
    * fresh doc, and commit the fresh (tokens, sizes, prefix) delta so
    * later batches join against it. `generation` is the caller's batch
    * identity (streaming batchId): a retry of an ALREADY-COMMITTED
    * generation is a pure replay — recompute the stored delta's pairs
    * against the state below it, write nothing (the [[DedupIndex.fold]]
    * idempotency contract).
    */
  def fold(
      spark: SparkSession, fresh: DataFrame, dir: String, name: String,
      idCol: String, textCol: String, thresholdPermil: Int,
      generation: Option[Long] = None): DataFrame = {
    val v = requireVersion(spark, dir, name)
    val (k, floorPermil) = readParams(spark, dir, name, v)
    requireThreshold(thresholdPermil, floorPermil)
    val committed = committedFolds(spark, dir, name, v)
    val g = generation.getOrElse(committed.lastOption.getOrElse(0L) + 1L)
    def delta(what: String): DataFrame =
      readSigned(spark, dir, name, v,
        Seq(s"${deltaPath(dir, name, v, g)}/sign"), what)
    if (committed.contains(g)) {
      return pairsOf(delta("tokens"), delta("sizes"), delta("prefix"),
        readCommitted(spark, dir, name, v, "tokens", belowGen = g),
        readCommitted(spark, dir, name, v, "sizes", belowGen = g),
        readCommitted(spark, dir, name, v, "prefix", belowGen = g),
        thresholdPermil)
    }
    require(committed.forall(_ < g),
      s"fold generation $g is below already-committed generations " +
        s"${committed.filter(_ > g).mkString(", ")} — out-of-order " +
        "batch identities would make replay state ambiguous")
    val priorTokens = readCommitted(spark, dir, name, v, "tokens")
    val priorSizes = readCommitted(spark, dir, name, v, "sizes")
    val priorPrefix = readCommitted(spark, dir, name, v, "prefix")
    val dfoBase = sub(dir, name, v, "dforder")
    val dforder = readStored(spark, dfoBase, Seq(dfoBase))
    val (ti, si, pi, hsCache) =
      signFrozen(fresh, idCol, textCol, k, floorPermil, dforder)
    // overwrite: a retry of a PRE-marker crash replaces the orphan.
    // r10: the three artifacts commit in ONE `__what`-partitioned write
    // (one job instead of three); it is the sign-pass caches' only
    // consumer — release them afterwards (advisor).
    try signedUnion(ti, si, pi).write.partitionBy("__what")
      .mode("overwrite").parquet(s"${deltaPath(dir, name, v, g)}/sign")
    finally { ti.unpersist(); hsCache.unpersist(); () }
    val marker = new org.apache.hadoop.fs.Path(
      s"${foldsDir(dir, name, v)}/g$g.ok")
    val f = fs(spark, marker.toString)
    val out = f.create(marker, false)
    try out.write("ok".getBytes("UTF-8")) finally out.close()
    // pairs off the JUST-WRITTEN delta (read back, never re-signed)
    pairsOf(delta("tokens"), delta("sizes"), delta("prefix"),
      priorTokens, priorSizes, priorPrefix, thresholdPermil)
  }

  /** Re-derive the df order over the accumulated corpus and rewrite the
    * delta triples into one base at version N+1 (prefixes RE-CUT under
    * the new order — unlike [[DedupIndex.compact]] this is more than a
    * row move, because the order is what fold drift erodes), pointer
    * promote, retention window.
    */
  def compact(
      spark: SparkSession, dir: String, name: String,
      retainVersions: Int = 2): Unit = {
    val v = requireVersion(spark, dir, name)
    val (k, floorPermil) = readParams(spark, dir, name, v)
    val tokens = readCommitted(spark, dir, name, v, "tokens")
      .localCheckpoint()
    val sizes = readCommitted(spark, dir, name, v, "sizes")
      .localCheckpoint()
    val tf2 = floorPermil.toLong * floorPermil
    val dforder = tokens.groupBy("h").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val pos = tokens
      .join(dforder.withColumnRenamed("df", "__df"), Seq("h"), "left")
      .withColumn("__df0", coalesce(col("__df"), lit(0L)))
      .withColumn("__pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("__df0"), col("h"))))
    val prefix = pos.join(sizes, "doc_id")
      .withColumn("__o", expr(s"($tf2 * n + 999999) div 1000000"))
      .filter(col("__pos") <= col("n") - col("__o") + 1)
      .select("doc_id", "h")
    writeVersion(spark, tokens, sizes, prefix, dforder, dir, name, k,
      floorPermil, v + 1)
    graft.io.VersionPointer.commit(spark, layoutDir(dir, name), v + 1)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v + 1, retainVersions)
  }
}
