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
  *    inverted lists. A fold APPENDS its delta's files into the probed
  *    layout (delta-sized IO — AnnIndexSpec proves a fold plans no scan
  *    of stored postings by deleting them first); a query joins postings
  *    to its probed cells, so only probed partitions' files are read.
  *
  * Contract: fold ids must be NEW (an ANN corpus is append-only; updates
  * are a retrain concern). [[retrain]] re-trains the quantizer over the
  * accumulated corpus into version N+1 with a pointer promote and GC of
  * version N — the amortized rewrite, exactly the MOR compaction
  * tradeoff.
  *
  * Scale shape: build/fold cost is the assignment broadcast join (cent
  * is numCentroids rows) + a partitioned write of the delta; queries
  * broadcast (queries × probes) cell rows against a partition-pruned
  * postings scan and re-rank exactly inside probed cells only.
  */
object AnnIndex {

  private def layoutDir(dir: String, name: String): String =
    s"$dir/$name.annindex"

  private val ManifestRe = """_current\.(\d{9})""".r

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Newest committed version, if the index exists. Manifest records are
    * `<version> ok` — the terminator makes any torn write unparseable, so
    * readers fall back to the previous committed manifest; manifests
    * present but none parseable after retries fails loudly (a reader must
    * never mistake a present-but-unreadable pointer for "no index").
    */
  def currentVersion(
      spark: SparkSession, dir: String, name: String): Option[Int] = {
    val layout = layoutDir(dir, name)
    val dirPath = new org.apache.hadoop.fs.Path(layout)
    val f = fs(spark, layout)
    def parse(text: String): Option[Int] = {
      val parts = text.trim.split("\\s+")
      if (parts.length == 2 && parts(1) == "ok")
        scala.util.Try(parts(0).toInt).toOption
      else None
    }
    var attempt = 0
    while (attempt < 5) {
      if (!f.exists(dirPath)) return None
      val manifests = f.listStatus(dirPath).toSeq
        .flatMap(st => st.getPath.getName match {
          case ManifestRe(seq) => Some(seq.toLong -> st.getPath)
          case _ => None
        })
        .sortBy(-_._1)
      if (manifests.isEmpty) return None
      val resolved = manifests.view.flatMap { case (_, p) =>
        scala.util.Try {
          val in = f.open(p)
          try new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          finally in.close()
        }.toOption.flatMap(parse)
      }.headOption
      if (resolved.isDefined) return resolved
      attempt += 1
      if (attempt < 5) Thread.sleep(50L * attempt)
    }
    throw new IllegalStateException(
      s"ann index '$name' at $dir: pointer manifests exist but none " +
        "parsed after retries — refusing to treat a present-but-" +
        "unreadable pointer as an absent index")
  }

  /** Commit `version`: CREATE `_current.<maxSeq+1>` (single PUT), then
    * best-effort GC keeping the newest two manifests.
    */
  private def commitVersion(
      spark: SparkSession, dir: String, name: String, version: Int): Unit = {
    val layout = layoutDir(dir, name)
    val dirPath = new org.apache.hadoop.fs.Path(layout)
    val f = fs(spark, layout)
    val maxSeq =
      if (!f.exists(dirPath)) 0L
      else f.listStatus(dirPath).toSeq.flatMap(_.getPath.getName match {
        case ManifestRe(seq) => Some(seq.toLong)
        case _ => None
      }).foldLeft(0L)(math.max)
    val next = new org.apache.hadoop.fs.Path(
      f"$layout/_current.${maxSeq + 1}%09d")
    val out = f.create(next, false)
    try out.write(s"$version ok".getBytes("UTF-8")) finally out.close()
    f.listStatus(dirPath).toSeq
      .flatMap(st => st.getPath.getName match {
        case ManifestRe(seq) => Some(seq.toLong -> st.getPath)
        case _ => None
      })
      .sortBy(-_._1).drop(2)
      .foreach { case (_, p) => scala.util.Try(f.delete(p, false)); () }
  }

  private def centroidsPath(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/centroids"

  private def postingsPath(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/postings"

  /** The frozen quantizer of the current version. */
  def centroids(
      spark: SparkSession, dir: String, name: String): DataFrame = {
    val v = currentVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(
        s"ann index '$name' at $dir does not exist — build() it first"))
    spark.read.parquet(centroidsPath(dir, name, v))
  }

  private def writeVersion(
      spark: SparkSession, corpus: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String, numCentroids: Int, dim: Int,
      version: Int): Unit = {
    // lloydCentroids' seed assignment uses the fused graft_ivf_cells —
    // register here so a fresh session can build without having run an
    // ivfTopK* query first
    graft.functions.VectorExpressions.register(spark)
    graft.functions.HyperplaneExpressions.register(spark)
    val cent = Similarity.lloydCentroids(
      corpus, idCol, vecCol, numCentroids, dim)
    cent.coalesce(1).write.mode("errorifexists")
      .parquet(centroidsPath(dir, name, version))
    val frozen = spark.read.parquet(centroidsPath(dir, name, version))
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
      dim: Int = 64): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(0) + 1
    writeVersion(spark, corpus, dir, name, idCol, vecCol, numCentroids,
      dim, v)
    commitVersion(spark, dir, name, v)
    if (v > 1) dropVersionDir(spark, dir, name, v - 1)
    ()
  }

  /** GC one version dir through the Hadoop FS API (the
    * BucketedSnapshot.dropVersion pattern) — a java.io.File delete is a
    * silent no-op on any non-local or scheme-qualified filesystem and
    * would leak every superseded version's centroids + postings.
    */
  private def dropVersionDir(
      spark: SparkSession, dir: String, name: String, v: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"${layoutDir(dir, name)}/v$v")
    val f = fs(spark, p.toString)
    if (f.exists(p)) f.delete(p, true)
    ()
  }

  /** Fold new vectors into the current version: assign against the
    * FROZEN centroids (numCentroids-row broadcast — stored postings are
    * never read, the IO is delta-sized) and append into the partitioned
    * postings layout. Ids must be new to the index.
    */
  def fold(
      spark: SparkSession, fresh: DataFrame, dir: String, name: String,
      idCol: String, vecCol: String): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(
        s"ann index '$name' at $dir does not exist — build() it first"))
    val cent = spark.read.parquet(centroidsPath(dir, name, v))
    Similarity.assignCells(fresh, idCol, vecCol, cent, probes = 1)
      .select(col(idCol), col(vecCol), col("__cell").as("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(postingsPath(dir, name, v))
  }

  /** Re-train the quantizer over the accumulated corpus into version
    * N+1, promote the pointer, GC version N — the amortized rewrite
    * that keeps cells adapted as folds shift the distribution.
    */
  def retrain(
      spark: SparkSession, dir: String, name: String, idCol: String,
      vecCol: String, numCentroids: Int = 16, dim: Int = 64): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(
        s"ann index '$name' at $dir does not exist — build() it first"))
    val corpus = spark.read.parquet(postingsPath(dir, name, v))
      .select(col(idCol), col(vecCol))
    writeVersion(spark, corpus, dir, name, idCol, vecCol, numCentroids,
      dim, v + 1)
    commitVersion(spark, dir, name, v + 1)
    dropVersionDir(spark, dir, name, v)
    ()
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
      numProbes: Int = 2): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val v = currentVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(
        s"ann index '$name' at $dir does not exist — build() it first"))
    val cent = spark.read.parquet(centroidsPath(dir, name, v))
    val q = Similarity.assignCells(queries, idCol, vecCol, cent, numProbes)
      .select(col(idCol).as("query_id"), col(vecCol).as("v_q"),
        Similarity.selfNormFast(vecCol).as("n_q"),
        col("__cell").as("cell"))
    val c = spark.read.parquet(postingsPath(dir, name, v))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"),
        Similarity.selfNormFast(vecCol).as("n_c"), col("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        Similarity.dotFast("v_q", "v_c") / (col("n_q") * col("n_c")))
    Similarity.topK(scored, k)
  }
}
