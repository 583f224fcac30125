package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained dedup-CLUSTER labels — the third
  * stage of the maintained dedup pipeline and the artifact form of
  * [[Clusters.connectedComponents]]: [[DedupIndex]]/[[ApssIndex]] folds
  * emit each ingest batch's near-dup PAIRS; this folds those pairs into
  * persistent component labels so survivor selection (the q69 policy)
  * never recomputes connected components over the accumulated pair
  * history. Same commit discipline as its siblings
  * ([[graft.io.VersionPointer]]: create-only manifest PUTs, marker-gated
  * fold deltas, retention window + time-travel, idempotent
  * caller-supplied fold generations).
  *
  * Maintenance algebra (what makes a fold DELTA-sized): stored
  * components are already collapsed to their min-id representative, so a
  * fresh pair (a, b) carries exactly the information "rep(a) ~ rep(b)".
  * A fold maps each fresh endpoint to its stored representative (itself
  * when unseen), runs connected components over THAT mapped edge list —
  * |batch pairs| edges, never the accumulated graph — and relabels only
  * the members of touched components (a semi-join on the old
  * representative). The min-id invariant is preserved exactly: the
  * merged component's min is the min over its old representatives and
  * its new node ids, which is precisely what the mapped-edge CC
  * computes. Maintained labels are therefore identical to a one-shot
  * [[Clusters.connectedComponents]] over the accumulated pair set
  * (q329 adjudicates; ClusterIndexSpec pins fold-order invariance and
  * the new-node-becomes-min case).
  *
  * Layout: `v<N>/labels` — (node, cluster_id), the base generation;
  * `v<N>/deltas/g<G>/labels` — the CHANGED labels of fold G, committed
  * by a create-only `v<N>/_folds/g<G>.ok` marker. Reads resolve
  * keep-last by generation per node (the [[graft.operators
  * .BucketedSnapshot]] MOR discipline applied to a label table);
  * [[compact]] folds the deltas back into one base. Nodes that never
  * appeared in a pair have no row — the [[Clusters.connectedComponents]]
  * contract; join `labels()` LEFT from the corpus and coalesce to the
  * node id for the every-doc view.
  */
object ClusterIndex {

  private def layoutDir(dir: String, name: String): String =
    s"$dir/$name.clusterindex"

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

  private def basePath(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/labels"
  private def foldsDir(dir: String, name: String, v: Int): String =
    s"${layoutDir(dir, name)}/v$v/_folds"
  private def deltaPath(dir: String, name: String, v: Int, g: Long): String =
    s"${layoutDir(dir, name)}/v$v/deltas/g$g/labels"

  private val FoldMarkerRe = """g(\d+)\.ok""".r

  // r10: memoized per-version label schema — see DedupIndex.readStored
  // (schema-inferring reads each pay a footer job; the label schema is
  // frozen per version: base and every delta are (node, cluster_id)).
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def readStored(
      spark: SparkSession, schemaKey: String,
      paths: Seq[String]): DataFrame = {
    val sch = schemaCache.computeIfAbsent(
      schemaKey, p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(paths: _*)
  }

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
        s"cluster index '$name' at $dir does not exist — build() it first"))

  /** Committed labels of version `v` resolved keep-last by generation
    * per node (base = generation 0; only fold generations < `belowGen`
    * are visible — a fold replay reads exactly the state below itself).
    */
  private def resolved(
      spark: SparkSession, dir: String, name: String, v: Int,
      belowGen: Long = Long.MaxValue): DataFrame = {
    val gens = committedFolds(spark, dir, name, v).filter(_ < belowGen)
    val base = basePath(dir, name, v)
    val all = gens.foldLeft(
      readStored(spark, base, Seq(base))
        .withColumn("__g", lit(0L))) { (acc, g) =>
      acc.unionByName(
        readStored(spark, base, Seq(deltaPath(dir, name, v, g)))
          .withColumn("__g", lit(g)))
    }
    val w = Window.partitionBy("node").orderBy(col("__g").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("node", "cluster_id")
  }

  /** Build version 1 (or N+1 — a rebuild) from a pair list
    * (columns `id_a`, `id_b`), then apply the retention window.
    */
  def build(
      spark: SparkSession, pairs: DataFrame, dir: String, name: String,
      retainVersions: Int = 2): Unit = {
    val v = currentVersion(spark, dir, name).getOrElse(0) + 1
    graft.io.VersionPointer.dropDir(spark, s"${layoutDir(dir, name)}/v$v")
    Clusters.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .write.mode("errorifexists").parquet(basePath(dir, name, v))
    graft.io.VersionPointer.commit(spark, layoutDir(dir, name), v)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v, retainVersions)
  }

  /** The maintained labels: (node, cluster_id) for every node that has
    * appeared in any folded pair, resolved to the current (or a retained
    * historical) version's state.
    */
  def labels(
      spark: SparkSession, dir: String, name: String,
      atVersion: Option[Int] = None): DataFrame = {
    val v = graft.io.VersionPointer.resolveRead(spark,
      layoutDir(dir, name), atVersion, s"cluster index '$name' at $dir")
    resolved(spark, dir, name, v)
  }

  /** The CHANGED labels a batch of fresh pairs implies against prior
    * labels — the shared core of [[fold]] (which commits them) and the
    * replay path. Output: (node, cluster_id) rows for exactly the nodes
    * whose label changes (including fresh nodes' first labels), plus the
    * cache handle of the mapped-edge CC output so the caller can
    * unpersist it once its single action has run — the operator owns
    * the action in [[fold]], so it owns the cleanup too (r10, advisor).
    * `fresh` must already be MATERIALIZED (checkpointed) pairs — the
    * three references below (mapped edges + both endpoint legs) read it
    * without recomputation.
    */
  private def changedLabels(
      fresh: DataFrame, prior: DataFrame): (DataFrame, Seq[DataFrame]) = {
    // endpoints → stored representative (itself when unseen)
    val la = prior.select(col("node").as("id_a"), col("cluster_id").as("ra"))
    val lb = prior.select(col("node").as("id_b"), col("cluster_id").as("rb"))
    val mapped = fresh
      .join(la, Seq("id_a"), "left")
      .join(lb, Seq("id_b"), "left")
      .select(coalesce(col("ra"), col("id_a")).as("src"),
        coalesce(col("rb"), col("id_b")).as("dst"))
    // CC over |batch| mapped edges — representatives and fresh nodes only
    // (persist, not eager checkpoint: referenced twice, materialized by
    // the caller's single write action — r9)
    val cc = Clusters.connectedComponents(mapped)
      .select(col("node").as("rep"), col("cluster_id").as("new_root"))
      .persist()
    // stored members of touched components re-label when the root moved
    val relabeled = prior
      .join(cc, prior("cluster_id") === cc("rep"))
      .filter(col("new_root") =!= col("cluster_id"))
      .select(col("node"), col("new_root").as("cluster_id"))
    // fresh endpoints unseen so far: first labels (their rep is
    // themselves; absent from cc only when their every edge collapsed to
    // a self-loop, i.e. both endpoints shared one stored component —
    // then they were not unseen, contradiction — or the pair was (x, x))
    val endpoints = fresh.select(col("id_a").as("node"))
      .unionByName(fresh.select(col("id_b").as("node"))).distinct()
    val freshFirst = endpoints
      .join(prior.select("node"), Seq("node"), "left_anti")
      .join(cc, endpoints("node") === cc("rep"))
      .select(col("node"), col("new_root").as("cluster_id"))
    (relabeled.unionByName(freshFirst), Seq(cc))
  }

  /** Fold a batch of fresh near-dup pairs (columns `id_a`, `id_b` — a
    * [[DedupIndex.fold]]/[[ApssIndex.fold]] result) into the maintained
    * labels: compute the changed labels against the prior state, commit
    * them as this fold's marker-gated delta, and return them
    * (delta-sized — the downstream consumer's incremental feed).
    * `generation` is the caller's batch identity: a committed
    * generation replays its stored delta without writing.
    */
  def fold(
      spark: SparkSession, fresh: DataFrame, dir: String, name: String,
      generation: Option[Long] = None): DataFrame = {
    val v = requireVersion(spark, dir, name)
    val committed = committedFolds(spark, dir, name, v)
    val g = generation.getOrElse(committed.lastOption.getOrElse(0L) + 1L)
    if (committed.contains(g))
      return readStored(spark, basePath(dir, name, v),
        Seq(deltaPath(dir, name, v, g)))
    require(committed.forall(_ < g),
      s"fold generation $g is below already-committed generations " +
        s"${committed.filter(_ > g).mkString(", ")} — out-of-order " +
        "batch identities would make replay state ambiguous")
    // r10 two-phase fold (guide §8's decide-with-small-rows discipline):
    // the caller's fresh frame is typically an UNMATERIALIZED index-fold
    // result (bands join + exact verify over a shingle-exploded working
    // set) — materialize it FIRST, eagerly and UNSCOPED, so the heavy
    // verify keeps its parallelism, counting the pairs on the same
    // action via observe(). Everything after — prior resolve, endpoint
    // mapping, CC over |batch| edges, the delta write — is label algebra
    // over that measured pair count, so it runs under the size-gated
    // fixed-cost scope (one job per action below the gate; a TB-scale
    // fold exceeds the gate and keeps AQE).
    val obs = org.apache.spark.sql.Observation()
    val freshCk = fresh.select("id_a", "id_b")
      .observe(obs, count(lit(1)).as("n"))
      .localCheckpoint()
    val nPairs = obs.get("n").asInstanceOf[Long]
    graft.conf.Tuning.withSmallInputScope(spark, nPairs * 32L) {
      // persist (not eager checkpoint): prior is referenced four ways in
      // changedLabels; the write action below materializes the cache once
      val prior = resolved(spark, dir, name, v).persist()
      val (changed, handles) = changedLabels(freshCk, prior)
      // the write is this operator's single action over the cached
      // frames — unpersist them afterwards so a long-lived session
      // calling fold() repeatedly doesn't accumulate cached blocks
      // (r10, advisor)
      try changed.write.mode("overwrite")
        .parquet(deltaPath(dir, name, v, g))
      finally (prior +: handles).foreach(_.unpersist())
    }
    val marker = new org.apache.hadoop.fs.Path(
      s"${foldsDir(dir, name, v)}/g$g.ok")
    val f = fs(spark, marker.toString)
    val out = f.create(marker, false)
    try out.write("ok".getBytes("UTF-8")) finally out.close()
    readStored(spark, basePath(dir, name, v),
      Seq(deltaPath(dir, name, v, g)))
  }

  /** Rewrite the resolved labels into one base at version N+1, pointer
    * promote, retention window — the amortized cleanup that bounds the
    * read-time keep-last window as fold deltas accumulate.
    */
  def compact(
      spark: SparkSession, dir: String, name: String,
      retainVersions: Int = 2): Unit = {
    val v = requireVersion(spark, dir, name)
    val flat = resolved(spark, dir, name, v).localCheckpoint()
    graft.io.VersionPointer.dropDir(
      spark, s"${layoutDir(dir, name)}/v${v + 1}")
    flat.write.mode("errorifexists").parquet(basePath(dir, name, v + 1))
    graft.io.VersionPointer.commit(spark, layoutDir(dir, name), v + 1)
    graft.io.VersionPointer.retain(
      spark, layoutDir(dir, name), v + 1, retainVersions)
  }
}
