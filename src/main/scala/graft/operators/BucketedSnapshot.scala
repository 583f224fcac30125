package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed-by-PK snapshot layout — the 100 TB shape of the reference's
  * snapshot merge (ref: src/etl-utils.ts:258-355 for the semantics;
  * the layout itself is Spark-native extension surface).
  *
  * The plain snapshot merge ([[Upsert.keepLast]]) unions both sides and
  * shuffles EVERYTHING on the PK every fold — at a 100 TB snapshot with a
  * 100 GB nightly delta, that is a 100 TB shuffle to apply a 0.1% change.
  * This layout moves the snapshot's shuffle to write time, once, by
  * persisting it as a Spark bucketed external table (`CLUSTERED BY (pk)
  * INTO n BUCKETS`), and re-shapes the merge so only the DELTA ever
  * crosses the wire:
  *
  *   1. dedup the delta by PK (keep-last within the batch) — ONE shuffle,
  *      delta-sized, explicitly into `buckets` partitions so the join
  *      below needs no second exchange;
  *   2. `old LEFT ANTI JOIN delta` on the PK — the bucketed scan already
  *      satisfies the join's required distribution, so the snapshot side
  *      sort-merges with ZERO Exchange (BucketedSnapshotSpec pins exactly
  *      that plan shape);
  *   3. `unionByName(delta)` (allowMissingColumns — schema drift adds
  *      null-filled columns, same as keepLast);
  *   4. bucketed write of the union WITHOUT a repartition: the anti-join
  *      side is bucket-aligned (one task per bucket) and the delta side
  *      is hash-partitioned with the same key and modulus, so each task
  *      writes into exactly one bucket — at most two files per bucket per
  *      generation, which bucketed scans read natively. No shuffle at
  *      write either.
  *
  * Each fold writes a NEW versioned directory (`v1`, `v2`, …) under
  * `{dir}/{stream}.snapshot.bucketed/` and promotes it by atomically
  * renaming a `_current` pointer file — the same never-read-what-you're-
  * overwriting discipline as the single-file snapshot, without rewriting
  * the pointer target in place. The superseded version's table and files
  * are dropped after promotion.
  *
  * Catalog note: bucket metadata lives in the session catalog; a fresh
  * session re-registers the external table from the pointer + parquet
  * schema on first read ([[ensureTable]]), so the layout survives
  * restarts without a persistent metastore.
  *
  * Semantics deviations (documented):
  *  - unlike the reference's first-write path, the FIRST bucketed write
  *    also dedups by PK — the unique-PK invariant is what makes every
  *    later anti-join fold equal to [[Upsert.keepLast]], so the layout
  *    establishes it from generation one;
  *  - NULL primary keys are rejected at runtime (see [[dedupBatch]]);
  *    [[Upsert.keepLast]]'s window groups them, but a bucket-aligned
  *    equality join cannot, and silently re-inserting them every fold
  *    would be corruption.
  */
object BucketedSnapshot {

  private def layoutDir(snapshotDir: String, stream: String): String =
    s"$snapshotDir/$stream.snapshot.bucketed"

  /** Deterministic, catalog-legal table name, unique per (dir, stream,
    * version) so two snapshot dirs in one session never collide.
    */
  private def tableName(
      snapshotDir: String, stream: String, version: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(snapshotDir.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    val safe = stream.replaceAll("[^A-Za-z0-9_]", "_")
    s"graft_snap_${safe}_${h}_v$version"
  }

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Current version from the `_current` pointer, if the layout exists. */
  private[graft] def currentVersion(
      spark: SparkSession, snapshotDir: String, stream: String): Option[Int] =
    readPointer(spark, snapshotDir, stream).map(_._1)

  /** (version, buckets-recorded-at-write) from the pointer; the bucket
    * count rides along so a later session cannot silently re-register the
    * table with a DIFFERENT count (the catalog would then claim an
    * alignment the files don't have — misread, not error).
    */
  private def readPointer(
      spark: SparkSession, snapshotDir: String,
      stream: String): Option[(Int, Option[Int])] = {
    val ptr = new org.apache.hadoop.fs.Path(
      s"${layoutDir(snapshotDir, stream)}/_current")
    val f = fs(spark, ptr.toString)
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try {
        val parts = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          .trim.split("\\s+")
        Some((parts(0).toInt,
          if (parts.length > 1) Some(parts(1).toInt) else None))
      } finally in.close()
    }
  }

  private def writePointer(
      spark: SparkSession, snapshotDir: String, stream: String,
      version: Int, buckets: Int): Unit = {
    val dir = layoutDir(snapshotDir, stream)
    val ptr = new org.apache.hadoop.fs.Path(s"$dir/_current")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$dir/._current.swap.${System.nanoTime()}")
    val f = fs(spark, dir)
    val out = f.create(tmp, true)
    try out.write(s"$version $buckets".getBytes("UTF-8")) finally out.close()
    // FileContext rename with OVERWRITE is the atomic promote — a plain
    // delete-then-rename has a window where the pointer is ABSENT, and a
    // crash there makes the next fold see "no snapshot" and silently
    // rebuild from its delta alone
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      tmp.toUri, spark.sessionState.newHadoopConf())
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    ()
  }

  private def checkBuckets(
      spark: SparkSession, snapshotDir: String, stream: String,
      buckets: Int): Unit =
    readPointer(spark, snapshotDir, stream).flatMap(_._2).foreach { b =>
      require(b == buckets,
        s"bucketed snapshot '$stream' at $snapshotDir was written with " +
          s"$b buckets; reading/folding with $buckets would misalign the " +
          "bucketed scan — pass the original count (re-bucket via compact " +
          "or a rewrite fold to change it)")
    }

  /** Register the external bucketed table for `version` if this session's
    * catalog doesn't have it yet (fresh-session recovery path).
    */
  private def ensureTable(
      spark: SparkSession, snapshotDir: String, stream: String,
      pk: Seq[String], buckets: Int, version: Int): String = {
    val tbl = tableName(snapshotDir, stream, version)
    if (!spark.catalog.tableExists(tbl)) {
      val path = s"${layoutDir(snapshotDir, stream)}/v$version"
      val schema = spark.read.parquet(path).schema
      val cols = pk.map(c => s"`$c`").mkString(", ")
      spark.sql(
        s"""CREATE TABLE `$tbl` (${schema.toDDL})
           |USING parquet
           |CLUSTERED BY ($cols) SORTED BY ($cols) INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
    tbl
  }

  /** The current snapshot as a BUCKETED scan (joins/aggs on the PK run
    * exchange-free), or None if no snapshot exists yet.
    */
  def read(
      spark: SparkSession, stream: String, snapshotDir: String,
      pk: Seq[String], buckets: Int): Option[DataFrame] = {
    checkBuckets(spark, snapshotDir, stream, buckets)
    currentVersion(spark, snapshotDir, stream).map { v =>
      spark.table(ensureTable(spark, snapshotDir, stream, pk, buckets, v))
    }
  }

  /** Keep-last dedup of one batch by PK: explicit `buckets`-way hash
    * partitioning (so the downstream join adds no second exchange), then
    * the same row_number discipline as [[Upsert.keepLast]].
    *
    * Null PKs are REJECTED at runtime (a row-level `assert_true` riding
    * the same pass — no extra scan): the merge join must use plain
    * equality to stay bucket-aligned (`<=>` rewrites the join keys to
    * `(coalesce(k), isnull(k))`, which disables the bucketed scan and
    * re-shuffles the whole snapshot), and under plain equality a null PK
    * would never match — it would silently re-insert on every fold.
    * Failing fast is the only non-corrupting option.
    */
  private def dedupBatch(
      df: DataFrame, pk: Seq[String], buckets: Int,
      tieBreak: Seq[String]): DataFrame = {
    // same ordering discipline as keepLast: tieBreak desc; with no
    // tieBreak the pick among in-batch duplicates is engine-arbitrary
    // (exactly keepLast's contract), constant-ordered here because
    // row_number demands SOME ordering
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy((tieBreak.map(desc) :+ lit(0).asc): _*)
    val nonNull = pk.map(col(_).isNotNull).reduce(_ && _)
    df
      // assert_true yields NULL when the guard holds; the coalesce keeps
      // the filter a tautology so rows pass — but the expression sits in
      // a Filter, which column pruning can never drop
      .filter(coalesce(
        assert_true(nonNull,
          lit(s"bucketed snapshot: NULL primary key (${pk.mkString(",")}) " +
            "— null PKs are not supported by the bucketed layout"))
          .cast("boolean"),
        lit(true)))
      .repartition(buckets, pk.map(col): _*)
      .withColumn("_bs_rn", row_number().over(w))
      .filter(col("_bs_rn") === 1)
      .drop("_bs_rn")
  }

  private def writeVersion(
      df: DataFrame, spark: SparkSession, snapshotDir: String,
      stream: String, pk: Seq[String], buckets: Int, version: Int): String = {
    val path = s"${layoutDir(snapshotDir, stream)}/v$version"
    val tbl = tableName(snapshotDir, stream, version)
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    // a crash between a previous attempt's write and its pointer promote
    // leaves a partial v$version dir; writing into it would mix two
    // attempts' files — clear it first (the pointer still guards reads)
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, path)
    if (f.exists(p)) f.delete(p, true)
    df.write
      .format("parquet")
      .bucketBy(buckets, pk.head, pk.tail: _*)
      .sortBy(pk.head, pk.tail: _*)
      .option("path", path)
      .saveAsTable(tbl)
    tbl
  }

  private def dropVersion(
      spark: SparkSession, snapshotDir: String, stream: String,
      version: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS " +
      s"`${tableName(snapshotDir, stream, version)}`")
    val p = new org.apache.hadoop.fs.Path(
      s"${layoutDir(snapshotDir, stream)}/v$version")
    val f = fs(spark, p.toString)
    if (f.exists(p)) f.delete(p, true)
    ()
  }

  /** One snapshot fold: merge `fresh` over the stored snapshot with
    * keep-last-by-PK semantics (≡ [[Upsert.keepLast]] given the layout's
    * unique-PK invariant — BucketedSnapshotSpec proves the equivalence),
    * persist as the next bucketed version, promote, GC the old version.
    * Returns the promoted snapshot as a bucketed scan.
    */
  def fold(
      spark: SparkSession, fresh: DataFrame, stream: String,
      snapshotDir: String, pk: Seq[String], buckets: Int,
      tieBreak: Seq[String] = Nil,
      oldTransform: DataFrame => DataFrame = identity): DataFrame = {
    require(pk.nonEmpty, "bucketed snapshot requires a primary key")
    checkBuckets(spark, snapshotDir, stream, buckets)
    // persist: the delta feeds BOTH merge branches (anti-join probe and
    // union tail); without the cache, column pruning specializes the two
    // subtrees differently and the delta's dedup shuffle runs twice
    val delta = dedupBatch(fresh, pk, buckets, tieBreak)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (merged, nextV) = currentVersion(spark, snapshotDir, stream) match {
        case None => (delta, 1)
        case Some(v) =>
          val old = oldTransform(spark.table(
            ensureTable(spark, snapshotDir, stream, pk, buckets, v)))
          // plain equality — never <=>: null-safe keys rewrite to
          // (coalesce(k), isnull(k)) and disable the bucketed scan.
          // Null PKs were rejected in dedupBatch, so the semantics agree.
          val cond = pk.map(c => old(c) === delta(c)).reduce(_ && _)
          val kept = old.join(delta, cond, "left_anti")
          (kept.unionByName(delta, allowMissingColumns = true), v + 1)
      }
      writeVersion(merged, spark, snapshotDir, stream, pk, buckets, nextV)
      writePointer(spark, snapshotDir, stream, nextV, buckets)
      if (nextV > 1) dropVersion(spark, snapshotDir, stream, nextV - 1)
      spark.table(tableName(snapshotDir, stream, nextV))
    } finally { delta.unpersist(); () }
  }

  /** Generation column for the merge-on-read layout: which fold a row
    * arrived in; read-time keep-last picks the max per PK. Internal —
    * stripped by [[readMor]].
    */
  private[graft] val GenCol = "_graft_gen"

  /** Merge-on-read fold — the true 100 TB nightly shape. [[fold]] avoids
    * the snapshot-side SHUFFLE but still rewrites the full table every
    * merge (write amplification = |snapshot| / |delta|). This variant
    * APPENDS the deduped delta into the SAME bucketed table, stamped with
    * a generation number: fold-time IO is delta-sized, full stop. Bucket
    * alignment is preserved because a bucketed `saveAsTable(Append)`
    * routes each row to its bucket file by the same hash — base and delta
    * rows of one PK land in one bucket, so read-time resolution needs no
    * shuffle either.
    *
    * Keep-last resolves at READ time ([[readMor]]): a row_number window
    * over the PK ordered by generation desc — which the bucketed scan's
    * partitioning already satisfies, so the resolve is a per-bucket local
    * sort, ZERO exchanges (MorSnapshotSpec pins the plan). Read cost
    * grows with accumulated generations; [[compactMor]] folds them back
    * to one (full rewrite, amortized over many cheap appends — the
    * LSM/merge-on-read tradeoff Delta and Hudi make, built here from
    * Spark primitives).
    *
    * Schema drift is NOT supported between compactions (a bucketed append
    * must match the table schema exactly); [[fold]] remains the
    * drift-tolerant form.
    */
  def foldMor(
      spark: SparkSession, fresh: DataFrame, stream: String,
      snapshotDir: String, pk: Seq[String], buckets: Int,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(pk.nonEmpty, "bucketed snapshot requires a primary key")
    checkBuckets(spark, snapshotDir, stream, buckets)
    currentVersion(spark, snapshotDir, stream) match {
      case None =>
        val base = dedupBatch(fresh, pk, buckets, tieBreak)
          .withColumn(GenCol, lit(1L))
        writeVersion(base, spark, snapshotDir, stream, pk, buckets, 1)
        writePointer(spark, snapshotDir, stream, 1, buckets)
      case Some(v) =>
        val tbl = ensureTable(spark, snapshotDir, stream, pk, buckets, v)
        require(spark.table(tbl).columns.contains(GenCol),
          s"snapshot '$stream' was not created by foldMor (no $GenCol " +
            "column) — use fold() or compact it into the MOR layout first")
        // coalesce(…, 0): an EMPTY stored table (a first batch that
        // deduped/filtered to nothing) has a null max — treat as gen 0
        // instead of NPE-wedging the snapshot
        val nextGen = spark.table(tbl)
          .agg(coalesce(max(col(GenCol)), lit(0L))).head.getLong(0) + 1L
        val delta = dedupBatch(fresh, pk, buckets, tieBreak)
          .withColumn(GenCol, lit(nextGen))
        // bucket-aligned append: delta-sized IO, no version rewrite
        delta.write.format("parquet")
          .bucketBy(buckets, pk.head, pk.tail: _*)
          .sortBy(pk.head, pk.tail: _*)
          .mode("append")
          .saveAsTable(tbl)
    }
    readMor(spark, stream, snapshotDir, pk, buckets).get
  }

  /** The merge-on-read snapshot resolved to current state: keep-last by
    * generation per PK, as a per-bucket local sort over the bucketed scan
    * — no exchange. Returns None if no snapshot exists.
    */
  def readMor(
      spark: SparkSession, stream: String, snapshotDir: String,
      pk: Seq[String], buckets: Int): Option[DataFrame] =
    read(spark, stream, snapshotDir, pk, buckets).map { t =>
      if (!t.columns.contains(GenCol)) t
      else {
        val w = Window.partitionBy(pk.map(col): _*)
          .orderBy(col(GenCol).desc)
        t.withColumn("_bs_rn", row_number().over(w))
          .filter(col("_bs_rn") === 1)
          .drop("_bs_rn", GenCol)
      }
    }

  /** Fold all accumulated generations back into one: full rewrite to the
    * next version (generation reset to 1), pointer promote, old version
    * dropped. The amortized cost that keeps [[readMor]]'s per-read merge
    * bounded.
    */
  def compactMor(
      spark: SparkSession, stream: String, snapshotDir: String,
      pk: Seq[String], buckets: Int): DataFrame = {
    val v = currentVersion(spark, snapshotDir, stream).getOrElse(
      throw new IllegalStateException(
        s"no snapshot '$stream' at $snapshotDir to compact"))
    val resolved = readMor(spark, stream, snapshotDir, pk, buckets).get
      .withColumn(GenCol, lit(1L))
    writeVersion(resolved, spark, snapshotDir, stream, pk, buckets, v + 1)
    writePointer(spark, snapshotDir, stream, v + 1, buckets)
    dropVersion(spark, snapshotDir, stream, v)
    readMor(spark, stream, snapshotDir, pk, buckets).get
  }

  /** Drop the whole layout (all versions, tables, pointer) — the
    * `overwrite` flag's clean-slate path.
    */
  def reset(
      spark: SparkSession, stream: String, snapshotDir: String): Unit = {
    currentVersion(spark, snapshotDir, stream).foreach { v =>
      spark.sql(s"DROP TABLE IF EXISTS " +
        s"`${tableName(snapshotDir, stream, v)}`")
    }
    val p = new org.apache.hadoop.fs.Path(layoutDir(snapshotDir, stream))
    val f = fs(spark, p.toString)
    if (f.exists(p)) f.delete(p, true)
    ()
  }

  /** The merge PLAN for spec assertion — identical shape to [[fold]]'s
    * merge but not executed/written, so BucketedSnapshotSpec can count
    * exchanges on exactly what fold runs.
    */
  private[graft] def mergePlan(
      spark: SparkSession, fresh: DataFrame, stream: String,
      snapshotDir: String, pk: Seq[String], buckets: Int): DataFrame = {
    val delta = dedupBatch(fresh, pk, buckets, Nil)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = currentVersion(spark, snapshotDir, stream).get
    val old = spark.table(
      ensureTable(spark, snapshotDir, stream, pk, buckets, v))
    val cond: Column = pk.map(c => old(c) === delta(c)).reduce(_ && _)
    old.join(delta, cond, "left_anti")
      .unionByName(delta, allowMissingColumns = true)
  }
}
