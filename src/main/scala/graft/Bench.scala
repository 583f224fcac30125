package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Fixture staging runs untimed via each spec's
  * setup hook, so the timed number is operator time, not file copies. A
  * failing query is reported in an `errors` field and fails the run
  * (non-zero exit) instead of being silently recorded as a fast success.
  *
  * Each query is timed TWICE and `queries` reports the min: the second
  * pass reuses the warmed JIT/codegen caches, so a cold-compile or
  * box-contention spike on pass one (the r3 q25 1.8→11.7 s swing) no
  * longer masquerades as a plan regression. The first-pass times are kept
  * in `cold` so compile-heavy plans stay visible.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dev-only: optional arg = comma-separated query-name filter (the
    // driver passes no args and benches everything)
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(',').toSet) else None
    only.foreach { names =>
      val unknown = names -- SparkEntry.specs.map(_.name).toSet
      if (unknown.nonEmpty)
        System.err.println(
          s"[bench] WARNING: filter names match no query: ${unknown.mkString(", ")}")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: one tiny scan + shuffle + window so the first timed
    // query doesn't absorb JVM classloading / first-stage scheduling costs
    // (cold-start is irrelevant at 100 TB but poisons the per-query signal).
    locally {
      import org.apache.spark.sql.functions._
      val warm = spark.read.parquet(s"$sfDir/region.parquet")
      warm.groupBy("r_regionkey").count()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("r_regionkey"))))
        .count()
      ()
    }
    // Shuffle-write volume per query: a listener sums stage shuffle bytes;
    // the bus is flushed (BusFlush) before each snapshot so async listener
    // delivery can't bleed one query's bytes into the next.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    def shuffleSnapshot(): Long = {
      org.apache.spark.graftbench.BusFlush.flush(spark)
      shuffleBytes.get()
    }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // correctness-only twins (scale-forbidden shapes kept solely as
    // oracles) are excluded from timing but reported, so the omission is
    // auditable rather than silent. An explicit dev filter naming a
    // query WINS over its exemption (asking for a timing by name is the
    // audit), and the reported exempt list covers only this run's scope.
    val exempt =
      if (only.isDefined) Nil
      else SparkEntry.specs.filter(_.benchExempt).map(_.name)
    val results = SparkEntry.specs
      .filter(spec => only match {
        case Some(names) => names.contains(spec.name)
        case None => !spec.benchExempt
      })
      .map { spec =>
      spec.setup.foreach { s =>
        try s(spark, sfDir)
        catch { case e: Throwable =>
          errors(spec.name) = s"setup: ${e.getMessage}" }
      }
      // UNTIMED post-pass hygiene: drop cache entries and persisted /
      // locally-checkpointed RDD blocks the pass left behind. Runs after
      // EVERY pass (not just per query) so the warm pass cannot silently
      // reuse the cold pass's registered caches through CacheManager's
      // plan matching — each timed pass computes from the parquet inputs
      // (the no-cross-run-caching rule), and blocks don't accumulate
      // across 330+ queries (ContextCleaner's periodic GC is 30 min —
      // longer than this run).
      // INVARIANT this blanket unpersist relies on: every pass rebuilds
      // all of its DataFrames from scratch (spec.fn is re-invoked), so no
      // reference to a dropped locally-checkpointed RDD — whose data is
      // unrecoverable once unpersisted — is ever reused across passes.
      // Setup-created state lives on DISK (staged parquet), never in a
      // retained checkpointed frame; breaking that would surface as
      // "checkpoint block not found" here.
      def dropLeftoverCaches(): Unit =
        try {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(false))
        } catch { case e: Throwable =>
          // cleanup failures must not kill the bench, but hiding them
          // would mask real leaks — log and continue
          System.err.println(
            s"[bench] WARNING: post-pass cache cleanup failed: $e")
        }
      def onePass(): Double = {
        val t0 = System.nanoTime()
        try { spec.fn(spark, sfDir).count(); () }
        catch { case e: Throwable =>
          errors(spec.name) =
            Option(e.getMessage).getOrElse(e.getClass.getName)
        }
        val secs = (System.nanoTime() - t0) / 1e9
        dropLeftoverCaches()
        secs
      }
      // a failed setup dooms the timed run — skip it so the root cause in
      // `errors` isn't overwritten by the secondary failure
      val s0 = shuffleSnapshot()
      val cold = if (errors.contains(spec.name)) 0.0 else onePass()
      val coldShuffle = shuffleSnapshot() - s0
      // pass 2 only if pass 1 succeeded; min-of-2 is the reported number
      val warm = if (errors.contains(spec.name)) cold else onePass()
      spec.name -> (math.min(cold, warm), cold, coldShuffle)
    }
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    val qs = results.map { case (k, (v, _, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val coldJson = results.map { case (k, (_, c, _)) => "\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val shuffleJson = results.map { case (k, (_, _, b)) =>
      "\"" + k + "\":" + (math.round(b / 1048.576) / 1000.0)
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":" + JsonEscape(v.take(200))
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val exemptJson = exempt.map(JsonEscape(_)).mkString("[", ",", "]")
    // The driver's artifact capture keeps the TAIL of stdout and truncates
    // long lines (BENCH_r04..r06 recorded "parsed": null with the tail
    // landing mid-map in the big per-query line). Print the compact
    // headline BOTH before and after the big line: the trailing copy is
    // the one a tail capture keeps; the leading copy aids humans reading
    // the full log top-down.
    val headline = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"sf":"$sfDir"}"""
    // Hot-row attribution that SURVIVES the tail capture: the 20 slowest
    // queries as one compact line beside the headline, so a truncated
    // artifact still names the rows worth auditing; loadavg makes a
    // box-contention swing attributable from the artifact alone.
    val top = results.sortBy(-_._2._1).take(20)
      .map { case (k, (v, _, _)) =>
        "[\"" + k + "\"," + (math.round(v * 1000) / 1000.0) + "]" }
      .mkString("[", ",", "]")
    val load = math.round(
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage * 100) / 100.0
    val topLine = s"""{"metric":"top","unit":"sec","rows":$top,"loadavg":$load}"""
    // r10 (driver contract): the artifact capture keeps only the last few
    // KB of stdout, so the ~10 KB per-query map inside the big line never
    // survived (PERF r08/r09 per_query = {}). Emit the per-query timings
    // as their OWN compact chunked lines near the end, ordered ASCENDING
    // by time so the chunks most likely to survive a character-tail
    // capture (the last ones) hold the slowest — i.e. the interesting —
    // rows; each chunk is a complete, independently parseable JSON object.
    val byTime = results.map { case (k, (v, _, _)) => (k, r3(v)) }
      .sortBy(_._2)
    val chunks = byTime.grouped(25).toSeq
    val chunkLines = chunks.zipWithIndex.map { case (c, i) =>
      val m = c.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      s"""{"metric":"queries","unit":"sec","part":${i + 1},"of":${chunks.size},"queries":$m}"""
    }
    println(headline)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$coldJson,"shuffle_mb":$shuffleJson,"errors":$errJson,"bench_exempt":$exemptJson,"sf":"$sfDir"}""")
    chunkLines.foreach(println)
    println(topLine)
    println(headline)
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
