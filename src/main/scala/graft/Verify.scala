package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** JSON string escape: backslash, quote, and ALL control chars (<0x20) —
  * a stray tab/CR/formfeed in builder SQL or an exception message would
  * otherwise make the driver's json.load fail and silently zero a round's
  * correctness or bench signal. Shared by Verify and Bench.
  */
private[graft] object JsonEscape {
  def apply(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Built for a bounded wall-clock window (the r7 sequential run outgrew
  * the driver's t2 budget and the round recorded `{}`):
  *   - `oracle_sql.json` is written FIRST, so a timeout mid-run still
  *     yields a partial, checkable board — never an empty artifact.
  *   - Query dumps run CONCURRENTLY from a bounded worker pool. Spark's
  *     scheduler multiplexes jobs from many threads; FAIR mode keeps one
  *     long plan from starving the rest. ~40 streaming queries spend most
  *     of their wall in micro-batch fixed costs (trigger setup, commit-log
  *     writes), which overlap perfectly across threads.
  *   - Each query runs in its own `spark.newSession()`: shared
  *     SparkContext + shared staging caches, but a private SQLConf, so
  *     the queries that scope a conf override (shuffle partitions, state
  *     store provider) can't bleed it into a concurrently-planning peer.
  *   - Fixture staging is shared across queries via the memoized
  *     per-(stager, dir) StagingCache (QuerySpec.scala), so N queries over
  *     one fixture stage it once regardless of completion order.
  *   - `progress.jsonl` gets one line per completed query, flushed as it
  *     lands, so a killed run leaves an audit of what finished.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev-only: optional 3rd arg = comma-separated query-name filter
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(
          s"[verify] WARNING: filter names match no query: ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // Oracle dump FIRST: the artifact a timeout must not lose. The dev
    // filter applies here too — otherwise check_oracle.py reports ERROR
    // for every skipped query.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${JsonEscape(k)}: ${JsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val progress = new java.io.PrintWriter(
      new java.io.FileWriter(s"$outDir/progress.jsonl", /*append=*/ false),
      /*autoFlush=*/ true)
    def report(name: String, ok: Boolean, secs: Double, err: String): Unit =
      progress.synchronized {
        val e = if (err.isEmpty) "" else s""","error":${JsonEscape(err)}"""
        progress.println(
          s"""{"query":"$name","ok":$ok,"sec":${math.round(secs * 100) / 100.0}$e}""")
      }

    val todo = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val workers = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS",
      math.max(8, cpus.toInt * 2).toString).toInt
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    todo.foreach(queue.add)
    val failed = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to math.min(workers, math.max(1, todo.size))).map { i =>
      val t = new Thread(() => {
        var next = queue.poll()
        while (next != null) {
          val (name, fn) = next
          // a private session per query: conf overrides stay scoped even
          // under concurrency; SparkContext + staging caches are shared
          val session = spark.newSession()
          SparkSession.setActiveSession(session)
          session.sparkContext.setJobGroup(name, name, true)
          val t0 = System.nanoTime()
          try {
            fn(session, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            report(name, ok = true, (System.nanoTime() - t0) / 1e9, "")
          } catch { case e: Throwable =>
            failed.incrementAndGet()
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            System.err.println(s"[verify] $name failed: $msg")
            report(name, ok = false, (System.nanoTime() - t0) / 1e9, msg)
          } finally session.sparkContext.clearJobGroup()
          next = queue.poll()
        }
      }, s"verify-worker-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    progress.close()
    System.err.println(
      s"[verify] done: ${todo.size - failed.get()}/${todo.size} ok")
    spark.stop()
  }
}
