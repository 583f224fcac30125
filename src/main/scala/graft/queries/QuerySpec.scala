package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the semantics
  * are SQL-expressible) an equivalent ANSI SQL string the driver runs in
  * DuckDB over the same parquet tables. Column names/aliases MUST match
  * between the two — the driver's compare sorts columns by name.
  *
  * `setup` is an optional untimed fixture-staging hook: Bench runs it before
  * starting the clock so file copies / fixture writes don't pollute the
  * operator's measured time. Staging helpers are memoized per (query, dir),
  * so a query body that self-stages (for standalone Verify correctness) hits
  * the memoized no-op path when Bench has already staged.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    setup: Option[(SparkSession, String) => Unit] = None,
    /** Correctness-only standing: the query stays in the adjudicated
      * ledger (Verify + oracle) but Bench skips it. For deliberate
      * verification twins whose SHAPE is scale-forbidden (q31's all-pairs
      * crossJoin) — timing a shape the library tells users never to run
      * only adds noise to the perf signal. Bench reports the skip in a
      * `bench_exempt` field, so the omission is visible, not silent.
      */
    benchExempt: Boolean = false) {
  def withSetup(s: (SparkSession, String) => Unit): QuerySpec =
    copy(setup = Some(s))
  def correctnessOnly: QuerySpec = copy(benchExempt = true)
}

object QuerySpec {
  def oracled(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(sql.trim))

  /** Ops with no faithful SQL mirror → driver records a rows-only check. */
  def unoracled(name: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)

  /** Memoizes a staging action per key (typically the sf dir): the first
    * caller stages, every later caller in the same JVM reuses the result.
    *
    * Stagers MUST write to a key-distinct path — use [[stagedPath]] — or two
    * sf dirs in one JVM would alias one fixed location and a cache hit for
    * dir A could silently serve dir B's staged bytes.
    */
  final class StagingCache[V] {
    private val cache = new java.util.concurrent.ConcurrentHashMap[String, V]()
    def getOrStage(key: String)(stage: => V): V =
      cache.computeIfAbsent(key, _ => stage)
  }

  /** A per-key staging directory under target/tmp: `base` suffixed with a
    * filesystem-safe digest of the key so distinct sf dirs never collide.
    */
  def stagedPath(base: String, key: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    s"/root/repo/target/tmp/${base}_$digest"
  }

  /** Collapse the part-directory `staged/sub` (a coalesce(1) write) into
    * the single file `staged/name` — file-stream stagers need flat,
    * name-ordered files, not part directories. Fails loudly on an empty
    * staging write. Shared by every multi-batch stream stager.
    */
  private[queries] def flattenPart(
      spark: org.apache.spark.sql.SparkSession,
      staged: String, sub: String, name: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$staged/$sub"))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"no part- file under $staged/$sub — empty staging write?"))
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$staged/$name"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$staged/$sub"), true)
    ()
  }

  /** Backdate `path`'s mtime by `millisAgo` so the oldest-first file
    * source (with maxFilesPerTrigger=1) drains staged batches in the
    * intended order.
    */
  private[queries] def backdate(path: String, millisAgo: Long): Unit = {
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(path),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - millisAgo))
    ()
  }
}
