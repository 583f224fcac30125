package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single-file output semantics over Spark's directory-style sinks.
  *
  * The reference writes one file per export (`writeCSV`/`writeParquet`,
  * ref: src/etl-utils.ts:45-96); Spark writes a directory of parts. For
  * parity-sized outputs we write to a temp directory, then promote the
  * single part file to the target path with a filesystem rename (atomic on
  * HDFS/posix; copy-rename on object stores). For 100 TB outputs callers
  * should keep Spark's native directory layout instead — every sink here
  * takes a `singleFile` flag and the scale path never funnels through one
  * task.
  */
object SingleFile {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  def delete(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Write `df` through `write` into a temp dir and promote the produced
    * part file to `target` (overwriting). The temp dir lives next to the
    * target so the rename stays within one filesystem.
    */
  def write(
      spark: SparkSession,
      df: DataFrame,
      target: String,
      format: String,
      options: Map[String, String] = Map.empty): Unit = {
    val targetPath = new Path(target)
    val f = targetPath.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(targetPath.getParent,
      s".${targetPath.getName}.__tmp__${System.nanoTime()}")
    try {
      df.coalesce(1).write.options(options).format(format)
        .mode("overwrite").save(tmp.toString)
      val part = f.listStatus(tmp).map(_.getPath)
        .find(p => p.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(
          s"no part file produced under $tmp"))
      if (f.exists(targetPath)) f.delete(targetPath, false)
      if (!f.rename(part, targetPath))
        throw new IllegalStateException(s"rename $part -> $target failed")
    } finally {
      if (f.exists(tmp)) { f.delete(tmp, true); () }
    }
  }

  /** Read a whole (small) file as UTF-8 — test/golden support. */
  def readString(spark: SparkSession, path: String): String = {
    val f = fs(spark, path)
    val in = f.open(new Path(path))
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}
