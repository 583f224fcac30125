package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Fixture staging runs untimed via each spec's
  * setup hook, so the timed number is operator time, not file copies. A
  * failing query is reported in an `errors` field and fails the run
  * (non-zero exit) instead of being silently recorded as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.specs.map { spec =>
      spec.setup.foreach { s =>
        try s(spark, sfDir)
        catch { case e: Throwable =>
          errors(spec.name) = s"setup: ${e.getMessage}" }
      }
      val t0 = System.nanoTime()
      // a failed setup dooms the timed run — skip it so the root cause in
      // `errors` isn't overwritten by the secondary failure
      if (!errors.contains(spec.name)) {
        try { spec.fn(spark, sfDir).count(); () }
        catch { case e: Throwable =>
          errors(spec.name) =
            Option(e.getMessage).getOrElse(e.getClass.getName)
        }
      }
      spec.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":" + JsonEscape(v.take(200))
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
