// Dev scaffolding: salting + exploded-overlap cost at sf0.1.
// Run: sbt "runMain graft.tools.ProfileSalting"
package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession

object ProfileSalting {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup cap=0")(Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", bucketCap = 0).count())
    time("cap=0 (unsalted)")(Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", bucketCap = 0).count())
    time("cap=1000 (salted)")(Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", bucketCap = 1000).count())
    time("cap=1000 again")(Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", bucketCap = 1000).count())
    spark.stop()
  }
}
