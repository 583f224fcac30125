// Dev scaffolding: fused vs composed fingerprint timing at sf0.1.
// Run: sbt "runMain graft.tools.ProfileFingerprint"
package graft.tools

import graft.ext.TextStats

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileFingerprint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.register(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    docs.count()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime() // warm
      df.agg(sum("fp")).head()
      val warm = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      (0 until 5).foreach(_ => df.agg(sum("fp")).head())
      println(f"$tag: cold $warm%.3f s, warm avg ${(System.nanoTime() - t1) / 5e9}%.3f s")
    }
    time("composed")(docs.select(
      TextStats.fingerprintComposed("text").as("fp")))
    time("fused")(docs.select(TextStats.fingerprint("text").as("fp")))
    spark.stop()
  }
}
