package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scaffolding: stage-by-stage timing of the MinHash pipeline. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sets = Dedup.withShingles(docs, "doc_id", "text", 3)
    time("shingles count")(sets.count())
    time("shingle rows")(sets.select(explode(col("sh"))).count())
    graft.functions.VectorExpressions.register(spark)
    val hs = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), expr("graft_md5_60(shingle)").as("h"))
    time("hash rows")(hs.count())
    val lanes = (0 until 128).map(i =>
      min(expr(s"(${Dedup.laneA(i)}L * (h % ${Dedup.P}) + ${Dedup.laneB(i)}L) % ${Dedup.P}")).as(s"m$i"))
    val sig = hs.groupBy("doc_id").agg(lanes.head, lanes.tail: _*)
    time("signatures")(sig.count())
    val bucketCols = (0 until 64).map { b =>
      expr(s"concat_ws(':', m${2 * b}, m${2 * b + 1})") }
    val banded = sig.select(col("doc_id"),
      posexplode(array(bucketCols: _*)).as(Seq("band", "bucket")))
    time("banded")(banded.count())
    val l = banded.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
    val r = banded.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    time("candidates")(println("  n_cand=" + cand.count()))
    time("full pipeline")(Dedup.minhashNearDupPairs(
      docs, "doc_id", "text").count())
    spark.stop()
  }
}
