package graft.tools

import graft.operators.AsofJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scaffolding: stage timing for the as-of join query. */
object ProfileAsof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    time("orders count")(orders.count())
    val ded = orders.groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("prev_orderkey"))
      .withColumnRenamed("o_orderdate", "prev_date")
    time("ded")(ded.count())
    val joined = AsofJoin.asofBackward(orders, ded, Seq("o_custkey"),
      "o_orderdate", "prev_date", Seq("prev_orderkey", "prev_date"),
      strict = true)
    time("asof no-sort")(joined.count())
    val full = joined.filter(col("asof_prev_orderkey").isNotNull)
      .select(col("o_orderkey"),
        col("asof_prev_orderkey").as("prev_orderkey"),
        (unix_micros(col("o_orderdate").cast("timestamp")) -
          unix_micros(col("asof_prev_date").cast("timestamp"))).as("gap_us"))
    time("asof + project")(full.count())
    time("asof + orderBy")(full.orderBy("o_orderkey").count())
    spark.stop()
  }
}
