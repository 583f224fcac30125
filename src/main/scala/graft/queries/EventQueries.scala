package graft.queries

import graft.operators.AsofJoin

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-stream operators: the custom as-of join, gap-based sessionization,
  * and a Structured Streaming windowed aggregation whose result is checked
  * against a batch DuckDB oracle (stream/batch consistency).
  */
object EventQueries {

  /** Self as-of: each order matched to the customer's most recent strictly
    * earlier order (right side deduped to one row per (customer, date) so
    * the as-of pick is unambiguous in both engines).
    */
  val q28AsofJoin: QuerySpec = QuerySpec.oracled(
    "q28_asof_join",
    """WITH ded AS (
      |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS prev_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT l.o_orderkey, d.prev_orderkey,
      |  CAST(epoch_us(l.o_orderdate) - epoch_us(d.o_orderdate) AS BIGINT)
      |    AS gap_us
      |FROM orders l ASOF JOIN ded d
      |  ON l.o_custkey = d.o_custkey AND l.o_orderdate > d.o_orderdate
      |ORDER BY l.o_orderkey""".stripMargin) { (spark, dir) =>
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val ded = orders.groupBy("o_custkey", "o_orderdate")
      .agg(max("o_orderkey").as("prev_orderkey"))
      .withColumnRenamed("o_orderdate", "prev_date")
    AsofJoin.asofBackward(
      left = orders,
      right = ded,
      keyCols = Seq("o_custkey"),
      leftTimeCol = "o_orderdate",
      rightTimeCol = "prev_date",
      rightValueCols = Seq("prev_orderkey", "prev_date"),
      strict = true)
      .filter(col("asof_prev_orderkey").isNotNull) // inner-join semantics
      .select(
        col("o_orderkey"),
        col("asof_prev_orderkey").as("prev_orderkey"),
        // o_orderdate arrives as TIMESTAMP_NTZ; with the session pinned to
        // UTC the cast reads it as the same instant DuckDB's epoch_us sees.
        (unix_micros(col("o_orderdate").cast("timestamp")) -
          unix_micros(col("asof_prev_date").cast("timestamp"))).as("gap_us"))
      .orderBy("o_orderkey")
  }

  /** Gap-based sessionization (30-minute inactivity) via lag + running
    * flags — the batch form of session windows.
    */
  val q29Sessionize: QuerySpec = QuerySpec.oracled(
    "q29_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
      |l AS (
      |  SELECT user_id, tus,
      |    lag(tus) OVER (PARTITION BY user_id
      |                   ORDER BY tus, event_id) AS prev
      |  FROM e),
      |f AS (
      |  SELECT user_id, tus,
      |    CASE WHEN prev IS NULL OR tus - prev > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM l)
      |SELECT user_id,
      |  count(*) AS n_events,
      |  CAST(sum(new_sess) AS BIGINT) AS n_sessions,
      |  min(tus) AS first_us,
      |  max(tus) AS last_us
      |FROM f GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val e = CoreQueries.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("tus")) // ns → µs (integer division —
        // a double division would lose precision past 2^53)
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus").asc, col("event_id").asc)
    e.withColumn("prev", lag("tus", 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          col("tus") - col("prev") > 1800000000L, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum("new_sess").as("n_sessions"),
        min("tus").as("first_us"),
        max("tus").as("last_us"))
      .orderBy("user_id")
  }

  /** Structured Streaming tumbling-window counts (6h windows, 1h watermark)
    * over the events file driven as a stream; the oracle recomputes the same
    * windows in batch — stream results must equal batch results.
    */
  val q30StreamingWindow: QuerySpec = QuerySpec.oracled(
    "q30_streaming_window",
    """SELECT
      |  CAST(epoch_us(ts) - epoch_us(ts) % 21600000000 AS BIGINT)
      |    AS window_start_us,
      |  event_type,
      |  count(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start_us, event_type""".stripMargin) { (spark, dir) =>
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file-source streams need a directory: stage the single parquet file
    val staged = new java.io.File("/root/repo/target/tmp/q30_events")
    staged.mkdirs()
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val dst = staged.toPath.resolve("events.parquet")
    java.nio.file.Files.copy(src, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(dst.toString).schema
    val stream = spark.readStream
      .schema(schema)
      .parquet(staged.toString)
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_ts", "1 hour")
      .groupBy(window(col("ts_ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    spark.streams.active
      .filter(_.name == "q30_mem").foreach(_.stop())
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("q30_mem")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table("q30_mem")
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"),
        col("n"))
      .orderBy("window_start_us", "event_type")
  }

  val all: Seq[QuerySpec] =
    Seq(q28AsofJoin, q29Sessionize, q30StreamingWindow)
}
