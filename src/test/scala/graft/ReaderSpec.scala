package graft

import graft.sources.{Reader, ReaderOptions}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

class ReaderSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def fixture(): (String, String) = {
    val root = tmpDir("reader")
    val sync = Paths.get(root, "sync-output")
    Files.createDirectories(sync)
    Files.write(sync.resolve("users.csv"),
      ("id,name,balance,active,created_at,extra\n" +
        "1,Alice,12.5,true,2024-01-01 10:20:30.123456,x\n" +
        "2,Bob,7.25,false,2024-01-02,y\n")
        .getBytes(StandardCharsets.UTF_8))
    // dash-truncation + first-wins (ref: src/reader.ts:225-231)
    Files.write(sync.resolve("orders-20240101.csv"),
      "id,total\n10,99.5\n".getBytes(StandardCharsets.UTF_8))
    Files.write(sync.resolve("orders-20240202.csv"),
      "id,total\n11,1.0\n".getBytes(StandardCharsets.UTF_8))
    Files.write(sync.resolve("notes.txt"),
      "ignored".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(root, "catalog.json"),
      """{"streams": [{"stream": "users", "tap_stream_id": "users",
        |  "schema": {"properties": {
        |    "id": {"type": ["integer", "null"]},
        |    "name": {"type": "string"},
        |    "balance": {"type": ["number", "null"]},
        |    "active": {"type": "boolean"},
        |    "created_at": {"anyOf": [
        |      {"type": "string", "format": "date-time"}, {"type": "null"}]}}},
        |  "metadata": [{"breadcrumb": [],
        |    "metadata": {"table-key-properties": ["id"]}}]}]}""".stripMargin
        .getBytes(StandardCharsets.UTF_8))
    (sync.toString, root)
  }

  test("stream discovery: extension filter, dash-truncation, first-wins") {
    val (sync, root) = fixture()
    val r = new Reader(spark, sync, root)
    assert(r.keys == Seq("orders", "users"))
    assert(r.inputFiles("orders").endsWith("orders-20240101.csv"))
  }

  test("single-file dir input: the file itself is the stream") {
    // ref: src/reader.ts:217-219
    val (sync, root) = fixture()
    val r = new Reader(spark, s"$sync/users.csv", root)
    assert(r.keys == Seq("users"))
  }

  test("ignore list removes streams from the registry") {
    val (sync, root) = fixture()
    val r = new Reader(spark, sync, root, ignore = Seq("orders"))
    assert(r.keys == Seq("users"))
  }

  test("unknown stream returns None") {
    val (sync, root) = fixture()
    assert(new Reader(spark, sync, root).get("nope").isEmpty)
  }

  test("CSV catalog typing + parseDates with format fallback") {
    // ref: src/reader.ts:100-128
    val (sync, root) = fixture()
    val df = new Reader(spark, sync, root)
      .get("users", ReaderOptions(
        catalogTypes = true, parseDates = Seq("created_at"))).get
    val t = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(t("id") == LongType)
    assert(t("balance") == DoubleType)
    assert(t("active") == BooleanType)
    assert(t("created_at") == TimestampType)
    assert(t("extra") == StringType) // not in catalog → Utf8 fallback
    val rows = df.orderBy("id").collect()
    assert(rows(0).getTimestamp(4).toString == "2024-01-01 10:20:30.123456")
    assert(rows(1).getTimestamp(4).toString == "2024-01-02 00:00:00.0")
  }

  test("parquet catalog cast is lenient per column (try_cast)") {
    // ref: src/reader.ts:73-81 warn-and-keep on cast failure
    val (sync, root) = fixture()
    val pq = Paths.get(sync, "users.parquet") // replaces csv in registry? no:
    // separate stream name to avoid first-wins with users.csv
    Seq(("1", "Alice"), ("oops", "Bob")).toDF("id", "name")
      .coalesce(1).write.mode("overwrite")
      .parquet(Paths.get(sync, "accounts.parquet").toString)
    // catalog types accounts.id as integer
    Files.write(Paths.get(root, "catalog.json"),
      """{"streams": [{"stream": "accounts", "tap_stream_id": "accounts",
        |  "schema": {"properties": {"id": {"type": ["integer", "null"]}}},
        |  "metadata": []}]}""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val df = new Reader(spark, sync, root)
      .get("accounts", ReaderOptions(catalogTypes = true)).get
    assert(df.schema("id").dataType == LongType)
    val vals = df.orderBy("name").select("id").collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0))
    assert(vals.toSeq == Seq(1L, null)) // "oops" → null, not a task failure
  }

  test("parquet KV footer metadata is actually read (not stubbed)") {
    // upgrade over ref: src/reader.ts:141-160
    val (sync, root) = fixture()
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.mode("overwrite")
      .parquet(Paths.get(sync, "meta.parquet").toString)
    val r = new Reader(spark, sync, root)
    val md = r.getMetadata("meta")
    // Spark always embeds its row-schema under this footer key
    assert(md.contains("org.apache.spark.sql.parquet.row.metadata"))
  }

  test("csvOptions pass through to the CSV source (custom delimiter)") {
    // ref: src/reader.ts:95-98 spread options
    val (sync, root) = fixture()
    Files.write(Paths.get(sync, "pipes.csv"),
      "id|name\n1|Alice\n".getBytes(StandardCharsets.UTF_8))
    val df = new Reader(spark, sync, root)
      .get("pipes", ReaderOptions(csvOptions = Map("sep" -> "|"))).get
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.head.getString(1) == "Alice")
  }

  test("getPk falls back to catalog table-key-properties") {
    // ref: src/reader.ts:179-198
    val (sync, root) = fixture()
    assert(new Reader(spark, sync, root).getPk("users") == Seq("id"))
  }

  test("corrupt file: logs the failure and returns None (ref src/reader.ts:87-90)") {
    val (sync, root) = fixture()
    Files.write(Paths.get(sync, "broken.parquet"),
      "this is not parquet".getBytes(StandardCharsets.UTF_8))

    // capture the Reader's log4j output: warn-and-None, not silent-None
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LogEvent
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val captured = scala.collection.mutable.ArrayBuffer[String]()
    val appender = new AbstractAppender(
      "reader-spec-capture", null, null, true, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        captured.synchronized {
          captured += e.getMessage.getFormattedMessage; ()
        }
    }
    appender.start()
    val logger = LogManager.getLogger(classOf[Reader].getName)
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    logger.addAppender(appender)
    try {
      val r = new Reader(spark, sync, root)
      assert(r.keys.contains("broken")) // discovered by extension...
      assert(r.get("broken").isEmpty)   // ...but unreadable → None
      assert(captured.exists(m =>
        m.contains("Failed to read stream 'broken'")),
        s"expected a read-failure log line, got: $captured")
    } finally {
      logger.removeAppender(appender)
      appender.stop()
    }
  }
}
