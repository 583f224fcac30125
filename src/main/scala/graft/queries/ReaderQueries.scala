package graft.queries

import graft.sources.{Reader, ReaderOptions}

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** End-to-end Reader queries (S1-S4): stream discovery + typed scans through
  * the real [[graft.sources.Reader]], oracle-checked against direct SQL over
  * the same logical table.
  */
object ReaderQueries {

  private val q17Staging = new QuerySpec.StagingCache[String]

  /** Materialize the q17 CSV fixture + catalog.json (test scaffolding, not
    * an operator path). Memoized per sf dir; Bench stages untimed via the
    * spec's setup hook.
    */
  def stageQ17(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    q17Staging.getOrStage(dir) {
      val tmp = Paths.get(QuerySpec.stagedPath("q17_reader_csv", dir))
      val syncDir = tmp.resolve("sync-output")
      Files.createDirectories(syncDir)
      // fixture: nation as CSV named with a date suffix (dash-truncation →
      // stream "nation"); a later-named duplicate that must lose (first-wins).
      val rows = spark.read.parquet(s"$dir/nation.parquet")
        .withColumn("o_observed", lit("batch1"))
        .orderBy("n_nationkey")
        .collect() // 25 rows: fixture generation only
      val header = "n_nationkey,n_name,n_regionkey,o_observed"
      val body = rows.map(r =>
        s"${r.getInt(0)},${r.getString(1)},${r.getInt(2)},${r.getString(3)}")
        .mkString("\n")
      Files.write(syncDir.resolve("nation-20240101.csv"),
        (header + "\n" + body + "\n").getBytes(StandardCharsets.UTF_8))
      Files.write(syncDir.resolve("nation-20240202.csv"),
        (header + "\n0,WRONG,0,loser\n").getBytes(StandardCharsets.UTF_8))
      val catalog =
        """{"streams": [{"stream": "nation", "tap_stream_id": "nation",
          |  "schema": {"properties": {
          |    "n_nationkey": {"type": ["integer", "null"]},
          |    "n_name": {"type": "string"},
          |    "n_regionkey": {"type": ["integer", "null"]},
          |    "o_observed": {"type": "string"}}},
          |  "metadata": [{"breadcrumb": [],
          |    "metadata": {"table-key-properties": ["n_nationkey"]}}]}]}""".stripMargin
      Files.write(tmp.resolve("catalog.json"),
        catalog.getBytes(StandardCharsets.UTF_8))
      tmp.toString
    }

  /** Parquet scan via the stream registry: discovery over the sf dir (S1)
    * then a plain parquet read (S2). No catalog in the sf dir → no casts.
    */
  val q16ReaderParquet: QuerySpec = QuerySpec.oracled(
    "q16_reader_parquet",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey") {
    (spark, dir) =>
      val reader = Reader(spark, dir = Some(dir), root = Some(dir))
      reader.get("nation")
        .getOrElse(sys.error("stream 'nation' not discovered"))
        .orderBy("n_nationkey")
  }

  /** CSV scan with catalog-driven dtypes, dash-truncated stream discovery and
    * first-wins dedup (S1/S3, ref: src/reader.ts:100-128,225-231): the query
    * materializes a tiny CSV fixture + catalog.json into the build dir, then
    * reads it back through the full Reader path. Oracle = the source table.
    * (Driver-side fixture writing is test scaffolding, not an operator path.)
    */
  val q17ReaderCsv: QuerySpec = QuerySpec.oracled(
    "q17_reader_csv",
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
      |  CAST(n_regionkey AS BIGINT) AS n_regionkey, 'batch1' AS o_observed
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
    val tmp = stageQ17(spark, dir)
    val reader = Reader(spark, dir = Some(s"$tmp/sync-output"),
      root = Some(tmp))
    assert(reader.getPk("nation") == Seq("n_nationkey"),
      "catalog PK lookup failed")
    // catalog integer → LongType on the Spark side; the oracle CASTs to
    // BIGINT to match the catalog-dictated types.
    reader.get("nation", ReaderOptions(catalogTypes = true))
      .getOrElse(sys.error("stream 'nation' not discovered"))
      .orderBy("n_nationkey")
  }.withSetup((s, d) => { stageQ17(s, d); () })

  private val q81Staging = new QuerySpec.StagingCache[String]
  private val q82Staging = new QuerySpec.StagingCache[String]

  /** Stage documents as JSONL (one JSON object per line — the tap-output
    * format the reference's JSONL sink produces). Memoized per sf dir.
    */
  def stageQ81(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    q81Staging.getOrStage(dir) {
      val path = QuerySpec.stagedPath("q81_jsonl", dir)
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "text", "n_chars")
        .write.mode("overwrite").json(path)
      path
    }

  /** Stage lineitem as ORC — the columnar format beside parquet that a
    * warehouse migration actually encounters. Memoized per sf dir.
    */
  def stageQ82(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    q82Staging.getOrStage(dir) {
      val path = QuerySpec.stagedPath("q82_orc", dir)
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.mode("overwrite").orc(path)
      path
    }

  /** JSONL source: schema-driven `spark.read.json` over a staged JSONL
    * copy of documents (S3's CSV discipline applied to JSON lines: explicit
    * schema, no inference pass over 100 TB). The oracle aggregates the
    * ORIGINAL parquet — equality proves the JSONL write→read round trip
    * preserves every row and value. Checksums stick to stored integers
    * (`n_chars`), not engine string-length semantics.
    */
  val q81ReaderJsonl: QuerySpec = QuerySpec.oracled(
    "q81_reader_jsonl",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) {
    (spark, dir) =>
      val staged = stageQ81(spark, dir)
      val schema = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "text", "n_chars").schema
      spark.read.schema(schema).json(staged)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").as("id_sum"),
          sum("n_chars").as("chars"))
        .orderBy("lang")
  }.withSetup((s, d) => { stageQ81(s, d); () })

  /** ORC source: q01's flagship agg over a staged ORC copy of lineitem.
    * ORC carries the same column pruning / predicate pushdown machinery as
    * parquet in Spark's vectorized reader; the oracle aggregates the
    * original parquet, so equality proves the ORC round trip is lossless
    * (timestamps included).
    */
  val q82ReaderOrc: QuerySpec = QuerySpec.oracled(
    "q82_reader_orc",
    """SELECT l_returnflag,
      |  count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))) * 100)
      |    AS BIGINT) AS price_cents
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val staged = stageQ82(spark, dir)
    spark.read.orc(staged)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 6))) * 100)
          .cast("long").as("price_cents"))
      .orderBy("l_returnflag")
  }.withSetup((s, d) => { stageQ82(s, d); () })

  /** CSV sink round trip — S7/S12 gate-adjudicated (the sinks were
    * spec-only goldens before this): customer exports through the REAL
    * Export dispatcher (RFC-4180, header, single-file parity mode) and is
    * read back with the original schema; the oracle aggregates the
    * parquet original, so row/hash equality proves the write→read loop
    * lossless. Doubles survive because Spark writes shortest-round-trip
    * decimal text; the aggregate still leaves as integer cents per the
    * determinism rule. The export itself is timed — this row measures the
    * sink, not just the read.
    */
  val q103CsvRoundtrip: QuerySpec = QuerySpec.oracled(
    "q103_csv_roundtrip",
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS bal_cents,
      |  min(c_name) AS first_name, max(c_name) AS last_name
      |FROM customer GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import graft.operators.{Export, ExportOptions}
    val src = spark.read.parquet(s"$dir/customer.parquet")
    val out = QuerySpec.stagedPath("q103_csv_out", dir)
    // hermetic conf: the dispatcher's env hooks (unified names, prefix
    // templating, catalog mode) must not rewire a gate query's file name
    Export.toExport(src, "customer_rt", out,
      ExportOptions(exportFormat = Some("csv")),
      conf = graft.conf.GluestickConf(Map.empty))
    spark.read.schema(src.schema).options(Export.csvWriteOptions)
      .csv(s"$out/customer_rt.csv")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum("c_custkey").as("key_sum"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("bal_cents"),
        min("c_name").as("first_name"), max("c_name").as("last_name"))
      .orderBy("c_mktsegment")
  }

  /** JSONL sink round trip — S9 gate-adjudicated, same contract as q103:
    * export through the dispatcher's line-JSON path, read back with the
    * original schema, aggregate against the parquet original.
    */
  val q104JsonlRoundtrip: QuerySpec = QuerySpec.oracled(
    "q104_jsonl_roundtrip",
    """SELECT c_nationkey, count(*) AS n,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS bal_cents
      |FROM customer GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
    import graft.operators.{Export, ExportOptions}
    val src = spark.read.parquet(s"$dir/customer.parquet")
    val out = QuerySpec.stagedPath("q104_jsonl_out", dir)
    Export.toExport(src, "customer_rt", out,
      ExportOptions(exportFormat = Some("jsonl")),
      conf = graft.conf.GluestickConf(Map.empty))
    spark.read.schema(src.schema).json(s"$out/customer_rt.jsonl")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum("c_custkey").as("key_sum"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
      .orderBy("c_nationkey")
  }

  /** Singer sink round trip — S11 gate-adjudicated end-to-end: customer
    * exports through the real Singer emission (SCHEMA, RECORD×n, STATE
    * message stream), the `data.singer` file is read back as text,
    * RECORD messages parse through `from_json` against the original
    * schema, and the aggregate must equal the parquet original. The out
    * dir is wiped per invocation because the Singer sink APPENDS by
    * contract (reference parity) — a stale file would double rows.
    */
  val q105SingerRoundtrip: QuerySpec = QuerySpec.oracled(
    "q105_singer_roundtrip",
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS bal_cents,
      |  max(c_name) AS last_name
      |FROM customer GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import graft.operators.{Export, ExportOptions}
    import org.apache.spark.sql.types.{StringType, StructType}
    val src = spark.read.parquet(s"$dir/customer.parquet")
    val out = QuerySpec.stagedPath("q105_singer_out", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    Export.toExport(src, "customer_rt", out,
      ExportOptions(exportFormat = Some("singer"),
        keys = Seq("c_custkey")),
      conf = graft.conf.GluestickConf(Map.empty))
    val msgSchema = new StructType()
      .add("type", StringType).add("record", src.schema)
    spark.read.text(s"$out/data.singer")
      .select(from_json(col("value"), msgSchema).as("m"))
      .filter(col("m.type") === "RECORD")
      .select("m.record.*")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("bal_cents"),
        max("c_name").as("last_name"))
      .orderBy("c_mktsegment")
  }

  /** Singer read through the DataSource V2 connector
    * ([[graft.sources.SingerSource]]): documents export through the real
    * sink, then read back with `spark.read.format("graft-singer")` — a
    * first-class partitioned scan with SCHEMA-message schema inference and
    * pushed column pruning (SingerSourceSpec pins the plan evidence) —
    * and the aggregate must equal the parquet original. Distinct from
    * q105, which parses the message file through text + `from_json`; this
    * row adjudicates the CONNECTOR path a user actually mounts.
    */
  val q238SingerSource: QuerySpec = QuerySpec.oracled(
    "q238_singer_source",
    """SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
      |FROM documents GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import graft.operators.{Export, ExportOptions}
    val src = spark.read.parquet(s"$dir/documents.parquet")
    val out = QuerySpec.stagedPath("q238_singer_src", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    Export.toExport(src, "documents_rt", out,
      ExportOptions(exportFormat = Some("singer"),
        keys = Seq("doc_id")),
      conf = graft.conf.GluestickConf(Map.empty))
    spark.read.format("graft-singer").load(s"$out/data.singer")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").as("id_sum"),
        sum("n_chars").as("chars_sum"))
      .orderBy("lang")
  }

  /** Filter + projection THROUGH the Singer connector's pushdown paths —
    * gate-adjudicated (SingerSourceSpec pins the plan evidence; this row
    * pins the values): the predicate evaluates on raw records in the
    * reader (rows never materialize), the projection prunes fields, and
    * the filtered aggregate must equal the parquet original under the
    * same predicate.
    */
  val q244SingerPushdown: QuerySpec = QuerySpec.oracled(
    "q244_singer_pushdown",
    """SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM documents
      |WHERE n_chars >= 300 AND lang <> 'zh'
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import graft.operators.{Export, ExportOptions}
    val src = spark.read.parquet(s"$dir/documents.parquet")
    val out = QuerySpec.stagedPath("q244_singer_pd", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    Export.toExport(src, "documents_pd", out,
      ExportOptions(exportFormat = Some("singer"),
        keys = Seq("doc_id")),
      conf = graft.conf.GluestickConf(Map.empty))
    spark.read.format("graft-singer").load(s"$out/data.singer")
      .filter(col("n_chars") >= 300L && col("lang") =!= "zh")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").as("id_sum"))
      .orderBy("lang")
  }

  /** DSv2 WRITE → DSv2 READ round trip: documents written with
    * `df.write.format("graft-singer")` (per-partition files, temp-and-
    * rename commit) and read back through the same connector, aggregate-
    * matched against the parquet original — both V2 paths adjudicated in
    * one row. Overwrite mode keeps the staged dir idempotent across
    * invocations.
    */
  val q246SingerDsv2Roundtrip: QuerySpec = QuerySpec.oracled(
    "q246_singer_dsv2_roundtrip",
    """SELECT source, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
      |FROM documents GROUP BY source
      |ORDER BY source""".stripMargin) { (spark, dir) =>
    val src = spark.read.parquet(s"$dir/documents.parquet")
    val out = QuerySpec.stagedPath("q246_dsv2_rt", dir)
    src.write.format("graft-singer").mode("overwrite")
      .option("stream", "documents_rt")
      .save(out)
    spark.read.format("graft-singer").load(out)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum("doc_id").as("id_sum"),
        sum("n_chars").as("chars_sum"))
      .orderBy("source")
  }

  /** JSON array sink round trip — S8 gate-adjudicated, completing the
    * sink family (q103 CSV, q104 JSONL, q105 Singer): the pretty-printed
    * single-file JS array (the reference's `JSON.stringify(…, null, 2)`
    * byte format) reads back through Spark's multiLine JSON source and
    * must aggregate-match the original. nation keeps the file small —
    * this sink is the reference-parity path, explicitly NOT the scale
    * sink (the array streams through the driver by design; ExportSpec
    * pins the bytes, this row pins the values).
    */
  val q106JsonArrayRoundtrip: QuerySpec = QuerySpec.oracled(
    "q106_json_array_roundtrip",
    """SELECT n_regionkey, count(*) AS n,
      |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
      |  max(n_name) AS last_name
      |FROM nation GROUP BY n_regionkey
      |ORDER BY n_regionkey""".stripMargin) { (spark, dir) =>
    import graft.operators.{Export, ExportOptions}
    val src = spark.read.parquet(s"$dir/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    val out = QuerySpec.stagedPath("q106_json_out", dir)
    Export.toExport(src, "nation_rt", out,
      ExportOptions(exportFormat = Some("json")),
      conf = graft.conf.GluestickConf(Map.empty))
    spark.read.schema(src.schema).option("multiLine", "true")
      .json(s"$out/nation_rt.json")
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"),
        sum("n_nationkey").as("key_sum"),
        max("n_name").as("last_name"))
      .orderBy("n_regionkey")
  }

  private val q113Staging = new QuerySpec.StagingCache[String]

  /** Hive-partitioned copy of `events` keyed by UTC epoch-day — the layout
    * a date-scoped 100 TB table lives in. Memoized per sf dir; Bench
    * stages it untimed through the setup hook.
    */
  def stageQ113(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    q113Staging.getOrStage(dir) {
      val path = QuerySpec.stagedPath("q113_part_events", dir)
      CoreQueries.events(spark, dir)
        .withColumn("day_idx",
          expr("CAST((ts div 1000) div 86400000000 AS INT)"))
        .repartition(col("day_idx")) // one file per day dir, no small files
        .write.mode("overwrite").partitionBy("day_idx").parquet(path)
      path
    }

  /** Partition pruning over a date-partitioned layout: the day filter is a
    * PARTITION filter, so the scan opens only the 3 matching day
    * directories and never touches the rest of the table — at 100 TB the
    * difference between reading ~10 TB/day × 3 and a full-table scan.
    * PushdownSpec pins the plan shape (PartitionFilters present, exactly
    * 3 partition dirs read); this row adjudicates the values. The oracle
    * recomputes the same day index from raw timestamps.
    */
  val q113PartitionPrune: QuerySpec = QuerySpec.oracled(
    "q113_partition_prune",
    """WITH e AS (
      |  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx,
      |    event_type, value
      |  FROM events)
      |SELECT day_idx, event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM e
      |WHERE day_idx BETWEEN 19725 AND 19727
      |GROUP BY day_idx, event_type
      |ORDER BY day_idx, event_type""".stripMargin) { (spark, dir) =>
    val staged = stageQ113(spark, dir)
    spark.read.parquet(staged)
      .filter(col("day_idx").between(19725, 19727))
      .groupBy(col("day_idx").cast("long").as("day_idx"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .orderBy("day_idx", "event_type")
  }.withSetup((s, d) => { stageQ113(s, d); () })

  private val q119Staging = new QuerySpec.StagingCache[String]

  /** Two parquet batches with DIFFERENT schemas in one dataset dir — the
    * tap-evolved-its-schema scenario the reference's catalog merge
    * (SURVEY §2.4) exists for: batch1 predates the `o_orderpriority` and
    * `o_custkey` columns, batch2 carries them.
    */
  def stageQ119(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    q119Staging.getOrStage(dir) {
      val path = QuerySpec.stagedPath("q119_evolving", dir)
      val o = spark.read.parquet(s"$dir/orders.parquet")
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$path/batch=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"), col("o_custkey"))
        .write.mode("overwrite").parquet(s"$path/batch=2")
      path
    }

  /** Schema evolution on read: `mergeSchema` unions the per-file schemas
    * (old rows surface NULL for later-added columns) — Spark's native form
    * of the reference's recursive catalog merge. Footer-only work: schema
    * merging reads metadata, never data, so it costs O(files), not
    * O(bytes), at 100 TB; the `batch` partition column adjudicates that
    * rows kept their provenance. Oracle = explicit UNION with NULL fill.
    */
  val q119SchemaEvolution: QuerySpec = QuerySpec.oracled(
    "q119_schema_evolution",
    """WITH u AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CAST(NULL AS VARCHAR) AS o_orderpriority, 1 AS batch
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, o_orderpriority, 2 AS batch
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT CAST(batch AS BIGINT) AS batch,
      |  coalesce(o_orderpriority, '<pre-schema>') AS priority,
      |  count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val staged = stageQ119(spark, dir)
    spark.read.option("mergeSchema", "true").parquet(staged)
      .groupBy(col("batch").cast("long").as("batch"),
        coalesce(col("o_orderpriority"), lit("<pre-schema>")).as("priority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy("batch", "priority")
  }.withSetup((s, d) => { stageQ119(s, d); () })

  private val q163Staging = new QuerySpec.StagingCache[String]

  /** Stage the events table as a Z-ORDERED parquet layout
    * ([[graft.ext.ZOrder.writeZOrdered]]) clustered on
    * (user_id % 256, day % 256) at 8 bits/dim into 24 range files.
    * Memoized per sf dir; Bench stages untimed via the setup hook.
    */
  def stageQ163(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    q163Staging.getOrStage(dir) {
      val path = QuerySpec.stagedPath("q163_zorder", dir)
      val e = CoreQueries.events(spark, dir)
        .select(col("event_type"), col("value"),
          (col("user_id") % 256).as("x"),
          (expr("CAST((ts div 1000) div 86400000000 AS BIGINT)") % 256)
            .as("y"))
      graft.ext.ZOrder.writeZOrdered(e, path, "x", "y", 8, 24)
      path
    }

  /** 2-D box scan THROUGH the z-ordered layout (q76 pins the curve
    * arithmetic; ZOrderSpec proves the file pruning; this row runs the
    * end-to-end read a user actually issues): filter on BOTH clustered
    * dimensions over the staged layout, aggregate per event type. Both
    * predicates reach the parquet scan as pushed filters, and because the
    * layout bounds x AND y per file, the reader's footer min/max skip the
    * files outside the box — on a 100 TB table clustered this way the box
    * touches O(box area / file span) files while the same query on a
    * date-sorted layout reads every file for the user-band predicate.
    * The oracle recomputes from the RAW events table, so the result also
    * proves the clustered rewrite lost nothing.
    */
  val q163ZOrderPrunedScan: QuerySpec = QuerySpec.oracled(
    "q163_zorder_pruned_scan",
    """WITH e AS (
      |  SELECT event_type, value, user_id % 256 AS x,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) % 256 AS y
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM e
      |WHERE x BETWEEN 2 AND 9 AND y BETWEEN 16 AND 31
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val staged = stageQ163(spark, dir)
    spark.read.parquet(staged)
      .filter(col("x").between(2, 9) && col("y").between(16, 31))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .orderBy("event_type")
  }.withSetup((s, d) => { stageQ163(s, d); () })

  val all: Seq[QuerySpec] =
    Seq(q16ReaderParquet, q17ReaderCsv, q81ReaderJsonl, q82ReaderOrc,
      q103CsvRoundtrip, q104JsonlRoundtrip, q105SingerRoundtrip,
      q106JsonArrayRoundtrip, q113PartitionPrune, q119SchemaEvolution,
      q163ZOrderPrunedScan, q218CompactionRoundtrip, q229HilbertScan,
      q238SingerSource, q244SingerPushdown, q246SingerDsv2Roundtrip)

  private val q229Staging = new QuerySpec.StagingCache[String]

  /** Stage the events table clustered on the HILBERT curve of
    * (user bucket, day bucket), both scaled to the expression's 16-bit
    * domain (×256) so curve steps align with bucket boundaries. Memoized
    * per sf dir; Bench stages untimed via the setup hook.
    */
  def stageQ229(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    q229Staging.getOrStage(dir) {
      val path = QuerySpec.stagedPath("q229_hilbert", dir)
      val e = CoreQueries.events(spark, dir)
        .select(col("event_type"), col("value"),
          (col("user_id") % 256).as("x"),
          (expr("CAST((ts div 1000) div 86400000000 AS BIGINT)") % 256)
            .as("y"))
      graft.ext.ZOrder.writeHilbertOrdered(
        e.withColumn("hx", col("x") * 256)
          .withColumn("hy", col("y") * 256),
        path, "hx", "hy", numFiles = 24)
      path
    }

  /** 2-D box scan THROUGH the Hilbert-clustered layout — q163's read with
    * the curve swapped ([[graft.ext.ZOrder.writeHilbertOrdered]]): the
    * same class of box predicate reaches the parquet scan pushed, and the
    * continuous curve keeps every file's (x, y) bbox tight even at
    * quadrant boundaries where the Z-layout's diagonal jump widens a
    * file's box to half the plane (HilbertSpec pins that property on the
    * curve itself). The oracle recomputes from the RAW events table, so
    * the clustered rewrite is also proven lossless. The scan drops the
    * staged helper columns, reading only what the box needs.
    */
  lazy val q229HilbertScan: QuerySpec = QuerySpec.oracled(
    "q229_hilbert_scan",
    """WITH e AS (
      |  SELECT event_type, value, user_id % 256 AS x,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) % 256 AS y
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM e
      |WHERE x BETWEEN 4 AND 11 AND y BETWEEN 24 AND 39
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val staged = stageQ229(spark, dir)
    spark.read.parquet(staged)
      .filter(col("x").between(4, 11) && col("y").between(24, 39))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .orderBy("event_type")
  }.withSetup((s, d) => { stageQ229(s, d); () })

  private val q218Staging = new QuerySpec.StagingCache[String]

  /** Stage a deliberately fragmented copy of lineitem (64 small files) —
    * the small-files pathology Compaction exists to fix. Memoized per sf
    * dir; Bench stages it untimed.
    */
  def stageQ218(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    q218Staging.getOrStage(dir) {
      val staged = QuerySpec.stagedPath("q218_frag", dir)
      spark.read.parquet(s"$dir/lineitem.parquet")
        .repartition(64)
        .write.mode("overwrite").parquet(staged)
      staged
    }

  /** Small-file compaction round trip — [[graft.ext.Compaction]]
    * gate-adjudicated (it was spec-only sizing behavior before this): a
    * 64-fragment lineitem copy rewrites through `compactTo` (sampled
    * row-width estimate → rows-per-file cap → one repartition write) and
    * the compacted output is read back and aggregated against the
    * ORIGINAL parquet's oracle — row/hash equality proves the rewrite
    * lossless while CompactionSpec pins the file-sizing contract. The
    * compaction itself is timed: this row measures the rewrite, which at
    * 100 TB is the nightly job that keeps scan parallelism healthy
    * (thousands of KB-files → file-listing and task-startup dominate any
    * downstream query).
    */
  lazy val q218CompactionRoundtrip: QuerySpec = QuerySpec.oracled(
    "q218_compaction_roundtrip",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_sum,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS price_cents
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    val frag = stageQ218(spark, dir)
    val out = QuerySpec.stagedPath("q218_out", dir)
    graft.ext.Compaction.compactTo(
      spark.read.parquet(frag), out, targetFileBytes = 8L * 1024 * 1024)
    spark.read.parquet(out)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty_sum"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("price_cents"))
      .orderBy("l_returnflag", "l_linestatus")
  }.withSetup((s, d) => { stageQ218(s, d); () })
}
