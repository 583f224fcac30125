package graft.sources

import graft.catalog.CatalogSchema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import java.util.OptionalLong
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.time.{LocalDateTime, OffsetDateTime, ZoneOffset}
import scala.collection.JavaConverters._

/** DataSource V2 batch connector for the Singer message format — the tap
  * side of the reference's sink surface (`/root/reference/src/singer.ts`
  * emits SCHEMA, RECORD×n, STATE; this reads those streams back as a
  * first-class Spark table): `spark.read.format("graft-singer").load(dir)`.
  *
  * Spark-native shape:
  *   - schema comes from the stream's own SCHEMA message (driver reads one
  *     line of one file), converted through the same JSON-schema →
  *     Catalyst mapping the reader contract uses
  *     ([[graft.catalog.CatalogSchema.toDataType]]) — one type system,
  *     no second mapping to drift;
  *   - one `InputPartition` per file, so a directory of per-day Singer
  *     exports scans in parallel across executors exactly like any
  *     file-based source (files sort lexicographically for deterministic
  *     planning); multi-path `load(dir1, dir2)` is honored via the
  *     `paths` option;
  *   - column pruning pushes down ([[SingerScanBuilder.pruneColumns]]):
  *     the per-partition reader materializes ONLY the pruned fields from
  *     each RECORD — a `select(two columns)` never builds the wide row;
  *   - the session's Hadoop configuration rides to the executors as a
  *     serialized key/value map, so `spark.hadoop.*` settings (object
  *     store credentials, filesystem impls) work exactly as they do for
  *     the built-in file sources;
  *   - non-RECORD messages (SCHEMA, STATE) are skipped in the reader, so
  *     interleaved multi-message files stream through without a
  *     pre-filter pass.
  *
  * User-supplied schemas (`supportsExternalMetadata`) are validated at
  * table creation: unsupported Catalyst types fail fast there instead of
  * corrupting rows at scan time. Registered as `graft-singer` via
  * DataSourceRegister (META-INF service entry).
  */
class SingerSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-singer"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = SingerSource.resolvePaths(options.asCaseSensitiveMap())
    val conf = SingerSource.driverHadoopConf()
    val files =
      try SingerSource.listFiles(paths, conf)
      catch { case _: java.io.FileNotFoundException => Nil }
    // an empty/missing target infers an EMPTY schema so that
    // df.write.format("graft-singer").save(<new dir>) works (the write's
    // schema comes from the query); READS of an empty schema fail fast at
    // scan build ([[SingerScanBuilder.build]]) — a stream started on a
    // still-empty export dir must error, not silently drop every record
    if ("state".equalsIgnoreCase(options.get("messages")))
      SingerSource.StateSchema
    else if (files.isEmpty) new StructType()
    else if ("true".equalsIgnoreCase(options.get("mergeSchemas")))
      SingerSource.markInferred(SingerSource.mergedSchema(
        files, conf, Option(options.get("stream")),
        Option(options.get("mergeSchemasDistributedThreshold"))
          .map(_.toInt)
          .getOrElse(SingerSource.DistributedInferenceThreshold)))
    else SingerSource.markInferred(SingerSource.schemaFromFiles(
      files, conf, Option(options.get("stream"))))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val stateMode =
      "state".equalsIgnoreCase(properties.get("messages"))
    if (!stateMode) SingerSource.validateSchema(schema)
    new SingerTable(SingerSource.resolvePaths(properties), schema,
      Option(properties.get("stream")), stateMode)
  }
}

object SingerSource {

  private[sources] val mapper = new ObjectMapper()

  /** Schema of the STATE-message surface (`option("messages","state")`):
    * one row per STATE line — the file it came from and the raw JSON of
    * its `value` payload (Singer bookmarks are tap-defined; parsing is
    * the consumer's business via `from_json`/`get_json_object`).
    */
  val StateSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** Field-metadata marker distinguishing an INFERRED table schema from
    * a user-supplied one. The reader's divergent-SCHEMA fail-fast (see
    * [[SingerPartitionReader]]) only makes sense for inferred schemas —
    * a user who passed `.schema(...)` explicitly chose their projection,
    * and narrowing below a file's SCHEMA is then intent, not silent data
    * loss. DSv2 hands `getTable` the schema with no provenance, so the
    * provenance rides in field metadata (which Spark preserves through
    * the scan plumbing).
    */
  private[sources] val InferredMetaKey = "graft.singer.inferred"

  private[sources] def markInferred(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(metadata =
      new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putBoolean(InferredMetaKey, true)
        .build())))

  private[sources] def isInferred(s: StructType): Boolean =
    s.fields.nonEmpty && s.fields.forall(_.metadata.contains(InferredMetaKey))

  /** The `path` / `paths` (JSON array) options, failing fast if absent. */
  private[sources] def resolvePaths(
      props: java.util.Map[String, String]): Seq[String] = {
    val multi = Option(props.get("paths")).map { json =>
      mapper.readTree(json).elements.asScala.map(_.asText).toSeq
    }
    val single = Option(props.get("path")).toSeq
    val all = multi.getOrElse(Nil) ++ single
    if (all.isEmpty)
      throw new IllegalArgumentException(
        "graft-singer: a path is required — use .load(<path>) or option(\"path\", ...)")
    all
  }

  /** The session's Hadoop conf (driver side) — carries `spark.hadoop.*`. */
  private[sources] def driverHadoopConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  /** Flatten a Configuration to a serializable map (includes defaults). */
  private[sources] def confToMap(conf: Configuration): Map[String, String] =
    conf.iterator.asScala.map(e => e.getKey -> e.getValue).toMap

  private[sources] def confFromMap(m: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Supported Catalyst leaf types; fail fast on anything else. */
  private[sources] def validateSchema(schema: StructType): Unit = {
    def check(dt: DataType, path: String): Unit = dt match {
      case LongType | IntegerType | DoubleType | FloatType | BooleanType |
          StringType | TimestampType | DateType => ()
      case st: StructType =>
        st.fields.foreach(f => check(f.dataType, s"$path.${f.name}"))
      case ArrayType(et, _) => check(et, s"$path[]")
      case other =>
        throw new UnsupportedOperationException(
          s"graft-singer: unsupported type ${other.simpleString} at $path " +
            "(supported: long, int, double, float, boolean, string, " +
            "timestamp, date, struct, array)")
    }
    schema.fields.foreach(f => check(f.dataType, f.name))
  }

  /** All regular files under each path (or the path itself), lexicographic
    * across the whole set for deterministic planning.
    */
  private[sources] def listFiles(
      paths: Seq[String], conf: Configuration): Seq[String] =
    paths.flatMap { path =>
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
      else Seq(p.toString)
    }.sorted

  /** Driver-side schema inference: first SCHEMA message of the first file
    * (or, with `stream` set, the first SCHEMA for THAT stream across the
    * listed files — append-mode export files interleave streams, ref:
    * src/singer.ts:387-391).
    */
  def schemaFromFirstSchemaMessage(
      paths: Seq[String], conf: Configuration,
      stream: Option[String] = None): StructType =
    schemaFromFiles(listFiles(paths, conf), conf, stream)

  private[sources] def schemaFromFiles(
      files: Seq[String], conf: Configuration,
      stream: Option[String] = None): StructType = {
    if (files.isEmpty)
      throw new IllegalArgumentException("graft-singer: no files to infer from")
    // without a stream filter only the FIRST file is probed (one driver
    // read, the common single-stream case); with one, files are scanned in
    // order until the stream's SCHEMA appears
    val probe = if (stream.isEmpty) files.take(1) else files
    val found = probe.iterator.flatMap { f =>
      val in = openLines(f, conf)
      try {
        Iterator.continually(in.readLine()).takeWhile(_ != null)
          .map(mapper.readTree)
          .collectFirst {
            case n if n.path("type").asText == "SCHEMA" &&
                stream.forall(_ == n.path("stream").asText) =>
              val props = n.path("schema").path("properties")
              StructType(props.fieldNames.asScala.toSeq.map { name =>
                StructField(name, CatalogSchema.toDataType(props.get(name)),
                  nullable = true)
              })
          }
      } finally in.close()
    }
    if (found.hasNext) found.next()
    else throw new IllegalArgumentException(
      stream match {
        case Some(s) =>
          s"graft-singer: no SCHEMA message for stream '$s' in " +
            files.mkString(", ")
        case None => s"graft-singer: no SCHEMA message in ${files.head}"
      })
  }

  /** Cross-file schema evolution (`option("mergeSchemas","true")`): every
    * file's SCHEMA message (the selected stream's with `stream` set) is
    * read and the fields union in first-seen order — the connector twin
    * of parquet's `mergeSchema`. Records from a file whose SCHEMA lacks a
    * merged field read that field as NULL (materialization is
    * schema-driven, so the backfill is free). A field declared with two
    * DIFFERENT types across files fails fast: silent coercion picks a
    * winner the user never chose. Real because each export re-infers its
    * own schema (ref: src/singer.ts:34-166) — two exports into one
    * directory CAN legitimately disagree after a tap gained columns.
    *
    * Cost note: below [[DistributedInferenceThreshold]] files, merged
    * inference opens each file ON THE DRIVER and reads to its first
    * matching SCHEMA line (normally line 1) — O(files) driver-side opens,
    * cheapest for the common small-directory case (no job-scheduling
    * overhead). At or above the threshold the probe runs as ONE Spark
    * job (a `parallelize` over the file list, each task reading its
    * files' SCHEMA heads), so a tap directory with 10⁵+ exports never
    * serializes inference through the driver — the driver only folds
    * the per-file field lists (schema-sized, not file-sized). Both paths
    * share [[mergeFieldLists]], so the merged schema and every
    * divergence error are IDENTICAL regardless of which ran. Override
    * the cutover with `option("mergeSchemasDistributedThreshold", n)`.
    */
  private[sources] val DistributedInferenceThreshold: Int = 64

  /** Path dispatcher for mergeSchemas inference: driver probe below the
    * threshold (or when no SparkSession is active — defensive, inference
    * always runs under one), one Spark job at or above it.
    */
  private[sources] def mergedSchema(
      files: Seq[String], conf: Configuration, stream: Option[String],
      threshold: Int): StructType =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession) match {
      case Some(spark) if files.size >= threshold =>
        mergedSchemaFromFilesDistributed(spark, files, conf, stream)
      case _ => mergedSchemaFromFiles(files, conf, stream)
    }

  /** First matching SCHEMA message's fields, in declared order — the
    * per-file probe both merge paths run (driver-side here,
    * executor-side in the distributed path). One export writes one
    * SCHEMA per stream; a file re-declaring its own stream mid-file is
    * outside the Singer contract this source documents.
    */
  private[sources] def firstSchemaFields(
      file: String, conf: Configuration,
      stream: Option[String]): Option[Seq[(String, DataType)]] = {
    val in = openLines(file, conf)
    try {
      Iterator.continually(in.readLine()).takeWhile(_ != null)
        .map(mapper.readTree)
        .collectFirst {
          case n if n.path("type").asText == "SCHEMA" &&
              stream.forall(_ == n.path("stream").asText) => n
        }
        .map { n =>
          val props = n.path("schema").path("properties")
          props.fieldNames.asScala.toSeq.map { name =>
            name -> CatalogSchema.toDataType(props.get(name))
          }
        }
    } finally in.close()
  }

  /** Fold per-file field lists (file order) into the merged schema:
    * fields union in first-seen order; a field declared with two
    * DIFFERENT types across files fails fast — silent coercion picks a
    * winner the user never chose.
    */
  private def mergeFieldLists(
      perFile: Iterable[Seq[(String, DataType)]], files: Seq[String],
      stream: Option[String]): StructType = {
    val merged = scala.collection.mutable.LinkedHashMap[String, DataType]()
    perFile.foreach(_.foreach { case (name, dt) =>
      merged.get(name) match {
        case Some(prev) if prev != dt =>
          throw new IllegalArgumentException(
            s"graft-singer: mergeSchemas found field '$name' " +
              s"declared as ${prev.simpleString} and " +
              s"${dt.simpleString} in different files — " +
              "incompatible SCHEMA evolution cannot merge")
        case Some(_) => ()
        case None => merged.update(name, dt); ()
      }
    })
    if (merged.isEmpty) throw new IllegalArgumentException(
      stream match {
        case Some(s) =>
          s"graft-singer: no SCHEMA message for stream '$s' in " +
            files.mkString(", ")
        case None => s"graft-singer: no SCHEMA message in ${files.mkString(", ")}"
      })
    StructType(merged.toSeq.map { case (n, dt) =>
      StructField(n, dt, nullable = true)
    })
  }

  private[sources] def mergedSchemaFromFiles(
      files: Seq[String], conf: Configuration,
      stream: Option[String] = None): StructType = {
    if (files.isEmpty)
      throw new IllegalArgumentException("graft-singer: no files to infer from")
    // lazy view: a divergence in file 2 throws before file 3 is opened,
    // exactly as the pre-refactor incremental scan did
    mergeFieldLists(
      files.view.map(f => firstSchemaFields(f, conf, stream).getOrElse(Nil)),
      files, stream)
  }

  /** The Spark-job probe: each task opens its files and reads to the
    * first matching SCHEMA line; the driver receives only the per-file
    * field lists (as DataType JSON — stable across serialization) and
    * folds them in LEXICOGRAPHIC FILE ORDER, so the merged field order
    * and every divergence error are byte-identical to the driver path
    * regardless of task scheduling. Slices are capped so a million-file
    * directory doesn't make a million tasks.
    */
  private[sources] def mergedSchemaFromFilesDistributed(
      spark: org.apache.spark.sql.SparkSession, files: Seq[String],
      conf: Configuration, stream: Option[String]): StructType = {
    if (files.isEmpty)
      throw new IllegalArgumentException("graft-singer: no files to infer from")
    // broadcast the SAME conf the driver path probes with (the session
    // conf carries credentials/FS impls the bare SparkContext conf can
    // miss) — file count must never change which filesystem we reach
    val confB = org.apache.spark.graftbench.HadoopConfBroadcast(
      spark.sparkContext, conf)
    val slices = math.max(1,
      math.min(files.size / 8 + 1, spark.sparkContext.defaultParallelism * 4))
    val perFile: Map[String, Seq[(String, String)]] =
      spark.sparkContext.parallelize(files, slices)
        .map { f =>
          f -> firstSchemaFields(f, confB.value, stream)
            .getOrElse(Nil).map { case (n, dt) => (n, dt.json) }
        }
        .collect().toMap
    mergeFieldLists(
      files.map(f => perFile(f).map { case (n, j) =>
        (n, DataType.fromJson(j))
      }),
      files, stream)
  }

  private[sources] def openLines(
      path: String, conf: Configuration): BufferedReader = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    new BufferedReader(
      new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
  }

  /** ISO-8601 → epoch micros; zone-less timestamps (common in third-party
    * taps) read as UTC rather than crashing the scan.
    */
  private[sources] def parseTimestampMicros(text: String): Long = {
    val odt =
      try OffsetDateTime.parse(text)
      catch {
        case _: java.time.format.DateTimeParseException =>
          LocalDateTime.parse(text).atOffset(ZoneOffset.UTC)
      }
    odt.toEpochSecond * 1000000L + odt.getNano / 1000L
  }

  /** JSON node → Catalyst value for `dt`; absent/null → null. Unhandled
    * types are unreachable: [[validateSchema]] rejects them at table
    * creation.
    */
  private[sources] def convert(node: JsonNode, dt: DataType): Any = {
    if (node == null || node.isNull || node.isMissingNode) null
    else dt match {
      case LongType    => if (node.isNumber) node.asLong else null
      case IntegerType => if (node.isNumber) node.asInt else null
      case DoubleType =>
        if (node.isNumber) node.asDouble
        else if (node.isTextual) node.asText match {
          // Jackson serializes non-finite doubles as these strings —
          // parse them back so the write→read round trip is lossless
          case "NaN" => Double.NaN
          case "Infinity" => Double.PositiveInfinity
          case "-Infinity" => Double.NegativeInfinity
          case _ => null
        }
        else null
      case BooleanType => if (node.isBoolean) node.asBoolean else null
      case StringType =>
        UTF8String.fromString(
          if (node.isTextual) node.asText else node.toString)
      case FloatType => if (node.isNumber) node.floatValue else null
      case TimestampType =>
        // malformed values coerce to null like every other primitive
        // (keeps pushed IsNull/IsNotNull consistent with materialization)
        try parseTimestampMicros(node.asText)
        catch { case _: java.time.format.DateTimeParseException => null }
      case DateType =>
        // user-supplied DateType schema over date-time strings: epoch days
        try {
          val us = parseTimestampMicros(node.asText)
          Math.floorDiv(us, 86400000000L).toInt
        } catch { case _: java.time.format.DateTimeParseException => null }
      case st: StructType =>
        InternalRow.fromSeq(st.fields.toSeq.map(f =>
          convert(node.get(f.name), f.dataType)))
      case ArrayType(et, _) =>
        new GenericArrayData(
          node.elements.asScala.toSeq.map(convert(_, et)))
      case other =>
        throw new UnsupportedOperationException(
          s"graft-singer: unsupported type ${other.simpleString}")
    }
  }
}

private[sources] class SingerTable(
    paths: Seq[String], tableSchema: StructType,
    /** When set, only RECORDs of this stream materialize (append-mode
      * export files interleave streams); absent → all RECORDs, the
      * single-stream fast path.
      */
    streamFilter: Option[String] = None,
    /** STATE-message mode: rows are (file, value JSON) per STATE line —
      * the tap-bookmark recovery surface.
      */
    stateMode: Boolean = false)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft-singer:${paths.mkString(",")}"

  override def schema(): StructType = tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = {
        SingerSource.validateSchema(info.schema())
        val stream = info.options().getOrDefault("stream", "stream")
        val ttl = Option(info.options().get("staleTmpTtlMs")).map(_.toLong)
          .getOrElse(SingerBatchWrite.DefaultStaleTmpTtlMs)
        val confMap = SingerSource.confToMap(SingerSource.driverHadoopConf())
        val bw = new SingerBatchWrite(paths.head, info.schema(), stream,
          doTruncate, confMap, ttl)
        new Write {
          override def toBatch: BatchWrite = bw
          override def toStreaming: StreamingWrite = {
            if (doTruncate)
              throw new UnsupportedOperationException(
                "graft-singer: streaming write is append-only (use " +
                  "outputMode(\"append\"))")
            new SingerStreamingWrite(paths.head, info.schema(), stream,
              confMap)
          }
        }
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SingerScanBuilder(paths, tableSchema,
      streamFilter.orElse(Option(options.get("stream"))),
      stateMode || "state".equalsIgnoreCase(options.get("messages")),
      Option(options.get("maxFilesPerTrigger")).map { v =>
        val n =
          try v.toInt
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"graft-singer: maxFilesPerTrigger must be a positive " +
                  s"integer, got '$v'")
          }
        require(n > 0,
          s"graft-singer: maxFilesPerTrigger must be positive, got $n")
        n
      })
}

private[sources] class SingerScanBuilder(
    paths: Seq[String], full: StructType,
    streamFilter: Option[String] = None,
    stateMode: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep declaration order of the full schema for deterministic layout
    val want = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => want.contains(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // state mode: the record-node evaluator doesn't apply — Spark keeps
    // every filter as a residual over the (file, value) rows
    if (stateMode) return filters
    val (supported, rest) =
      filters.partition(SingerFilters.isSupported(full, _))
    pushed = supported
    // pushed filters are evaluated exactly (not best-effort) in the
    // reader, so Spark need not re-apply them — but returning them as
    // residuals anyway would also be correct; we keep them pushed-only
    // for the pruning win to show in the plan
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    if (full.isEmpty)
      throw new IllegalArgumentException(
        s"graft-singer: cannot read ${paths.mkString(", ")} — no files " +
          "found to infer a schema from (supply .schema(...) to read a " +
          "target that will be populated later)")
    new SingerScan(paths, full, required, pushed,
      SingerSource.confToMap(SingerSource.driverHadoopConf()),
      maxFilesPerTrigger, streamFilter, stateMode)
  }
}

/** The comparison subset the reader can evaluate on a raw RECORD before
  * materializing the row: top-level field vs literal, where the field's
  * type is a primitive the source supports. Skipping a record at the
  * JSON-node stage avoids building the InternalRow entirely — the
  * pre-shuffle pruning win for selective ingestion queries.
  */
private[sources] object SingerFilters {

  private def comparable(full: StructType, attr: String, v: Any): Boolean = {
    // both the column type AND the literal's runtime type must be in the
    // evaluable set — a mismatched literal must stay a Spark-side filter,
    // not silently drop rows in the reader
    val colOk = full.fields.find(_.name == attr).exists(_.dataType match {
      case LongType | IntegerType | DoubleType | StringType | BooleanType =>
        true
      case _ => false
    })
    val litOk = v match {
      case _: Long | _: Int | _: Double | _: String | _: Boolean => true
      case _ => false
    }
    colOk && litOk
  }

  def isSupported(full: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, v)            => comparable(full, a, v)
    case GreaterThan(a, v)        => comparable(full, a, v)
    case GreaterThanOrEqual(a, v) => comparable(full, a, v)
    case LessThan(a, v)           => comparable(full, a, v)
    case LessThanOrEqual(a, v)    => comparable(full, a, v)
    case IsNotNull(a)             => full.fieldNames.contains(a)
    case IsNull(a)                => full.fieldNames.contains(a)
    case _                        => false
  }

  /** Evaluate one filter against the record by CONVERTING the field with
    * the same [[SingerSource.convert]] the row materializer uses — pushed
    * filters are not re-applied by Spark, so the evaluation must agree
    * with materialization exactly: a type-mismatched primitive converts
    * to null and never satisfies a comparison (and DOES satisfy IsNull),
    * string columns compare on the coerced text, and doubles use Spark's
    * `-0.0 == 0.0` / NaN-orderable semantics.
    */
  def eval(rec: JsonNode, full: StructType, f: Filter): Boolean = {
    def value(a: String): Any =
      SingerSource.convert(rec.get(a), full(a).dataType)
    def cmp(a: String, v: Any): Option[Int] = (value(a), v) match {
      case (null, _) => None
      case (x: java.lang.Long, y: Long) =>
        Some(java.lang.Long.compare(x, y))
      case (x: java.lang.Long, y: Int) =>
        Some(java.lang.Long.compare(x, y.toLong))
      case (x: java.lang.Integer, y: Int) =>
        Some(java.lang.Integer.compare(x, y))
      case (x: java.lang.Integer, y: Long) =>
        Some(java.lang.Long.compare(x.toLong, y))
      case (x: java.lang.Double, y: Double) =>
        // primitive == first: -0.0 equals 0.0 (Spark normalization);
        // Double.compare then orders NaN largest, matching Spark
        Some(if (x.doubleValue == y) 0 else java.lang.Double.compare(x, y))
      case (x: UTF8String, y: String) => Some(x.toString.compareTo(y))
      case (x: java.lang.Boolean, y: Boolean) =>
        Some(java.lang.Boolean.compare(x, y))
      case _ => None
    }
    f match {
      case EqualTo(a, v)            => cmp(a, v).contains(0)
      case GreaterThan(a, v)        => cmp(a, v).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).exists(_ >= 0)
      case LessThan(a, v)           => cmp(a, v).exists(_ < 0)
      case LessThanOrEqual(a, v)    => cmp(a, v).exists(_ <= 0)
      case IsNotNull(a)             => value(a) != null
      case IsNull(a)                => value(a) == null
      case _                        => true
    }
  }
}

private[sources] class SingerScan(
    paths: Seq[String], full: StructType, required: StructType,
    filters: Array[Filter], confMap: Map[String, String],
    maxFilesPerTrigger: Option[Int] = None,
    streamFilter: Option[String] = None,
    stateMode: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Total byte size of the listed files — the signal Catalyst's
    * broadcast-threshold and AQE decisions need; without it a DSv2 scan
    * defaults to "unknown/huge" and a small Singer dimension never
    * broadcasts. Row count stays empty (counting would read the files).
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes: Long = {
      val conf = SingerSource.confFromMap(confMap)
      SingerSource.listFiles(paths, conf).map { f =>
        val p = new Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum
    }
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def description(): String =
    s"graft-singer ${paths.mkString(",")} " +
      s"ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${filters.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    SingerSource.listFiles(paths, SingerSource.confFromMap(confMap))
      .map(SingerInputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SingerReaderFactory(full, required, filters, confMap, streamFilter,
      stateMode)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SingerMicroBatchStream(paths, full, required, filters, confMap,
      maxFilesPerTrigger, streamFilter, stateMode)
}

/** Offset = how many files of the lexicographically-sorted listing have
  * been consumed, PLUS the name of the last consumed file. The count alone
  * is the position; the name is a tamper-detector: if a file ever arrives
  * sorting before an already-committed file (violating the increasing-name
  * contract), the sorted listing's prefix shifts and `listing(count-1)`
  * stops matching `lastFile` — planInputPartitions fails fast instead of
  * silently re-reading a committed file and permanently skipping the new
  * one. JSON is `{"count":N,"last":"name"}`; a bare integer (the pre-r5
  * checkpoint format) still deserializes, with no name to validate.
  */
private[sources] final case class SingerOffset(
    fileCount: Int, lastFile: Option[String]) extends Offset {
  override def json(): String = lastFile match {
    case Some(f) =>
      s"""{"count":$fileCount,"last":${SingerSource.mapper
        .writeValueAsString(f)}}"""
    case None => fileCount.toString
  }
}

private[sources] object SingerOffset {
  def at(listing: Seq[String], count: Int): SingerOffset =
    SingerOffset(count, if (count > 0) Some(listing(count - 1)) else None)

  def parse(json: String): SingerOffset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val n = SingerSource.mapper.readTree(t)
      SingerOffset(n.path("count").asInt,
        Option(n.get("last")).filter(!_.isNull).map(_.asText))
    } else SingerOffset(t.toInt, None)
  }
}

/** Micro-batch stream over a growing directory of Singer export files.
  *
  * Contract: export files must arrive with lexicographically INCREASING
  * names (the dated-export convention, e.g. `2024-06-01T12-00.singer`) —
  * the offset is a prefix of the sorted listing. This keeps the offset
  * O(1) (count + last file name) instead of a seen-file log; Spark's own
  * FileStreamSource chooses the log. Contract VIOLATIONS are detected,
  * not silently corrupting: the offset embeds the last consumed file
  * name, and planInputPartitions fails fast when the listing shrinks
  * below a committed offset or when the file at the committed boundary
  * no longer matches (i.e. a file arrived sorting before a committed
  * one). Each micro-batch plans one InputPartition per NEW file — the
  * same parallel, pruned reader as the batch path.
  */
private[sources] class SingerMicroBatchStream(
    paths: Seq[String], full: StructType, required: StructType,
    filters: Array[Filter], confMap: Map[String, String],
    maxFilesPerTrigger: Option[Int] = None,
    streamFilter: Option[String] = None,
    stateMode: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // one listing snapshot per trigger: latestOffset() refreshes it and
  // planInputPartitions() slices the SAME snapshot, so a batch never
  // mixes two inconsistent listings (and an object-store dir is listed
  // once per trigger, not twice)
  @volatile private var snapshot: Seq[String] = Nil

  // AvailableNow: the end offset is pinned at stream start so the wrapped
  // run drains exactly the backlog that existed then, in maxFiles chunks
  @volatile private var availableNowTarget: Option[Int] = None

  private def listNow(): Seq[String] =
    SingerSource.listFiles(paths, SingerSource.confFromMap(confMap))

  override def prepareForTriggerAvailableNow(): Unit = {
    snapshot = listNow()
    availableNowTarget = Some(snapshot.size)
  }

  override def initialOffset(): Offset = SingerOffset(0, None)

  override def latestOffset(): Offset = {
    snapshot = listNow()
    SingerOffset.at(snapshot, snapshot.size)
  }

  /** Admission control: `maxFilesPerTrigger` bounds each micro-batch to N
    * new files — the backlog-chunking knob the file sources offer, so a
    * month of export files replays as ordered batches instead of one
    * giant batch (and keep-last downstream semantics see files in order).
    * AvailableNow wraps this and keeps triggering until caught up.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(
      ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val bound = availableNowTarget.getOrElse {
      snapshot = listNow()
      snapshot.size
    }
    val s0 = start.asInstanceOf[SingerOffset].fileCount
    val cap = limit match {
      case m: ReadMaxFiles => math.min(s0 + m.maxFiles, bound)
      case _ => bound
    }
    SingerOffset.at(snapshot, cap)
  }

  override def deserializeOffset(json: String): Offset =
    SingerOffset.parse(json)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[SingerOffset]
    val eo = end.asInstanceOf[SingerOffset]
    val (s, e) = (so.fileCount, eo.fileCount)
    // restart path: offsets can arrive from the checkpoint before any
    // latestOffset() call of this incarnation
    if (snapshot.size < e) snapshot = listNow()
    // Fail fast instead of silently corrupting: a shrunken listing or a
    // file that arrived sorting before a committed file both shift the
    // prefix this offset encodes (duplicated reads + permanent skips).
    if (snapshot.size < e)
      throw new IllegalStateException(
        s"graft-singer: listing has ${snapshot.size} files but the " +
          s"checkpointed offset covers $e — files were deleted or renamed " +
          "under a committed offset")
    def check(o: SingerOffset, what: String): Unit =
      o.lastFile.filter(_ != snapshot(o.fileCount - 1)).foreach { want =>
        throw new IllegalStateException(
          s"graft-singer: $what offset expected file #${o.fileCount} to be " +
            s"'$want' but the sorted listing has " +
            s"'${snapshot(o.fileCount - 1)}' — a file arrived out of " +
            "lexicographic order; the increasing-name contract is violated")
      }
    if (s > 0) check(so, "start")
    if (e > 0) check(eo, "end")
    snapshot.slice(s, e).map(SingerInputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SingerReaderFactory(full, required, filters, confMap, streamFilter,
      stateMode)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

private[sources] final case class SingerInputPartition(file: String)
    extends InputPartition

private[sources] class SingerReaderFactory(
    full: StructType, required: StructType, filters: Array[Filter],
    confMap: Map[String, String], streamFilter: Option[String] = None,
    stateMode: Boolean = false)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[SingerInputPartition].file
    if (stateMode)
      new SingerStatePartitionReader(file, required, confMap, streamFilter)
    else
      new SingerPartitionReader(file, full, required, filters,
        confMap, streamFilter)
  }
}

/** STATE-message reader: one row per STATE line — (file, value JSON).
  * With `streamFilter` set, only STATE lines carrying that stream name
  * (taps that tag their states) pass; untagged STATE lines always pass,
  * since Singer state is global by default.
  */
private[sources] class SingerStatePartitionReader(
    file: String, required: StructType, confMap: Map[String, String],
    streamFilter: Option[String] = None)
    extends PartitionReader[InternalRow] {

  private val in =
    SingerSource.openLines(file, SingerSource.confFromMap(confMap))
  private var row: InternalRow = _
  private val shortName =
    new org.apache.hadoop.fs.Path(file).getName

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val n = SingerSource.mapper.readTree(line)
        val tagged = Option(n.get("stream")).map(_.asText)
        if (n.path("type").asText == "STATE" &&
            (tagged.isEmpty || streamFilter.forall(s => tagged.contains(s)))) {
          val v = n.get("value")
          row = InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
            case "file" => UTF8String.fromString(shortName)
            case "value" =>
              if (v == null || v.isNull) null
              else UTF8String.fromString(v.toString)
            case other => throw new IllegalStateException(
              s"graft-singer state mode: unexpected column $other")
          }))
          return true
        }
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row

  override def close(): Unit = in.close()
}

/** Streams one file, yielding an InternalRow per RECORD message with only
  * the pruned fields materialized. With `streamFilter` set, RECORDs of
  * other streams are skipped at the JSON-node stage (append-mode export
  * files interleave streams; reading stream A's rows through stream B's
  * schema would silently coerce every field).
  */
private[sources] class SingerPartitionReader(
    file: String, full: StructType, required: StructType,
    filters: Array[Filter], confMap: Map[String, String],
    streamFilter: Option[String] = None)
    extends PartitionReader[InternalRow] {

  private val in =
    SingerSource.openLines(file, SingerSource.confFromMap(confMap))
  private var row: InternalRow = _

  private val knownFields = full.fieldNames.toSet
  // the divergence check guards INFERRED schemas only: a user-supplied
  // .schema(...) is a deliberate projection, not silent truncation
  private val strictSchema = SingerSource.isInferred(full)

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val n = SingerSource.mapper.readTree(line)
        val tpe = n.path("type").asText
        if (tpe == "RECORD" &&
            streamFilter.forall(_ == n.path("stream").asText)) {
          val rec = n.path("record")
          // pushed filters run on the raw node BEFORE row materialization
          if (filters.forall(SingerFilters.eval(rec, full, _))) {
            row = InternalRow.fromSeq(required.fields.toSeq.map(f =>
              SingerSource.convert(rec.get(f.name), f.dataType)))
            return true
          }
        } else if (tpe == "SCHEMA" && strictSchema &&
            streamFilter.forall(_ == n.path("stream").asText)) {
          // Divergent-SCHEMA detection: materialization reads ONLY the
          // table schema's fields, so a file whose SCHEMA gained columns
          // (each export re-infers its own, ref: src/singer.ts:34-166)
          // would otherwise silently TRUNCATE every one of its records.
          // Rare line type, set lookup — costs nothing on the data path.
          val extra = n.path("schema").path("properties")
            .fieldNames.asScala.filterNot(knownFields.contains).toSeq
          if (extra.nonEmpty)
            throw new IllegalStateException(
              s"graft-singer: $file declares SCHEMA fields " +
                s"${extra.mkString("[", ", ", "]")} not in the table " +
                "schema — its records would be silently truncated. Read " +
                "with option(\"mergeSchemas\",\"true\") to widen across " +
                "files (missing fields backfill as NULL), or supply an " +
                "explicit .schema(...) covering every file's fields")
        }
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row

  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------------------
// Write path: df.write.format("graft-singer").mode("append"|"overwrite")
// ---------------------------------------------------------------------------

/** Per-partition files with a temp-and-rename commit: each task writes
  * `_tmp-<writeId>/part-<partition>-<task>.singer` (SCHEMA line + RECORD
  * lines, created lazily on the first row so empty partitions leave no
  * file), `commit` moves every temp file into the target directory in one
  * pass (after clearing existing `.singer` files when overwriting), and
  * `abort` deletes the temp dir — a crashed job never leaves torn output
  * visible. The written files read straight back through [[SingerSource]]
  * (each file carries its own SCHEMA message; the reader infers from the
  * first file).
  */
private[sources] class SingerBatchWrite(
    path: String, schema: StructType, stream: String, truncate: Boolean,
    confMap: Map[String, String],
    staleTmpTtlMs: Long = SingerBatchWrite.DefaultStaleTmpTtlMs)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  private val writeId = java.util.UUID.randomUUID.toString

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new SingerWriterFactory(s"$path/_tmp-$writeId", writeId, schema, stream,
      confMap)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val conf = SingerSource.confFromMap(confMap)
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    fs.mkdirs(target)
    // GC _tmp-* leftovers from drivers that crashed before abort() could
    // run; an age gate keeps us from racing a concurrent writer's live
    // tmp dir. Age = the NEWEST mtime anywhere under the dir, not the
    // dir's own: a directory mtime only refreshes on direct child
    // create/delete, so a live concurrent batch whose tasks all opened
    // their files long ago (one slow straggler, a long queue) would look
    // stale by dir-mtime and get deleted mid-commit. Content mtimes keep
    // advancing while any task is still writing. The TTL therefore bounds
    // WRITE inactivity: a writer that goes staleTmpTtlMs with no file
    // progress at all is treated as dead (the `staleTmpTtlMs` option's
    // documented assumption).
    val staleBefore = System.currentTimeMillis() - staleTmpTtlMs
    // A concurrently-committing writer can rename/delete entries out of
    // its own tmp dir while this walk is mid-scan; a vanished path means
    // its owner is ALIVE, so treat any listing/status miss as "fresh"
    // (never GC) rather than letting the FileNotFoundException fail THIS
    // job's commit.
    def newestMtime(p: Path): Long =
      scala.util.Try {
        val st = fs.getFileStatus(p)
        if (!st.isDirectory) st.getModificationTime
        else (st.getModificationTime +:
          fs.listStatus(p).toSeq.map(c => newestMtime(c.getPath))).max
      }.getOrElse(Long.MaxValue)
    fs.listStatus(target).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("_tmp-") && n != s"_tmp-$writeId" &&
          newestMtime(st.getPath) < staleBefore)
        scala.util.Try(fs.delete(st.getPath, true)) // racing owner wins
    }
    // Overwrite crash semantics (documented, not hidden): victims are
    // captured now and deleted only AFTER every rename succeeds. A crash
    // mid-commit therefore leaves old AND new files visible — a reader of
    // the overwrite target sees DUPLICATED rows until the write is retried
    // to completion. The alternative (delete first) risks an empty or
    // partial directory, which is strictly worse; truncate callers who
    // need atomic visibility should write to a fresh directory and swap.
    val oldFiles =
      if (truncate)
        fs.listStatus(target).filter(st =>
          st.isFile && st.getPath.getName.endsWith(".singer"))
          .map(_.getPath).toSeq
      else Nil
    // publish in NAME order: renames are one-at-a-time, and a live
    // micro-batch reader of this directory requires lexicographically
    // increasing arrival (its offset is a sorted-listing prefix)
    messages.collect {
      case SingerCommitMessage(Some(tmp), _) => new Path(tmp)
    }.sortBy(_.getName).foreach { src =>
      val dst = new Path(target, src.getName)
      // file names embed writeId, so dst cannot collide with another
      // job's output; a false rename is therefore a real failure
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"graft-singer: commit rename failed: $src -> $dst")
    }
    oldFiles.foreach(fs.delete(_, false))
    fs.delete(new Path(s"$path/_tmp-$writeId"), true)
    ()
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val conf = SingerSource.confFromMap(confMap)
    val tmp = new Path(s"$path/_tmp-$writeId")
    tmp.getFileSystem(conf).delete(tmp, true)
    ()
  }
}

/** Streaming (micro-batch) write: `df.writeStream.format("graft-singer")`
  * without a `foreachBatch` wrapper — the connector-symmetric egress the
  * batch path already has.
  *
  * Epoch discipline: tasks write into `_tmp-<writeId>/epoch-<id>/`;
  * `commit(epoch)` first DELETES any `epoch-<padded id>-*` files already
  * in the target (leftovers of a pre-crash attempt of the same epoch,
  * possibly from a different incarnation with different partitioning),
  * then renames the new files in. Replaying an epoch after restart is
  * therefore idempotent — the at-least-once redelivery the checkpoint
  * protocol guarantees converges to exactly-once file state once the
  * re-commit completes. Final names are DETERMINISTIC per
  * (epoch, partition) — `epoch-<padded id>-part-<padded pid>.singer`,
  * no task/write ids — so a replayed commit reproduces byte-identical
  * names: a downstream micro-batch reader of this directory whose
  * committed offset pins a pre-crash file name finds the same name
  * after the replay instead of wedging on its out-of-order check.
  * Zero-padding keeps the lexicographically-increasing arrival order
  * the READ side's prefix offset requires: a Singer dir can be both the
  * sink of one query and the source of another. Residual caveat
  * (documented, not hidden): if the replayed epoch runs with FEWER
  * partitions than the crashed attempt, the replacement set is a proper
  * prefix of the old names — a reader whose offset pinned one of the
  * no-longer-produced tail names still fails fast; replay with
  * unchanged partitioning (the checkpointed-plan default) is exact. One
  * streaming query per target directory (the file-sink convention):
  * concurrent queries would collide on epoch numbering.
  */
private[sources] class SingerStreamingWrite(
    path: String, schema: StructType, stream: String,
    confMap: Map[String, String]) extends StreamingWrite {

  private val writeId = java.util.UUID.randomUUID.toString

  private def epochPrefix(epochId: Long): String = f"epoch-$epochId%020d-"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new SingerStreamingWriterFactory(
      s"$path/_tmp-$writeId", writeId, schema, stream, confMap)

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = SingerSource.confFromMap(confMap)
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    fs.mkdirs(target)
    val prefix = epochPrefix(epochId)
    fs.listStatus(target)
      .filter(st => st.isFile && st.getPath.getName.startsWith(prefix))
      .foreach(st => fs.delete(st.getPath, false))
    // publish in name order — the live-reader contract (see batch
    // commit). Final name from (epoch, partition) ONLY: replayed commits
    // must reproduce identical names (scaladoc above)
    messages.collect {
      case SingerCommitMessage(Some(tmp), pid) => (new Path(tmp), pid)
    }.sortBy(_._2).foreach { case (src, pid) =>
      val dst = new Path(target, prefix + f"part-$pid%05d.singer")
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"graft-singer: streaming commit rename failed: $src -> $dst")
    }
    cleanTmp(fs, epochId)
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = SingerSource.confFromMap(confMap)
    val fs = new Path(path).getFileSystem(conf)
    cleanTmp(fs, epochId)
  }

  /** Drop this epoch's tmp subdir, then the `_tmp-<writeId>` parent once
    * empty — micro-batch execution builds a fresh Write (fresh writeId)
    * per epoch, so the parent would otherwise accumulate one empty dir
    * per batch.
    */
  private def cleanTmp(fs: org.apache.hadoop.fs.FileSystem,
      epochId: Long): Unit = {
    val parent = new Path(s"$path/_tmp-$writeId")
    val epochDir = new Path(parent, s"epoch-$epochId")
    if (fs.exists(epochDir)) fs.delete(epochDir, true)
    if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
      fs.delete(parent, true)
    ()
  }
}

private[sources] class SingerStreamingWriterFactory(
    tmpDir: String, writeId: String, schema: StructType, stream: String,
    confMap: Map[String, String]) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new SingerDataWriter(
      f"$tmpDir/epoch-$epochId/part-$partitionId%05d-$taskId-$writeId.singer",
      schema, stream, confMap, partitionId)
}

private[sources] object SingerBatchWrite {
  /** `_tmp-*` dirs older than this are presumed orphans of a crashed
    * driver and GC'd at the next commit; a live concurrent writer's tmp
    * dir stays newer than this as long as its tasks keep writing.
    * Override per write with `.option("staleTmpTtlMs", ...)`.
    */
  val DefaultStaleTmpTtlMs: Long = 24L * 60 * 60 * 1000
}

private[sources] final case class SingerCommitMessage(
    file: Option[String],
    /** The writing task's partition id — the streaming commit derives its
      * DETERMINISTIC final file names from it (see
      * [[SingerStreamingWrite.commit]]); −1 on the batch path, which
      * keeps its writeId-embedding names (cross-job append safety).
      */
    partitionId: Int = -1)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class SingerWriterFactory(
    tmpDir: String, writeId: String, schema: StructType, stream: String,
    confMap: Map[String, String])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new SingerDataWriter(
      // writeId in the FINAL name: partition/task ids are only unique
      // within one application — appends from separate jobs must not
      // collide on part-0-0. Partition id zero-padded so a job with ≥10
      // partitions still publishes in lexicographic order (the
      // micro-batch READER's increasing-name contract holds even when
      // this directory is being streamed while written).
      f"$tmpDir/part-$partitionId%05d-$taskId-$writeId.singer", schema,
      stream, confMap)
}

/** Serializes rows as Singer RECORD messages; the SCHEMA line (built with
  * the sink's own [[graft.singer.SingerSchema.headerMap]] mapping, so the
  * write and read type systems agree) leads the file.
  *
  * Type-widening caveat: Singer's JSON schema has ONE integer type, so an
  * IntegerType column writes as `integer` and reads back as LongType
  * (likewise Float→Double, Date→Timestamp) — values round-trip exactly,
  * declared widths do not. Schema-sensitive callers should cast on read.
  */
private[sources] class SingerDataWriter(
    file: String, schema: StructType, stream: String,
    confMap: Map[String, String], partitionId: Int = -1)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val IsoFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  private var out: java.io.BufferedWriter = _

  private def ensureOpen(): Unit = if (out == null) {
    val p = new Path(file)
    val fs = p.getFileSystem(SingerSource.confFromMap(confMap))
    out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), StandardCharsets.UTF_8))
    out.write(graft.singer.SingerSink.schemaLine(
      stream, graft.singer.SingerSchema.headerMap(schema, allowObjects = true),
      Nil))
    out.newLine()
  }

  private def jsonValue(
      v: Any, dt: DataType): com.fasterxml.jackson.databind.JsonNode = {
    val F = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
    if (v == null) F.nullNode()
    else dt match {
      case LongType      => F.numberNode(v.asInstanceOf[Long])
      case IntegerType   => F.numberNode(v.asInstanceOf[Int])
      case DoubleType    => F.numberNode(v.asInstanceOf[Double])
      // widen to double BEFORE serializing so the decimal written is the
      // exact float value and the read-back DoubleType equals (double)f
      case FloatType     => F.numberNode(v.asInstanceOf[Float].toDouble)
      case BooleanType   => F.booleanNode(v.asInstanceOf[Boolean])
      case StringType    => F.textNode(v.toString)
      case DateType      =>
        // Singer's JSON schema has only date-time; a DATE writes as
        // midnight UTC and reads back as TimestampType
        F.textNode(IsoFmt.format(java.time.LocalDate
          .ofEpochDay(v.asInstanceOf[Int].toLong)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant))
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        F.textNode(IsoFmt.format(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)))
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        val o = F.objectNode()
        st.fields.zipWithIndex.foreach { case (f, i) =>
          o.set[com.fasterxml.jackson.databind.JsonNode](f.name,
            jsonValue(if (row.isNullAt(i)) null
              else row.get(i, f.dataType), f.dataType))
        }
        o
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val a = F.arrayNode()
        (0 until arr.numElements).foreach { i =>
          a.add(jsonValue(if (arr.isNullAt(i)) null
            else arr.get(i, et), et))
        }
        a
      case other =>
        throw new UnsupportedOperationException(
          s"graft-singer write: unsupported type ${other.simpleString}")
    }
  }

  private val fields = schema.fields

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val F = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
    val rec = F.objectNode()
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      rec.set[com.fasterxml.jackson.databind.JsonNode](f.name,
        jsonValue(if (row.isNullAt(i)) null
          else row.get(i, f.dataType), f.dataType))
      i += 1
    }
    val o = F.objectNode()
    o.put("type", "RECORD")
    o.put("stream", stream)
    o.set[com.fasterxml.jackson.databind.JsonNode]("record", rec)
    out.write(SingerSource.mapper.writeValueAsString(o))
    out.newLine()
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (out != null) out.close()
    SingerCommitMessage(if (out != null) Some(file) else None, partitionId)
  }

  override def abort(): Unit = if (out != null) out.close()

  override def close(): Unit = ()
}
