package graft.sources

import graft.catalog.CatalogSchema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.time.OffsetDateTime
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
  *     planning);
  *   - column pruning pushes down ([[SingerScanBuilder.pruneColumns]]):
  *     the per-partition reader materializes ONLY the pruned fields from
  *     each RECORD — a `select(two columns)` never builds the wide row;
  *   - non-RECORD messages (SCHEMA, STATE) are skipped in the reader, so
  *     interleaved multi-message files stream through without a
  *     pre-filter pass.
  *
  * Registered as `graft-singer` via DataSourceRegister (META-INF service
  * entry). Values parse from the RECORD JSON with the null-safe mapping
  * the sink wrote (ISO-8601 timestamps → micros; nested objects/arrays
  * recurse).
  */
class SingerSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-singer"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-singer: path is required"))
    SingerSource.schemaFromFirstSchemaMessage(path)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SingerTable(properties.get("path"), schema)
}

object SingerSource {

  private[sources] val mapper = new ObjectMapper()

  /** All regular files under `path` (or `path` itself), lexicographic. */
  private[sources] def listFiles(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory) fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
      else Seq(p)
    files.map(_.toString).sorted
  }

  /** Driver-side schema inference: first SCHEMA message of the first file. */
  def schemaFromFirstSchemaMessage(path: String): StructType = {
    val first = listFiles(path).headOption.getOrElse(
      throw new IllegalArgumentException(s"graft-singer: no files at $path"))
    val in = openLines(first)
    try {
      Iterator.continually(in.readLine()).takeWhile(_ != null)
        .map(mapper.readTree)
        .collectFirst {
          case n if n.path("type").asText == "SCHEMA" =>
            val props = n.path("schema").path("properties")
            StructType(props.fieldNames.asScala.toSeq.map { name =>
              StructField(name, CatalogSchema.toDataType(props.get(name)),
                nullable = true)
            })
        }
        .getOrElse(throw new IllegalArgumentException(
          s"graft-singer: no SCHEMA message in $first"))
    } finally in.close()
  }

  private[sources] def openLines(path: String): BufferedReader = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    new BufferedReader(
      new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
  }

  /** JSON node → Catalyst value for `dt`; absent/null → null. */
  private[sources] def convert(node: JsonNode, dt: DataType): Any = {
    if (node == null || node.isNull || node.isMissingNode) null
    else dt match {
      case LongType    => if (node.isNumber) node.asLong else null
      case IntegerType => if (node.isNumber) node.asInt else null
      case DoubleType  => if (node.isNumber) node.asDouble else null
      case BooleanType => if (node.isBoolean) node.asBoolean else null
      case StringType =>
        UTF8String.fromString(
          if (node.isTextual) node.asText else node.toString)
      case TimestampType =>
        val odt = OffsetDateTime.parse(node.asText)
        odt.toEpochSecond * 1000000L + odt.getNano / 1000L
      case st: StructType =>
        InternalRow.fromSeq(st.fields.toSeq.map(f =>
          convert(node.get(f.name), f.dataType)))
      case ArrayType(et, _) =>
        new GenericArrayData(
          node.elements.asScala.toSeq.map(convert(_, et)))
      case _ =>
        UTF8String.fromString(node.toString)
    }
  }
}

private[sources] class SingerTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = s"graft-singer:$path"

  override def schema(): StructType = tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SingerScanBuilder(path, tableSchema)
}

private[sources] class SingerScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep declaration order of the full schema for deterministic layout
    val want = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => want.contains(f.name)))
  }

  override def build(): Scan = new SingerScan(path, required)
}

private[sources] class SingerScan(path: String, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-singer $path ReadSchema: ${required.simpleString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    SingerSource.listFiles(path).map(SingerInputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SingerReaderFactory(required)
}

private[sources] final case class SingerInputPartition(file: String)
    extends InputPartition

private[sources] class SingerReaderFactory(required: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SingerPartitionReader(
      p.asInstanceOf[SingerInputPartition].file, required)
}

/** Streams one file, yielding an InternalRow per RECORD message with only
  * the pruned fields materialized.
  */
private[sources] class SingerPartitionReader(
    file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val in = SingerSource.openLines(file)
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        val n = SingerSource.mapper.readTree(line)
        if (n.path("type").asText == "RECORD") {
          val rec = n.path("record")
          row = InternalRow.fromSeq(required.fields.toSeq.map(f =>
            SingerSource.convert(rec.get(f.name), f.dataType)))
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
