package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Singer-catalog handling: JSON catalog → Spark `StructType` + primary keys.
  *
  * Catalog shape (ref: src/reader.ts:5-19):
  * {{{
  * { "streams": [ { "stream", "tap_stream_id",
  *                  "schema": {"properties": {col: jsonSchema}},
  *                  "metadata": [{"breadcrumb": [], "metadata": {...}}] } ] }
  * }}}
  *
  * Two schema derivations exist on purpose:
  *  - [[CatalogSchema.columnType]] — the reference reader's *flat* per-column
  *    mapping (ref: src/reader.ts:280-322): primitives only, anyOf prefers the
  *    variant with a `format`, `date-time` → timestamp, non-collapsing unions
  *    and complex types fall back to string.
  *  - [[CatalogSchema.toDataType]] — *recursive* JSON-schema → DataType used
  *    when re-parsing JSON-encoded object/array columns (`from_json` target,
  *    ref: src/singer.ts:256-281 parses values; we are schema-driven instead —
  *    SURVEY §2.2 P6 documented deviation).
  */
object CatalogSchema {

  private val mapper = new ObjectMapper()

  final case class CatalogStream(
      stream: String,
      tapStreamId: String,
      properties: JsonNode,
      metadata: JsonNode)

  final case class Catalog(streams: Seq[CatalogStream]) {
    /** Match by `stream` or `tap_stream_id` (ref: src/reader.ts:269-271). */
    def find(name: String): Option[CatalogStream] =
      streams.find(s => s.stream == name || s.tapStreamId == name)
  }

  def parse(json: String): Catalog = {
    val root = mapper.readTree(json)
    val streams = Option(root.get("streams")).toSeq
      .flatMap(_.elements().asScala)
      .map { s =>
        CatalogStream(
          stream = Option(s.get("stream")).map(_.asText).getOrElse(""),
          tapStreamId =
            Option(s.get("tap_stream_id")).map(_.asText).getOrElse(""),
          properties = Option(s.get("schema")).flatMap(n =>
            Option(n.get("properties"))).getOrElse(JsonNodeFactory.instance.objectNode()),
          metadata = Option(s.get("metadata"))
            .getOrElse(JsonNodeFactory.instance.arrayNode()))
      }
      .toSeq
    Catalog(streams)
  }

  def parseFile(path: String): Option[Catalog] = {
    val f = new java.io.File(path)
    if (!f.exists()) None
    else
      try Some(parse(new String(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)))
      catch { case _: Exception => None } // ref: src/reader.ts:244-247 warn+null
  }

  /** Resolve `anyOf` by preferring the variant carrying a `format`; otherwise
    * treat as complex (ref: src/reader.ts:284-289).
    */
  private def resolveAnyOf(prop: JsonNode): JsonNode = {
    val anyOf = Option(prop.get("anyOf")).filter(_.isArray)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    if (anyOf.isEmpty) prop
    else anyOf.find(t => t.has("format")).getOrElse {
      val o = JsonNodeFactory.instance.objectNode()
      o.put("type", "object")
      o
    }
  }

  /** Non-null type names of a JSON-schema `type` (string or array form). */
  private def nonNullTypes(prop: JsonNode): Seq[String] =
    Option(prop.get("type")).toSeq.flatMap { t =>
      if (t.isArray) t.elements().asScala.map(_.asText).toSeq
      else Seq(t.asText)
    }.filter(_ != "null")

  /** Flat reader mapping (ref: src/reader.ts:292-321): integer→Long,
    * number→Double, boolean→Boolean, `date-time` format→Timestamp, everything
    * else (string, object, array, non-collapsing union, missing)→String.
    */
  def columnType(prop: JsonNode): DataType = {
    val resolved = resolveAnyOf(prop)
    if (Option(resolved.get("format")).exists(_.asText == "date-time"))
      TimestampType
    else nonNullTypes(resolved) match {
      case Seq("integer") => LongType
      case Seq("number")  => DoubleType
      case Seq("boolean") => BooleanType
      case Seq(_)         => StringType
      case _              => StringType // union / absent → Utf8 fallback
    }
  }

  /** The reader's per-stream schema: one entry per header column; columns not
    * in the catalog get String (ref: src/reader.ts:280-322). All nullable.
    */
  def flatSchema(stream: CatalogStream, headers: Seq[String]): StructType =
    StructType(headers.map { h =>
      val dt = Option(stream.properties.get(h)).map(columnType)
        .getOrElse(StringType)
      StructField(h, dt, nullable = true)
    })

  /** Recursive JSON-schema → Spark DataType, for `from_json` over
    * JSON-encoded object/array columns (schema-driven replacement for the
    * reference's value-sniffing `parseObjs`, ref: src/singer.ts:208-219).
    */
  def toDataType(prop: JsonNode): DataType = {
    val resolved = resolveAnyOf(prop)
    if (Option(resolved.get("format")).exists(_.asText == "date-time"))
      TimestampType
    else nonNullTypes(resolved) match {
      case Seq("integer") => LongType
      case Seq("number")  => DoubleType
      case Seq("boolean") => BooleanType
      case Seq("string")  => StringType
      case Seq("object") =>
        val props = Option(resolved.get("properties"))
          .map(_.fields().asScala.toSeq).getOrElse(Seq.empty)
        if (props.isEmpty) StringType // opaque object → keep JSON string
        else StructType(props.map(e =>
          StructField(e.getKey, toDataType(e.getValue), nullable = true)))
      case Seq("array") =>
        val items = Option(resolved.get("items"))
          .getOrElse(JsonNodeFactory.instance.objectNode())
        ArrayType(toDataType(items), containsNull = true)
      case _ => StringType
    }
  }

  /** `table-key-properties` from the empty-breadcrumb metadata entry
    * (ref: src/reader.ts:186-197).
    */
  def tableKeyProperties(stream: CatalogStream): Seq[String] = {
    val entries = stream.metadata.elements().asScala.toSeq
    entries
      .find(e => Option(e.get("breadcrumb")).exists(b =>
        b.isArray && b.size() == 0))
      .flatMap(e => Option(e.get("metadata")))
      .flatMap(m => Option(m.get("table-key-properties")))
      .filter(_.isArray)
      .map(_.elements().asScala.map(_.asText).toSeq)
      .getOrElse(Seq.empty)
  }
}
