package graft.singer

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Singer JSON-schema generation: a pure `StructType → schema` fold.
  *
  * The reference sniffs JS values per column because Polars frames can hold
  * opaque objects (ref: src/singer.ts:34-166 genSingerHeader,
  * src/singer.ts:168-191 toSingerSchema). Spark columns always carry a
  * DataType, so the "merge keys across rows" behavior is subsumed by schema
  * unification at read time and the whole generator is schema-driven
  * (SURVEY §2.4) — no data pass, O(schema) not O(rows).
  *
  * TYPE_MAPPING parity (ref: src/singer.ts:22-32), key order preserved via
  * Jackson's insertion-ordered ObjectNode to match JS `JSON.stringify`.
  */
object SingerSchema {

  private val F = JsonNodeFactory.instance

  private def typeArray(names: String*): ObjectNode = {
    val o = F.objectNode()
    val arr = F.arrayNode()
    names.foreach(arr.add)
    o.set[ObjectNode]("type", arr)
    o
  }

  /** {"type":["number","null"]} etc. (ref: src/singer.ts:22-32). */
  def floatProp: ObjectNode = typeArray("number", "null")
  def intProp: ObjectNode = typeArray("integer", "null")
  def boolProp: ObjectNode = typeArray("boolean", "null")
  def strProp: ObjectNode = typeArray("string", "null")

  /** {"format":"date-time","type":["string","null"]} — format first, as the
    * reference's literal (ref: src/singer.ts:27-30).
    */
  def dateProp: ObjectNode = {
    val o = F.objectNode()
    o.put("format", "date-time")
    val arr = F.arrayNode(); arr.add("string"); arr.add("null")
    o.set[ObjectNode]("type", arr)
    o
  }

  /** Property schema for one Spark type. Datetime columns are declared as
    * ISO strings (the sink formats them, P4); structs/arrays recurse
    * (schema-driven superset of the reference's first-value sniffing,
    * ref: src/singer.ts:89-127).
    */
  def propertyFor(dt: DataType): ObjectNode = dt match {
    case TimestampType | TimestampNTZType | DateType => dateProp
    case DoubleType | FloatType | _: DecimalType     => floatProp
    case LongType | IntegerType | ShortType | ByteType => intProp
    case BooleanType => boolProp
    case st: StructType =>
      val o = typeArray("object", "null")
      val props = F.objectNode()
      st.fields.foreach(f => props.set[ObjectNode](f.name, propertyFor(f.dataType)))
      o.set[ObjectNode]("properties", props)
      o
    case at: ArrayType =>
      val o = typeArray("array", "null")
      o.set[ObjectNode]("items", propertyFor(at.elementType))
      o
    case _ => strProp // Binary, String, Map, anything else → string
  }

  /** Full header map {"type":["object","null"],"properties":{...}}
    * (ref: src/singer.ts:41). When `allowObjects` is false, complex columns
    * are declared string — the sink JSON-stringifies their values
    * (ref: src/singer.ts:131-157).
    */
  def headerMap(schema: StructType, allowObjects: Boolean): ObjectNode = {
    val o = typeArray("object", "null")
    val props = F.objectNode()
    schema.fields.foreach { f =>
      val p = f.dataType match {
        case _: StructType | _: ArrayType if !allowObjects => strProp
        case dt => propertyFor(dt)
      }
      props.set[ObjectNode](f.name, p)
    }
    o.set[ObjectNode]("properties", props)
    o
  }

  /** Catalog properties merged over inferred, catalog wins per column
    * (ref: src/singer.ts:161-163). Array-typed catalog props missing
    * `items` get `items:{}` (ref: src/singer.ts:244-251).
    */
  def mergeCatalog(header: ObjectNode, catalogProps: JsonNode): ObjectNode = {
    val props = header.get("properties").asInstanceOf[ObjectNode]
    catalogProps.fields().asScala.foreach { e =>
      val patched = e.getValue match {
        case o: ObjectNode =>
          val isArray = Option(o.get("type")).exists { t =>
            (t.isTextual && t.asText == "array") ||
            (t.isArray && t.elements().asScala.exists(_.asText == "array"))
          }
          if (isArray && !o.has("items")) {
            val c = o.deepCopy[ObjectNode](); c.set[ObjectNode]("items", F.objectNode()); c
          } else o
        case other => other
      }
      props.set[JsonNode](e.getKey, patched)
    }
    header
  }
}
