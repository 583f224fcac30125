package graft

import graft.catalog.CatalogSchema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CatalogSchemaSpec extends AnyFunSuite {

  private val catalogJson =
    """{"streams": [{
      |  "stream": "users", "tap_stream_id": "users",
      |  "schema": {"properties": {
      |    "id": {"type": ["integer", "null"]},
      |    "name": {"type": "string"},
      |    "balance": {"type": ["number", "null"]},
      |    "active": {"type": "boolean"},
      |    "created_at": {"anyOf": [
      |      {"type": "string", "format": "date-time"}, {"type": "null"}]},
      |    "tags": {"type": ["array", "null"]},
      |    "mixed": {"type": ["integer", "string"]},
      |    "profile": {"type": "object", "properties": {
      |      "city": {"type": "string"}, "zip": {"type": "integer"}}},
      |    "scores": {"type": "array", "items": {"type": "number"}}
      |  }},
      |  "metadata": [
      |    {"breadcrumb": ["properties", "id"], "metadata": {"inclusion": "automatic"}},
      |    {"breadcrumb": [], "metadata": {"table-key-properties": ["id", "name"]}}
      |  ]}]}""".stripMargin

  private val catalog = CatalogSchema.parse(catalogJson)
  private val users = catalog.find("users").get

  test("find matches stream or tap_stream_id, misses others") {
    assert(catalog.find("users").isDefined)
    assert(catalog.find("nope").isEmpty)
  }

  test("flat column mapping follows the reference reader") {
    // ref: src/reader.ts:292-321
    val st = CatalogSchema.flatSchema(users,
      Seq("id", "name", "balance", "active", "created_at", "tags", "mixed",
        "extra"))
    def t(n: String) = st(n).dataType
    assert(t("id") == LongType)
    assert(t("name") == StringType)
    assert(t("balance") == DoubleType)
    assert(t("active") == BooleanType)
    assert(t("created_at") == TimestampType) // anyOf prefers format variant
    assert(t("tags") == StringType)          // array → Utf8 fallback
    assert(t("mixed") == StringType)         // non-collapsing union
    assert(t("extra") == StringType)         // not in catalog
    assert(st.fields.forall(_.nullable))
  }

  test("recursive toDataType builds nested types for from_json") {
    val profile = CatalogSchema.toDataType(users.properties.get("profile"))
    assert(profile == StructType(Seq(
      StructField("city", StringType), StructField("zip", LongType))))
    val scores = CatalogSchema.toDataType(users.properties.get("scores"))
    assert(scores == ArrayType(DoubleType, containsNull = true))
  }

  test("tableKeyProperties reads the empty-breadcrumb entry") {
    // ref: src/reader.ts:186-197
    assert(CatalogSchema.tableKeyProperties(users) == Seq("id", "name"))
  }

  test("malformed catalog file yields None") {
    assert(CatalogSchema.parseFile("/nonexistent/catalog.json").isEmpty)
  }
}
