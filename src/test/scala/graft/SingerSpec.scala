package graft

import graft.conf.GluestickConf
import graft.singer.{SingerOptions, SingerSink}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class SingerSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val noCatalogConf = GluestickConf(Map.empty)

  private def readLines(dir: String, file: String = "data.singer"): Seq[String] =
    new String(Files.readAllBytes(Paths.get(dir, file)),
      java.nio.charset.StandardCharsets.UTF_8).split("\n").toSeq

  test("SCHEMA/RECORD/STATE golden lines with null-field dropping") {
    // ref: src/singer.ts:345-384 message shapes; :361-365 null dropping
    val dir = tmpDir("singer1")
    val df = Seq(
      (1L, Some("Alice"), 9.5, true),
      (2L, None, 1.25, false)).toDF("id", "name", "score", "ok")
    SingerSink.toSinger(df, "users", dir,
      SingerOptions(keys = Seq("id")), noCatalogConf)
    val lines = readLines(dir)
    assert(lines.head ==
      """{"type":"SCHEMA","stream":"users","schema":{"type":["object","null"],"properties":{"id":{"type":["integer","null"]},"name":{"type":["string","null"]},"score":{"type":["number","null"]},"ok":{"type":["boolean","null"]}}},"key_properties":["id"]}""")
    assert(lines.contains(
      """{"type":"RECORD","stream":"users","record":{"id":1,"name":"Alice","score":9.5,"ok":true}}"""))
    // null field dropped entirely from the record
    assert(lines.contains(
      """{"type":"RECORD","stream":"users","record":{"id":2,"score":1.25,"ok":false}}"""))
    assert(lines.last == """{"type":"STATE","value":{}}""")
    assert(lines.length == 4)
  }

  test("datetime columns emit ISO-8601 with 6-digit fraction (P4)") {
    // ref: src/singer.ts:63-73 strftime '%Y-%m-%dT%H:%M:%S.%fZ'
    val dir = tmpDir("singer2")
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:20:30.123456")))
      .toDF("id", "created_at")
    SingerSink.toSinger(df, "t", dir, SingerOptions(), noCatalogConf)
    val lines = readLines(dir)
    assert(lines.head.contains(
      """"created_at":{"format":"date-time","type":["string","null"]}"""))
    assert(lines(1) ==
      """{"type":"RECORD","stream":"t","record":{"id":1,"created_at":"2024-01-01T10:20:30.123456Z"}}""")
  }

  test("struct column: allowObjects=true → object schema + nested record") {
    // schema-driven superset of ref: src/singer.ts:120-127 first-value sniff
    val dir = tmpDir("singer3")
    val df = Seq((1L, ("NYC", 10001))).toDF("id", "addr")
      .withColumnRenamed("addr", "address")
    SingerSink.toSinger(df, "n", dir,
      SingerOptions(allowObjects = true), noCatalogConf)
    val lines = readLines(dir)
    assert(lines.head.contains(
      """"address":{"type":["object","null"],"properties":{"_1":{"type":["string","null"]},"_2":{"type":["integer","null"]}}}"""))
    assert(lines(1) ==
      """{"type":"RECORD","stream":"n","record":{"id":1,"address":{"_1":"NYC","_2":10001}}}""")
  }

  test("struct column: allowObjects=false → string schema + stringified value") {
    // ref: src/singer.ts:131-157
    val dir = tmpDir("singer4")
    val df = Seq((1L, ("NYC", 10001))).toDF("id", "address")
    SingerSink.toSinger(df, "n", dir,
      SingerOptions(allowObjects = false), noCatalogConf)
    val lines = readLines(dir)
    assert(lines.head.contains(""""address":{"type":["string","null"]}"""))
    assert(lines(1) ==
      """{"type":"RECORD","stream":"n","record":{"id":1,"address":"{\"_1\":\"NYC\",\"_2\":10001}"}}""")
  }

  test("append mode interleaves multiple streams into one file") {
    // ref: src/singer.ts:341-342,387-391
    val dir = tmpDir("singer5")
    SingerSink.toSinger(Seq((1L, "a")).toDF("id", "v"), "s1", dir,
      SingerOptions(), noCatalogConf)
    SingerSink.toSinger(Seq((2L, "b")).toDF("id", "v"), "s2", dir,
      SingerOptions(), noCatalogConf)
    val lines = readLines(dir)
    assert(lines.length == 6)
    assert(lines(0).contains("\"SCHEMA\"") && lines(0).contains("\"s1\""))
    assert(lines(2) == """{"type":"STATE","value":{}}""")
    assert(lines(3).contains("\"SCHEMA\"") && lines(3).contains("\"s2\""))
  }

  test("keepNullFields keeps null-valued keys in records") {
    val dir = tmpDir("singer6")
    val df = Seq((1L, Option.empty[String])).toDF("id", "name")
    SingerSink.toSinger(df, "t", dir,
      SingerOptions(keepNullFields = true), noCatalogConf)
    assert(readLines(dir)(1) ==
      """{"type":"RECORD","stream":"t","record":{"id":1,"name":null}}""")
  }

  test("catalog mode re-parses JSON string columns and merges catalog schema") {
    // ref: src/singer.ts:324-328 (parseDfCols) + :161-163 (catalog wins)
    val dir = tmpDir("singer7")
    val props = new ObjectMapper().readTree(
      """{"id": {"type": ["integer", "null"]},
        |"tags": {"type": ["array", "null"]},
        |"profile": {"type": ["object", "null"], "properties": {
        |  "city": {"type": "string"}}}}""".stripMargin)
    val df = Seq(
      (1L, """["a","b"]""", """{"city":"NYC"}"""))
      .toDF("id", "tags", "profile")
    SingerSink.toSinger(df, "u", dir,
      SingerOptions(catalogStream = Some("u")), noCatalogConf,
      catalogLookup = _ => Some(props.asInstanceOf[ObjectNode]))
    val lines = readLines(dir)
    // catalog array prop patched with items:{} on merge
    assert(lines.head.contains(""""tags":{"type":["array","null"],"items":{}}"""))
    // profile re-parsed from JSON string to a real object in the record
    assert(lines(1).contains(""""profile":{"city":"NYC"}"""))
    // catalog mode keeps nulls / no dropping concerns here; STATE trailer
    assert(lines.last == """{"type":"STATE","value":{}}""")
  }

  test("keepUnparsableJson keeps the raw string on parse failure (ref src/singer.ts:208-219)") {
    val dir = tmpDir("singer11")
    val props = new ObjectMapper().readTree(
      """{"id": {"type": ["integer", "null"]},
        |"tags": {"type": ["array", "null"],
        |  "items": {"type": "string"}},
        |"profile": {"type": ["object", "null"], "properties": {
        |  "city": {"type": "string"}}}}""".stripMargin)
    val df = Seq(
      (1L, """["a","b"]""", """{"city":"NYC"}"""), // parseable → normalized
      (2L, """[broken""", """{not json at all"""), // unparseable → verbatim
      (3L, null.asInstanceOf[String], null.asInstanceOf[String]),
      (4L, """["x"]""", """{"city":null}""")) // explicit null survives
      .toDF("id", "tags", "profile")
    SingerSink.toSinger(df, "u", dir,
      SingerOptions(catalogStream = Some("u"), keepUnparsableJson = true),
      noCatalogConf,
      catalogLookup = _ => Some(props.asInstanceOf[ObjectNode]))
    val lines = readLines(dir)
    // column stays a JSON STRING: parseable values normalize, failures
    // survive verbatim — the reference's JSON.parse-catch behavior
    assert(lines(1).contains(""""profile":"{\"city\":\"NYC\"}""""))
    assert(lines(1).contains(""""tags":"[\"a\",\"b\"]""""))
    assert(lines(2).contains(""""profile":"{not json at all""""))
    assert(lines(2).contains(""""tags":"[broken""""))
    assert(lines(3).contains(""""profile":null"""))
    assert(lines(3).contains(""""tags":null"""))
    // explicit JSON null round-trips (JSON.parse parity) — not dropped
    assert(lines(4).contains(""""profile":"{\"city\":null}""""))
  }

  test("USE_CATALOG_SCHEMA env enables catalog mode globally") {
    // ref: src/singer.ts:307
    val dir = tmpDir("singer9")
    val props = new ObjectMapper().readTree(
      """{"id": {"type": ["integer", "null"]},
        |"payload": {"type": ["object", "null"], "properties": {
        |  "x": {"type": "integer"}}}}""".stripMargin)
    val df = Seq((1L, """{"x": 5}""")).toDF("id", "payload")
    SingerSink.toSinger(df, "u", dir, SingerOptions(),
      GluestickConf(Map("USE_CATALOG_SCHEMA" -> "true")),
      catalogLookup = _ => Some(props.asInstanceOf[ObjectNode]))
    val lines = readLines(dir)
    // catalog mode: payload re-typed from JSON string to object
    assert(lines(1).contains(""""payload":{"x":5}"""))
  }

  test("dropAllNullColumns flag implements the reference's dead-code intent") {
    // ref: src/singer.ts:313-322 — default OFF keeps the all-null column
    val dirOff = tmpDir("singer10a"); val dirOn = tmpDir("singer10b")
    val df = Seq((1L, "a", Option.empty[String]),
      (2L, "b", Option.empty[String])).toDF("id", "v", "ghost")
    SingerSink.toSinger(df, "t", dirOff,
      SingerOptions(allowObjects = true), noCatalogConf)
    assert(readLines(dirOff).head.contains("\"ghost\""))
    SingerSink.toSinger(df, "t", dirOn,
      SingerOptions(allowObjects = true, dropAllNullColumns = true),
      noCatalogConf)
    val lines = readLines(dirOn)
    assert(!lines.head.contains("\"ghost\""))
    assert(lines(1) ==
      """{"type":"RECORD","stream":"t","record":{"id":1,"v":"a"}}""")
  }

  test("scale mode (exact=false) produces identical content for one stream") {
    val dir1 = tmpDir("singer8a"); val dir2 = tmpDir("singer8b")
    val df = spark.range(0, 100).selectExpr("id", "concat('v', id) AS v")
    SingerSink.toSinger(df, "s", dir1, SingerOptions(), noCatalogConf)
    SingerSink.toSinger(df, "s", dir2,
      SingerOptions(exact = false), noCatalogConf)
    val exact = readLines(dir1).sorted
    val scale = readLines(dir2).sorted
    assert(exact == scale) // same lines, order may differ in RECORD section
  }
}
