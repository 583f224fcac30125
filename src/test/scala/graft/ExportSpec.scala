package graft

import graft.conf.GluestickConf
import graft.operators.{Export, ExportOptions}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class ExportSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)

  private val conf = GluestickConf(Map.empty)

  test("csv sink writes a single headered file, structs JSON-encoded") {
    // ref: src/etl-utils.ts:71-97 — struct.jsonEncode before writeCSV
    val dir = tmpDir("exp_csv")
    val df = Seq((1L, "Alice", ("123 Main St", "NYC")))
      .toDF("id", "name", "address")
    Export.toExport(df, "out", dir,
      ExportOptions(exportFormat = Some("csv")), conf)
    val content = read(s"$dir/out.csv")
    assert(content.startsWith("id,name,address"))
    assert(content.contains(
      "1,Alice,\"{\"\"_1\"\":\"\"123 Main St\"\",\"\"_2\"\":\"\"NYC\"\"}\""))
  }

  test("jsonl sink writes one JSON object per line, nulls kept") {
    // ref: src/etl-utils.ts:64-69
    val dir = tmpDir("exp_jsonl")
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "v")
    Export.toExport(df, "out", dir,
      ExportOptions(exportFormat = Some("jsonl")), conf)
    val lines = read(s"$dir/out.jsonl").trim.split("\n").toSeq
    assert(lines.contains("""{"id":1,"v":"a"}"""))
    assert(lines.contains("""{"id":2,"v":null}"""))
  }

  test("json sink pretty-prints a JS-style array") {
    // ref: src/etl-utils.ts:59-63 JSON.stringify(records, null, 2)
    val dir = tmpDir("exp_json")
    val df = Seq((1L, "a")).toDF("id", "v")
    Export.toExport(df, "out", dir,
      ExportOptions(exportFormat = Some("json")), conf)
    assert(read(s"$dir/out.json") ==
      "[\n  {\n    \"id\": 1,\n    \"v\": \"a\"\n  }\n]")
  }

  test("parquet sink writes a single readable file") {
    val dir = tmpDir("exp_parq")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Export.toExport(df, "out", dir,
      ExportOptions(exportFormat = Some("parquet")), conf)
    assert(Files.isRegularFile(Paths.get(s"$dir/out.parquet")))
    assert(spark.read.parquet(s"$dir/out.parquet").count() == 2)
  }

  test("name resolution: env override + templated prefix") {
    // ref: src/etl-utils.ts:30-37
    val dir = tmpDir("exp_name")
    val envConf = GluestickConf(Map(
      "HG_UNIFIED_OUTPUT_RAW" -> "unified",
      "TENANT" -> "acme"))
    val df = Seq((1L, "a")).toDF("id", "v")
    Export.toExport(df, "raw", dir,
      ExportOptions(
        exportFormat = Some("jsonl"),
        outputFilePrefix = Some("{tenant}_")), envConf)
    assert(Files.isRegularFile(Paths.get(s"$dir/acme_unified.jsonl")))
  }

  test("default format comes from DEFAULT_EXPORT_FORMAT") {
    // ref: src/etl-utils.ts:24
    val dir = tmpDir("exp_def")
    val envConf = GluestickConf(Map("DEFAULT_EXPORT_FORMAT" -> "jsonl"))
    Export.toExport(Seq((1L, "a")).toDF("id", "v"), "out", dir,
      ExportOptions(), envConf)
    assert(Files.isRegularFile(Paths.get(s"$dir/out.jsonl")))
  }

  test("singer export through the dispatcher writes SCHEMA/RECORD/STATE") {
    // ref: src/etl-utils.ts:48-57 singer branch (explicit keys — the
    // Reader-based PK self-resolution is env-coupled and covered by
    // ReaderSpec.getPk)
    val dir = tmpDir("exp_singer")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Export.toExport(df, "users", dir,
      ExportOptions(exportFormat = Some("singer"), keys = Seq("id")), conf)
    val lines = read(s"$dir/data.singer").trim.split("\n").toSeq
    assert(lines.length == 4)
    assert(lines.head.contains("\"type\":\"SCHEMA\"") &&
      lines.head.contains("\"key_properties\":[\"id\"]"))
    assert(lines.last == """{"type":"STATE","value":{}}""")
  }

  test("directory layout mode writes a parquet directory (scale path)") {
    val dir = tmpDir("exp_dir")
    val df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    Export.toExport(df, "big", dir,
      ExportOptions(exportFormat = Some("parquet"), singleFile = false), conf)
    assert(Files.isDirectory(Paths.get(s"$dir/big.parquet")))
    assert(spark.read.parquet(s"$dir/big.parquet").count() == 1000)
  }
}
