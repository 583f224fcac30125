package graft

import graft.ext.TextStats

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.TextStats.langSpans]]: chunk-level language ID + span
  * merge for multilingual-document splitting. Oracle twin: q318.
  */
class LangSpansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], window: Int = 4, parts: Int = 3) =
    TextStats.langSpans(
        rows.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", window)
      .as[(Long, Long, String, Long, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(r => (r._3, r._4, r._5, r._6)).toSeq
      }

  // 4-token chunks of unambiguous language markers
  private val En = "the and of to"
  private val Es = "el la que y"
  private val De = "der die und das"

  test("a mixed doc splits at the exact chunk boundary") {
    val out = run(Seq(1L -> s"$En $En $Es $Es"))
    assert(out(1L) == Seq(
      ("en", 0L, 1L, 2L),
      ("es", 2L, 3L, 2L)))
  }

  test("alternating languages produce one span per run, not per chunk") {
    val out = run(Seq(1L -> s"$En $Es $Es $En $En $En"))
    assert(out(1L) == Seq(
      ("en", 0L, 0L, 1L),
      ("es", 1L, 2L, 2L),
      ("en", 3L, 5L, 3L)))
  }

  test("marker-free chunks default to en and merge with en neighbors") {
    val out = run(Seq(1L -> s"$En xx yy zz ww $En"))
    assert(out(1L) == Seq(("en", 0L, 2L, 3L)))
  }

  test("chunk score ties resolve by declaration order") {
    // chunk with 1 distinct en marker + 1 distinct de marker → en wins
    val out = run(Seq(1L -> "the der xx yy"))
    assert(out(1L) == Seq(("en", 0L, 0L, 1L)))
  }

  test("trailing partial chunks are scored like any other") {
    val out = run(Seq(1L -> s"$De der und")) // 6 de tokens → chunks 0,1
    assert(out(1L) == Seq(("de", 0L, 1L, 2L)))
  }

  test("partition invariance") {
    val rows = (0L until 12L).map(i =>
      i -> (if (i % 2 == 0) s"$En $Es" else s"$De $De"))
    assert(run(rows, parts = 1) == run(rows, parts = 8))
  }
}
