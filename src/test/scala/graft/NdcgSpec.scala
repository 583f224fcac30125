package graft

import graft.ext.Retrieval

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Retrieval.ndcgAtK]]: graded, position-discounted ranking
  * eval with integer micro-unit discounts. Oracle twin: q310.
  */
class NdcgSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def w(r: Int): Long = Retrieval.ndcgWeightMicro(r)

  private def run(
      ranking: Seq[(Int, Int, Long)], // (query_id, rank, doc_id)
      grades: Seq[(Int, Long, Int)], // (query_id, doc_id, grade)
      queries: Seq[Int],
      k: Int = 10) =
    Retrieval.ndcgAtK(
        ranking.toDF("query_id", "rank", "doc_id"),
        grades.toDF("query_id", "doc_id", "grade"),
        queries.toDF("query_id"), "doc_id", k)
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("weights are the fixed micro discounts") {
    assert(w(1) == 1000000L)
    assert(w(3) == 500000L) // 1/log2(4)
    assert(w(7) == 333333L) // 1/log2(8) = 1/3 rounded
  }

  test("ideal ranking scores exactly 1e6 ppm") {
    val out = run(
      ranking = Seq((1, 1, 10L), (1, 2, 11L)),
      grades = Seq((1, 10L, 3), (1, 11L, 1)),
      queries = Seq(1))
    val ideal = 7L * w(1) + 1L * w(2)
    assert(out(1) == ((ideal, ideal, 1000000L)))
  }

  test("swapped ranking pays the exact discount") {
    val out = run(
      ranking = Seq((1, 1, 11L), (1, 2, 10L)), // low grade ranked first
      grades = Seq((1, 10L, 3), (1, 11L, 1)),
      queries = Seq(1))
    val dcg = 1L * w(1) + 7L * w(2)
    val idcg = 7L * w(1) + 1L * w(2)
    assert(out(1) == ((dcg, idcg, dcg * 1000000L / idcg)))
  }

  test("unjudged ranked docs gain zero; ranks beyond k are cut") {
    val out = run(
      ranking = Seq((1, 1, 99L), (1, 2, 10L), (1, 3, 10L)),
      grades = Seq((1, 10L, 2)),
      queries = Seq(1), k = 2)
    assert(out(1)._1 == 3L * w(2), "only the rank-2 judged doc gains")
  }

  test("query with no relevant docs reports zeros, not an absent row") {
    val out = run(
      ranking = Seq((1, 1, 10L)),
      grades = Seq((1, 10L, 1)),
      queries = Seq(1, 2))
    assert(out(2) == ((0L, 0L, 0L)))
  }

  test("query judged but never ranked has dcg 0 and full idcg") {
    val out = run(
      ranking = Seq((1, 1, 10L)),
      grades = Seq((1, 10L, 1), (2, 20L, 2)),
      queries = Seq(1, 2))
    assert(out(2) == ((0L, 3L * w(1), 0L)))
  }
}
