package graft

import graft.ext.Search

import org.scalatest.funsuite.AnyFunSuite

/** [[Search.literalMatches]] (index soundness against brute force, tricky
  * trigram cases) and [[Search.phraseMatches]] (adjacency, multiplicity).
  */
class SearchSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("literalMatches equals brute-force contains, tricky trigrams") {
    val docs = Seq(
      (1L, "aaaa bbbb"), // repeated trigram inside a match
      (2L, "aa abab"), // has 'aaa'? no — must NOT match 'aaaa'
      (3L, "xaaaax"), // match inside a longer run
      (4L, "ab"), // sub-3-char doc
      (5L, "the aaaa")).toDF("doc_id", "text")
    val patterns = Seq((1, "aaaa"), (2, "ab"), (3, "bbbb"))
    // pattern 'ab' (< 3 chars) must be rejected loudly, not mis-indexed
    intercept[IllegalArgumentException] {
      Search.literalMatches(docs, "doc_id", "text", patterns)
    }
    val ok = patterns.filter(_._2.length >= 3)
    val got = Search.literalMatches(docs, "doc_id", "text", ok)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val brute = (for {
      (pid, pat) <- ok
      row <- docs.collect()
      if row.getString(1).contains(pat)
    } yield (pid, row.getLong(0))).toSet
    assert(got == brute)
    assert(got.contains((1, 1L)) && got.contains((1, 3L)) &&
      got.contains((1, 5L)) && !got.exists(_ == (1, 2L)))
  }

  test("phraseMatches finds every adjacency, not substrings") {
    val docs = Seq(
      (1L, "big table scan now"),
      (2L, "table scan table scan"), // two occurrences
      (3L, "table big scan"), // not adjacent
      (4L, "stable scanner")) // substring but not these tokens
      .toDF("doc_id", "text")
    val got = Search.phraseMatches(docs, "doc_id", "text",
      Seq((7, "table", "scan")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((7, 1L, 1L), (7, 2L, 0L), (7, 2L, 2L)))
  }
}
