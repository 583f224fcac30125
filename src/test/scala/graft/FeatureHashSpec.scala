package graft

import graft.ext.TextStats

import org.scalatest.funsuite.AnyFunSuite

class FeatureHashSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat"),
    (3L, "es", "el gato")).toDF("doc_id", "lang", "text")

  test("buckets are in range and counts conserve the token total") {
    val out = TextStats.hashedFeatures(docs, "lang", "text", 16).collect()
    assert(out.forall { r =>
      val b = r.getLong(r.fieldIndex("bucket")); b >= 0 && b < 16
    })
    val totalTerms =
      out.map(_.getLong(2)).sum // n_terms sums to the exploded token count
    assert(totalTerms == 6 + 3 + 2)
  }

  test("same token always lands in the same bucket (deterministic hash)") {
    val out = TextStats.hashedFeatures(docs, "lang", "text", 16)
    val theBucketEn = TextStats
      .hashedFeatures(Seq((9L, "en", "the")).toDF("doc_id", "lang", "text"),
        "lang", "text", 16)
      .select("bucket").as[Long].head()
    // 'the' occurs 3x in en docs; its bucket row must carry those counts
    val row = out.filter(s"lang = 'en' AND bucket = $theBucketEn")
      .select("n_terms", "n_uniq").as[(Long, Long)].head()
    assert(row._1 >= 3L && row._2 >= 1L)
  }

  test("n_uniq counts distinct tokens per bucket, not occurrences") {
    // one bucket: with numBuckets=1 every token collides there
    val out = TextStats.hashedFeatures(docs, "lang", "text", 1)
      .where("lang = 'en'")
      .select("n_terms", "n_uniq").as[(Long, Long)].head()
    assert(out._1 == 9L) // 6 + 3 tokens
    assert(out._2 == 6L) // the cat sat on mat dog — distinct across docs
  }
}
