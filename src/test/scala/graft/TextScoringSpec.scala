package graft

import graft.ext.{Similarity, TextStats}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextStats.surprisalBits]] integer-log2 arithmetic,
  * [[TextStats.classifierMargin]] feature extraction, and
  * [[Similarity.labelAudit]] planted-mislabel detection.
  */
class TextScoringSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("surprisalBits computes floor(log2(N div c)) per token") {
    // corpus: "a a a b" + "a b" → counts: a=4, b=2, N=6
    // bits(a) = floor(log2(6 div 4)) = floor(log2(1)) = 0
    // bits(b) = floor(log2(6 div 2)) = floor(log2(3)) = 1
    val docs = Seq((1L, "a a a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextStats.surprisalBits(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect.toSeq
    // doc1: 4 toks, 0+0+0+1 = 1 bit, avg 1000/4 = 250 millibits
    // doc2: 2 toks, 0+1 = 1 bit, avg 500
    assert(got == Seq((1L, 4L, 1L, 250L), (2L, 2L, 1L, 500L)))
  }

  test("classifierMargin features and keep verdict on planted docs") {
    val good = ("the data is good and the model is fine with the results " +
      "of the work and the test is done in the end for the win on " +
      "the table with more of the same and the rest is here to stay " +
      "in a long form") // plenty of stopwords, no digits/uppercase
    val bad = "X9" * 40 // all digits+uppercase, no stopwords
    val docs = Seq((1L, good), (2L, bad)).toDF("doc_id", "text")
    val got = TextStats.classifierMargin(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "keep", "n_digit", "n_upper", "n_stop")
      .as[(Long, Boolean, Long, Long, Long)].collect.toSeq
    assert(got(0)._2, s"good doc should be kept: $got")
    assert(!got(1)._2, s"bad doc should be dropped: $got")
    assert(got(1)._3 == 40L && got(1)._4 == 40L && got(1)._5 == 0L)
  }

  test("classifierMargin is exactly the linear form") {
    val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val r = TextStats.classifierMargin(docs, "doc_id", "text")
      .select("n_toks", "stop_bp", "digit_bp", "upper_bp", "margin")
      .as[(Long, Long, Long, Long, Long)].head
    val (nToks, stopBp, digitBp, upperBp, margin) = r
    val (c, wt, ws, wd, wu) = TextStats.ClassifierWeights
    assert(margin ==
      c + wt * math.min(nToks, 512L) + ws * stopBp -
        wd * digitBp - wu * upperBp)
  }

  test("labelAudit flags a planted mislabel inside a tight cluster") {
    // 6 near-identical vectors (same LSH bucket), 5 labeled 1, one labeled
    // 9 → the mislabeled row must disagree with its neighbors' vote; the
    // correctly-labeled rows must agree.
    val dim = 8
    def vec(eps: Float): Array[Float] =
      Array.tabulate(dim)(i => (if (i == 0) 1f else 0.01f * i) + eps)
    val rows = (0 until 6).map { i =>
      (i.toLong, vec(0.001f * i), if (i == 5) 9 else 1)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.labelAudit(emb, "vec_id", "embedding", "label",
        k = 5, numPlanes = 4, dim = dim)
      .orderBy("vec_id")
      .select("vec_id", "label", "n_neigh", "top_label", "agree")
      .as[(Long, Long, Long, Long, Boolean)].collect.toSeq
    assert(got.size == 6)
    got.foreach { case (id, label, nNeigh, topLabel, agree) =>
      assert(nNeigh == 5L, s"row $id should see 5 neighbors")
      assert(topLabel == 1L, s"majority label is 1 for row $id")
      assert(agree == (label == 1L), s"agreement wrong for row $id")
    }
  }

  test("labelAudit emits NULL verdict for bucket-isolated rows") {
    // two orthogonal-ish vectors in different buckets → no neighbors
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(-1f, 0.5f, 0f, 0f), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelAudit(emb, "vec_id", "embedding", "label",
        k = 3, numPlanes = 4, dim = 4)
      .orderBy("vec_id")
    val rows = got.collect()
    // buckets may or may not collide depending on the planes; assert the
    // invariant: n_neigh == 0 ⟺ top_label IS NULL ⟺ agree IS NULL
    rows.foreach { r =>
      val nNeigh = r.getAs[Long]("n_neigh")
      assert((nNeigh == 0L) == r.isNullAt(r.fieldIndex("top_label")))
      assert((nNeigh == 0L) == r.isNullAt(r.fieldIndex("agree")))
    }
  }
}
