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

  test("bigramSurprisalBits: formulaic text scores fewer bits per bigram") {
    // ten copies of one fixed sentence (fully predictable bigrams) vs one
    // doc scrambling the same vocabulary — conditional entropy separates
    // them where unigram surprisal cannot (identical token multisets)
    val formula = "alpha beta gamma delta alpha beta gamma delta"
    val scramble = "alpha delta beta alpha gamma gamma delta beta"
    val docs = ((1L to 10L).map(i => (i, formula)) :+ (99L, scramble))
      .toDF("doc_id", "text")
    val got = TextStats.bigramSurprisalBits(docs, "doc_id", "text")
      .select("doc_id", "avg_millibits").as[(Long, Long)].collect.toMap
    assert(got(1L) < got(99L),
      s"formulaic=${got(1L)} must score below scrambled=${got(99L)}")
    // single-token and empty docs emit no row
    val tiny = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val rows = TextStats.bigramSurprisalBits(tiny, "doc_id", "text")
      .select("doc_id").as[Long].collect.toSeq
    assert(rows == Seq(3L))
  }

  test("bigram bits are the exact integer floor-log2 of the context ratio") {
    // corpus: "x a", "x b", "x b", "x b" → c(x·)=4; bigram "x a" has
    // c12=1 → bits=floor(log2(4))=2; "x b" c12=3 → floor(log2(4/3))=
    // floor(log2(1))=0 (integer div first: 4 div 3 = 1)
    val docs = Seq((1L, "x a"), (2L, "x b"), (3L, "x b"), (4L, "x b"))
      .toDF("doc_id", "text")
    val got = TextStats.bigramSurprisalBits(docs, "doc_id", "text")
      .select("doc_id", "bigram_bits").as[(Long, Long)].collect.toMap
    assert(got == Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("DSIR selection shifts the mixture toward the target predicate") {
    import graft.ext.Dsir
    // two sublanguages with disjoint vocabulary; target = lang t
    val docs = ((1L to 40L).map(i =>
        (i, "t", s"tea time ${i % 5} brew leaf steep")) ++
      (41L to 120L).map(i =>
        (i, "s", s"iron ore ${i % 7} smelt forge anvil")))
      .toDF("doc_id", "lang", "text")
    val scored = Dsir.importanceScores(docs, "doc_id", "text",
      col("lang") === "t", buckets = 1024, carryCols = Seq("lang"))
    val sel = Dsir.selectTopN(scored, "doc_id", 40)
    val byLang = sel.groupBy("lang").count()
      .as[(String, Long)].collect.toMap
    // the 40 target docs carry target-heavy features — all selected
    assert(byLang.getOrElse("t", 0L) == 40L, byLang.toString)
    // scores are partitioning-invariant (exact integer sums)
    val a = Dsir.importanceScores(docs.repartition(13), "doc_id", "text",
      col("lang") === "t", buckets = 1024)
      .select("doc_id", "score_bits").as[(Long, Long)].collect.toSeq.sorted
    val b = Dsir.importanceScores(docs.repartition(3), "doc_id", "text",
      col("lang") === "t", buckets = 1024)
      .select("doc_id", "score_bits").as[(Long, Long)].collect.toSeq.sorted
    assert(a == b)
  }

  test("DSIR feature table is bucket-bounded and the scoring join broadcasts") {
    import graft.ext.Dsir
    val docs = (1L to 60L).map(i => (i, s"w${i % 9} w${i % 4} w${i % 13}"))
      .toDF("doc_id", "text")
    val pairs = Dsir.hashedFeatures(docs, "doc_id", "text", buckets = 32)
    assert(pairs.select("feat").distinct.count() <= 32)
    assert(pairs.agg(min("feat"), max("feat"))
      .as[(Long, Long)].collect.head._1 >= 0L)
    val scored = Dsir.importanceScores(docs, "doc_id", "text",
      col("doc_id") <= 20L, buckets = 32)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  // ---- trigramBackoffBits (oracle twin: q276) ----

  private def backoff(train: Seq[(Long, String)], score: Seq[(Long, String)]) =
    TextStats.trigramBackoffBits(
      train.toDF("doc_id", "text"), score.toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap

  test("backoff ladder: trigram hit, bigram backoff, unigram backoff, OOV") {
    val train = Seq(1L -> "a b c a b d")
    // train trigrams: (a b c), (b c a), (c a b), (a b d)
    // train bigrams:  a b (x2), b c, c a, b d
    // train unigrams: a=2 b=2 c=1 d=1, N=6
    val out = backoff(train,
      Seq(10L -> "a b c",   // trigram hit: c12(a b)=2, c123=1 → 1 bit
        11L -> "c a b d",   // (c a b) hit: c12(c a)=1,c123=1 → 0 bits;
                            // (a b d) hit: c12(a b)=2, c123=1 → 1 bit
        12L -> "b c d",     // (b c d) unseen tri; bigram (c d) unseen;
                            // unigram d: 2+2+floor(log2(6 div 1))=... lvl2:
                            // 4 + floor(log2(6)) = 4 + 2 = 6 bits
        13L -> "a b z"))    // (a b z) unseen tri, (b z) unseen bigram,
                            // z OOV: 4 + floor(log2(6 div max(0,1))) =
                            // 4 + 2 = 6 bits
    assert(out(10L) == ((1L, 1L, 0L, 0L, 1L, 1000L)))
    assert(out(11L) == ((2L, 2L, 0L, 0L, 1L, 500L)))
    assert(out(12L) == ((1L, 0L, 0L, 1L, 6L, 6000L)))
    assert(out(13L) == ((1L, 0L, 0L, 1L, 6L, 6000L)))
  }

  test("bigram-level backoff pays 2 bits plus the conditional cost") {
    // train: bigram (b e) exists only via trigram (x b e); score (a b e):
    // trigram (a b e) unseen (train has no "a b e"), bigram (b e) seen:
    // c2(b·) counts bigrams starting with b = 1 (b e), c23(b e) = 1 →
    // 2 + floor(log2(1)) = 2 bits, lvl 1
    val out = backoff(Seq(1L -> "x b e"), Seq(20L -> "a b e"))
    assert(out(20L) == ((1L, 0L, 1L, 0L, 2L, 2000L)))
  }

  test("held-out docs score higher than in-train docs on the gate corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextStats.trigramBackoffBits(
      docs.filter(col("doc_id") % 2 === 0), docs, "doc_id", "text")
    val m = got
      .groupBy((col("doc_id") % 2 === 0).as("in_train"))
      .agg(avg(col("avg_millibits")).as("a"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    info(s"avg millibits in-train=${m(true)} held-out=${m(false)}")
    assert(m(false) > m(true),
      "held-out text must be less predictable than training text")
  }

  test("trigram backoff is partition-invariant") {
    val train = Seq(1L -> "a b c a b d", 2L -> "e f g")
    val score = Seq(10L -> "a b c e f g z", 11L -> "q r s")
    val base = backoff(train, score)
    val a = TextStats.trigramBackoffBits(
      train.toDF("doc_id", "text").repartition(7),
      score.toDF("doc_id", "text").repartition(5), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(a == base)
  }

  // ---- perplexityBuckets (oracle twin: q287) ----

  test("perplexity buckets: tertiles are balanced and value-ordered") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val got = TextStats.perplexityBuckets(
      docs.filter(col("doc_id") % 2 === 0), docs,
      "doc_id", "text", "lang").cache()
    try {
      // within every language: max(head) ≤ min(middle) is NOT required
      // (value ties straddle down), but max(head) ≤ max(middle) ≤
      // max(tail) and min ordering per bucket must hold
      val byLang = got.collect()
        .groupBy(_.getString(1))
        .view.mapValues(_.groupBy(_.getString(3))
          .view.mapValues(_.map(_.getLong(2))).toMap).toMap
      byLang.foreach { case (lang, b) =>
        assert(b.keySet == Set("head", "middle", "tail"),
          s"$lang missing a bucket: ${b.keySet}")
        assert(b("head").max <= b("middle").min,
          s"$lang: head must not exceed middle")
        assert(b("middle").max <= b("tail").min,
          s"$lang: middle must not exceed tail")
        // tertile balance within ±1 modulo value ties at the boundary:
        // head is at least ⌈n/3⌉ (ties only grow it)
        val n = b.values.map(_.length).sum
        assert(b("head").length >= (n + 2) / 3 - 1)
      }
    } finally got.unpersist()
  }

  test("boundary value ties all land on the lower bucket") {
    // 6 docs, one language; scores engineered so ranks 2 and 3 tie in
    // value: t1 = value at rank 2 → BOTH tied docs are head
    val train = Seq(0L -> "a b c d e f g h")
    // doc text controls trigram count & hits; simpler: score docs with
    // identical text have identical avg_millibits and must share bucket
    val score = (1L to 6L).map(i =>
      i -> (if (i <= 3) "a b c" else s"z$i y$i x$i w$i"))
    val docs = score.toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = TextStats.perplexityBuckets(
      train.toDF("doc_id", "text"), docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // docs 1-3 share one score (trigram hit), 4-6 share a higher one;
    // t1 = the low value, t2 = the high value → 1-3 head, 4-6 middle
    assert(Seq(1L, 2L, 3L).forall(got(_) == "head"), got.toString)
    assert(Seq(4L, 5L, 6L).forall(got(_) == "middle"), got.toString)
  }

  // ---- vocabCoverageCurve (oracle twin: q290) ----

  test("coverage curve: hand-computed rungs on a tiny corpus") {
    val docs = Seq(1L -> "a a a b b c").toDF("doc_id", "text")
    val got = TextStats.vocabCoverageCurve(docs, "doc_id", "text",
      rungs = Seq(1, 2, 3, 10))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((1L, 3L, 6L, 500000L)))
    assert(got(2L) == ((2L, 5L, 6L, 833333L)))
    assert(got(3L) == ((3L, 6L, 6L, 1000000L)))
    // rung past the vocabulary: covers everything, types cap at vocab
    assert(got(10L) == ((3L, 6L, 6L, 1000000L)))
  }

  test("coverage ranking breaks count ties on token order") {
    val docs = Seq(1L -> "z z y y").toDF("doc_id", "text")
    val got = TextStats.vocabCoverageCurve(docs, "doc_id", "text",
      rungs = Seq(1)).collect().head
    // y and z tie at 2; rank 1 must be y (token asc)
    assert(got.getLong(1) == 1L && got.getLong(2) == 2L)
  }

  test("coverage curve plans TakeOrdered, not a global sort") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextStats.vocabCoverageCurve(docs, "doc_id", "text",
      rungs = Seq(4, 16)).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  // ---- crossEntropySelect (oracle twin: q291) ----

  test("threshold selection equals the rank cut and is domain-shaped") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val n = 40
    val got = TextStats.crossEntropySelect(
      docs.filter(col("source") === "src18"),
      docs.filter(col("doc_id") % 2 === 0),
      docs, "doc_id", "text", n).cache()
    try {
      val rows = got.collect()
      val sel = rows.filter(_.getBoolean(4))
      assert(sel.length == n)
      // lexicographic (diff, id) separation between the two classes
      val maxSel = sel.map(r => (r.getLong(3), r.getLong(0))).max
      val minUnsel = rows.filterNot(_.getBoolean(4))
        .map(r => (r.getLong(3), r.getLong(0))).min
      assert(Ordering[(Long, Long)].lt(maxSel, minUnsel))
      // the in-domain source must be over-represented in the selection
      val srcOf = docs.select("doc_id", "source").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val selShare = sel.count(r => srcOf(r.getLong(0)) == "src18")
        .toDouble / n
      val baseShare = srcOf.values.count(_ == "src18").toDouble /
        srcOf.size
      info(s"src18 share: selected=$selShare corpus=$baseShare")
      assert(selShare > baseShare)
    } finally got.unpersist()
  }

  test("cross-entropy threshold joins broadcast") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextStats.crossEntropySelect(
      docs.filter(col("source") === "src18"),
      docs.filter(col("doc_id") % 2 === 0),
      docs, "doc_id", "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("bucket assignment joins the threshold table broadcast") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextStats.perplexityBuckets(
      docs.filter(col("doc_id") % 2 === 0), docs,
      "doc_id", "text", "lang")
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }
}
