package graft

import graft.ext.TextStats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextStats.spanCorrupt]]: T5 denoising-pair construction.
  * Oracle twin: q297.
  */
class SpanCorruptSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  private lazy val rows = TextStats.spanCorrupt(
    docs, "doc_id", "text", rate = 20, spanLen = 3, salt = "t5")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getString(4)))

  test("inputs and targets reconstruct the original token stream") {
    val original = docs
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
          .as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { case (id, nTok, nSpans, inp, tgt) =>
      // target splits into nSpans chunks at its sentinels; substituting
      // chunk k for <extra_id_k> in the input must give the original
      val sentinel = "<extra_id_(\\d+)>".r
      val tgtParts = tgt.split("<extra_id_\\d+>").map(_.trim)
        .filter(_.nonEmpty) // chunk k follows sentinel k
      val tgtIds = sentinel.findAllMatchIn(tgt).map(_.group(1).toInt)
        .toSeq
      assert(tgtIds == (0 to nSpans.toInt), s"doc $id sentinels $tgtIds")
      val rebuilt = inp.split("\\s+").toSeq.flatMap { t =>
        sentinel.findFirstMatchIn(t) match {
          case Some(m) => tgtParts(m.group(1).toInt).split("\\s+").toSeq
          case None => Seq(t)
        }
      }
      assert(rebuilt == original(id),
        s"doc $id: reconstruction mismatch")
      assert(rebuilt.size == nTok)
    }
    assert(rows.exists(_._3 > 0), "no doc got any span — rate too low")
    assert(rows.exists(_._3 == 0), "every doc corrupted — fixture weak")
  }

  test("masked fraction is near spanLen/rate on the corpus") {
    val totTok = rows.map(_._2).sum.toDouble
    val masked = rows.map { case (_, n, _, inp, _) =>
      n - inp.split("\\s+").count(!_.startsWith("<extra_id_"))
    }.sum.toDouble
    val frac = masked / totTok
    info(f"masked fraction $frac%.4f (expected ~0.15)")
    assert(frac > 0.05 && frac < 0.3)
  }

  test("span corruption is partition-invariant") {
    val a = TextStats.spanCorrupt(docs.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = TextStats.spanCorrupt(docs.repartition(2), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  // ---- fimTransform (oracle twin: q298) ----

  test("FIM parts reassemble to the original in PSM order") {
    val original = docs
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
          .as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fim = TextStats.fimTransform(docs, "doc_id", "text").collect()
    fim.foreach { r =>
      val (id, n, c1, c2, text) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getString(4))
      assert(0 <= c1 && c1 <= c2 && c2 <= n, s"doc $id cuts $c1/$c2/$n")
      val pi = text.indexOf("<fim_prefix> ")
      val si = text.indexOf(" <fim_suffix> ")
      val mi = text.indexOf(" <fim_middle> ")
      assert(pi == 0 && si > 0 && mi > si, s"doc $id markers")
      def toks(s: String) =
        s.split("\\s+").toSeq.filter(_.nonEmpty)
      val prefix = toks(text.substring(13, si))
      val suffix = toks(text.substring(si + 14, mi))
      val middle = toks(text.substring(mi + 14))
      assert(prefix.size == c1 && middle.size == c2 - c1 &&
        suffix.size == n - c2, s"doc $id part sizes")
      assert(prefix ++ middle ++ suffix == original(id),
        s"doc $id: PSM reassembly mismatch")
    }
    // both degenerate shapes occur somewhere on 500 docs
    assert(fim.exists(r => r.getLong(2) == 0L), "no empty prefix seen")
    assert(fim.exists(r => r.getLong(3) == r.getLong(1)),
      "no empty suffix seen")
  }

  test("hash decisions are identical with ANSI off (BIGINT cast guard)") {
    // without the explicit CAST, conv()'s string result coerces to
    // DOUBLE under ansi=false and the 60-bit hash loses its low bits —
    // silently different masks/cuts than the oracle
    val ansiOn = TextStats.spanCorrupt(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val fimOn = TextStats.fimTransform(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ansiOff = TextStats.spanCorrupt(docs, "doc_id", "text")
        .collect().map(_.toSeq).toSet
      val fimOff = TextStats.fimTransform(docs, "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(ansiOff == ansiOn, "spanCorrupt diverged under ansi=false")
      assert(fimOff == fimOn, "fimTransform diverged under ansi=false")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("FIM is deterministic across partitionings") {
    val a = TextStats.fimTransform(docs.repartition(5), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = TextStats.fimTransform(docs.repartition(11), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
