package graft

import graft.ext.Dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Skew-control spec: a boilerplate-heavy corpus (the web-scale common case
  * — ~10% of docs share one template) makes some LSH (band, bucket) values
  * quadratic. [[Dedup.saltedSelfJoin]] must (1) keep the pair set byte-equal
  * to the unsalted join and (2) bound the left-side rows any single
  * (key, salt) task owns.
  */
class DedupSkewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** 200 docs; ids 0-19 share a boilerplate template with a tiny unique
    * tail (near-dups of each other), the rest are random word soup.
    */
  private lazy val docs = {
    val rnd = new Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    def soup(n: Int): String = Seq.fill(n)(words(rnd.nextInt(words.size)))
      .mkString(" ")
    val boiler = "terms of service apply to all content on this site " +
      "all rights reserved contact the administrator for details"
    val rows =
      (0 until 20).map(i => (i.toLong, s"$boiler unique tail $i")) ++
        (20 until 200).map(i => (i.toLong, soup(30 + rnd.nextInt(30))))
    rows.toDF("doc_id", "text")
  }

  test("salted self-join: identical pair set, bounded salt groups") {
    val banded = {
      // the real minhash banding is exercised end-to-end below; here a
      // direct (band, bucket) layout with one deliberately hot bucket
      val sets = Dedup.withShingleHashSets(docs, "doc_id", "text", 3)
      sets.select(col("doc_id"),
        posexplode(expr("slice(hsh, 1, 4)")).as(Seq("band", "bucket")))
    }
    def pairs(cap: Int): Set[(Long, Long)] =
      Dedup.saltedSelfJoin(banded, Seq("band", "bucket"), "doc_id", cap)
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val unsalted = pairs(0)
    val salted = pairs(8)
    assert(salted == unsalted) // property 1: pair set unchanged
    assert(unsalted.nonEmpty)

    // property 2: with cap=8, no (band, bucket, salt) group owns more than
    // ~cap left rows (the quadratic work is spread across fan tasks)
    val hot = banded.groupBy("band", "bucket").count().filter(col("count") > 8)
    assert(hot.count() > 0, "fixture failed to produce a hot bucket")
    val maxGroup = banded
      .join(broadcast(hot.select(col("band"), col("bucket"),
        col("count").as("__w"))), Seq("band", "bucket"))
      .withColumn("__g", pmod(hash(col("doc_id")),
        expr("CAST((__w + 7) DIV 8 AS INT)")))
      .groupBy("band", "bucket", "__g").count()
      .agg(max("count")).head().getLong(0)
    // hash-mod salting is balanced in expectation; 2× cap is a safe bound
    assert(maxGroup <= 16, s"salt group too wide: $maxGroup")
  }

  test("minhash near-dup pairs are cap-invariant on the boilerplate corpus") {
    def run(cap: Int): Set[(Long, Long, Long, Long)] =
      Dedup.minhashNearDupPairs(docs, "doc_id", "text", bucketCap = cap)
        .select("id_a", "id_b", "inter_size", "union_size")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val uncapped = run(0)
    val capped = run(4) // far below the 20-doc boilerplate cluster width
    assert(capped == uncapped)
    // the boilerplate cluster must actually be detected as near-dups
    assert(uncapped.exists { case (a, b, _, _) => a < 20 && b < 20 })
  }

  test("blocked jaccard pairs are cap-invariant") {
    val blocked = docs.withColumn("lang", lit("en"))
      .withColumn("source", when(col("doc_id") < 100, "web").otherwise("book"))
    def run(cap: Int): Set[(Long, Long)] =
      Dedup.ngramJaccardPairs(blocked, "doc_id", "text",
        Seq("lang", "source"), k = 2, thresholdNum = 1, thresholdDen = 2,
        blockCap = cap)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(16) == run(0))
  }
}
