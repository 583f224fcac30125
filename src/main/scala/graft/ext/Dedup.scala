package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication family for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, and blocked n-gram Jaccard.
  *
  * Everything is built from codegen'd built-ins over arrays — no UDFs, no
  * driver materialization — and every shuffle is keyed:
  *  - LSH candidate generation is an equi-join on (band, bucket): at 100 TB
  *    the join shuffles only (doc_id, bucket) pairs, never documents;
  *  - verification joins shingle sets by doc_id — at larger scale swap the
  *    array join for an exploded shingle equi-join (same semantics, bounded
  *    row width); hot buckets (boilerplate docs) are the skew risk — cap
  *    bucket width or salt before the self-join, and let AQE split stragglers.
  *
  * Cross-engine determinism: the only hash used is
  * `conv(substr(md5(s),1,15),16,10)` — 60 bits of md5, computable bit-for-bit
  * in any engine (DuckDB: `('0x' || substr(md5(s),1,15))::BIGINT`), so the
  * DuckDB oracles replay the exact same signatures.
  */
object Dedup {

  /** 1e9+7: modulus keeping a*h+b inside int64 for both engines. */
  final val P = 1000000007L

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct word k-shingles ("w1 w2 w3"). `textCol` is a column name. */
  def shingles(textCol: String, k: Int = 3): Column = {
    val t = s"split(lower(trim(`$textCol`)), '\\\\s+')"
    val words = (0 until k)
      .map(o => s"element_at($t, CAST(__i + $o AS INT))")
      .mkString(", ")
    expr(s"array_distinct(transform(sequence(1, size($t) - ${k - 1}), " +
      s"__i -> concat_ws(' ', $words)))")
  }

  /** 60-bit md5-derived hash — the cross-engine workhorse. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-document MinHash signature (`numHashes` values) from the distinct
    * shingle set: sig(i) = min over shingles of (a_i * h + b_i) mod P.
    * One md5 per shingle; the hash family is derived arithmetically.
    */
  def minhashSignature(shingleCol: String, numHashes: Int): Column = {
    val hs = s"transform(`$shingleCol`, s -> " +
      "conv(substring(md5(s), 1, 15), 16, 10) % 1000000007L)"
    expr(
      s"transform(sequence(0, ${numHashes - 1}), i -> array_min(" +
        s"transform($hs, h -> ((1103515245L * i + 12345) % 1000000007L * h " +
        s"+ (69069L * i + 1) % 1000000007L) % 1000000007L)))")
  }

  /** 16-bit SimHash over the shingle set: bit j set iff the sum of ±1 votes
    * from feature-hash bit j is positive.
    */
  def simhash16(shingleCol: String): Column = {
    val hs = s"transform(`$shingleCol`, s -> " +
      "conv(substring(md5(s), 1, 15), 16, 10))"
    expr(
      s"aggregate(transform(sequence(0, 15), j -> IF(" +
        s"aggregate($hs, 0L, (acc, h) -> acc + IF((CAST(h AS LONG) >> j) & 1 = 1, 1L, -1L)) > 0, " +
        s"shiftleft(1L, CAST(j AS INT)), 0L)), 0L, (a, x) -> a + x)")
  }

  /** Exact intersection/union sizes for candidate pairs carrying both
    * shingle sets as `s_a` / `s_b`.
    */
  private def withOverlap(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("inter_size",
        size(array_intersect(col("s_a"), col("s_b"))).cast("long"))
      .withColumn("union_size",
        size(col("s_a")).cast("long") + size(col("s_b")).cast("long") -
          col("inter_size"))
      .drop("s_a", "s_b")

  /** MinHash-LSH near-duplicate pairs, exactly verified.
    *
    * Pipeline: shingle → signature → band buckets (r rows per band) →
    * bucket self-join (the only quadratic step, bounded per bucket) →
    * distinct candidates → exact Jaccard filter
    * `den * inter >= num * union` (integer arithmetic — no float boundary).
    * With r=2, b=64 the detection probability at j=0.7 is
    * 1-(1-0.49)^64 ≈ 1-2e-19: the LSH pass loses nothing vs all-pairs, it
    * only prunes the join space.
    */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 128,
      bandRows: Int = 2,
      thresholdNum: Int = 7,
      thresholdDen: Int = 10): DataFrame = {
    require(numHashes % bandRows == 0)
    val numBands = numHashes / bandRows
    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("sh", shingles("text", k))
      .withColumn("sig", minhashSignature("sh", numHashes))
      .select("doc_id", "sh", "sig")

    // Bands carry only (doc_id, bucket) through the shuffle — shingle sets
    // are attached after candidate dedup, once per surviving pair.
    val banded = base.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${numBands - 1}), b -> " +
          s"concat_ws(':', slice(sig, b * $bandRows + 1, $bandRows)))"))
        .as(Seq("band", "bucket")))

    val l = banded.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
    val r = banded.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val sets = base.select(col("doc_id"), col("sh"))
    val withSets = candidates
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("s_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("s_b")), "id_b")
      .select("id_a", "id_b", "s_a", "s_b")

    withOverlap(withSets)
      .filter(col("inter_size") * thresholdDen >=
        col("union_size") * thresholdNum)
  }

  /** SimHash near-duplicate pairs: 16-bit signatures, Hamming distance ≤
    * `maxHamming`. Candidate generation uses the pigeonhole bands (4
    * nibbles: distance ≤ 3 ⇒ at least one nibble equal), so the self-join is
    * an equi-join on (nibble index, nibble value) — never a cross join.
    */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      maxHamming: Int = 3): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("sh", shingles("text", k))
      .withColumn("sig", simhash16("sh"))
      .select("doc_id", "sig")

    val banded = base.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), n -> (sig >> (n * 4)) & 15)"))
        .as(Seq("nib", "nibval")))
    val l = banded.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
      col("nib"), col("nibval"))
    val r = banded.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
      col("nib"), col("nibval"))
    l.join(r, Seq("nib", "nibval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Blocked exact n-gram Jaccard join: candidate pairs only within the same
    * `blockCol` value (metadata blocking — the classic bounded alternative
    * to LSH when a natural partition key exists). Integer threshold.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      k: Int = 2,
      thresholdNum: Int = 4,
      thresholdDen: Int = 5): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"), col(blockCol).as("block"),
      col(textCol).as("__text"))
      .withColumn("sh", shingles("__text", k)).drop("__text")
    val l = base.select(col("doc_id").as("id_a"), col("block"),
      col("sh").as("s_a"))
    val r = base.select(col("doc_id").as("id_b"), col("block"),
      col("sh").as("s_b"))
    withOverlap(
      l.join(r, Seq("block")).filter(col("id_a") < col("id_b"))
        .select("block", "id_a", "id_b", "s_a", "s_b"))
      .filter(col("inter_size") * thresholdDen >=
        col("union_size") * thresholdNum)
  }
}
