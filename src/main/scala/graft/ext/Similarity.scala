package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), two tiers:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. The query batch is broadcast,
  *    so the corpus is scanned once map-side with zero shuffle for the
  *    join; only the per-query top-k window shuffles (queries × k rows).
  *    This is the right shape whenever |queries| ≪ |corpus| — at 100 TB the
  *    corpus never moves.
  *  - [[lshTopK]]: random-hyperplane (signed random projection) bucketing —
  *    the scale path. Corpus and queries hash to an `numPlanes`-bit bucket;
  *    candidates are an equi-join on the bucket id, then exact cosine top-k
  *    within the bucket. Recall is tunable by `numPlanes` (fewer bits →
  *    bigger buckets) and multi-probe would flip bucket bits — kept
  *    single-probe here for oracle determinism.
  *
  * All arithmetic is IEEE-double left-folds over the array order, so an
  * oracle engine replaying the same formula produces bit-identical cosines
  * (no epsilon compares needed). Hyperplanes are md5-derived rationals
  * (k/1000), exactly representable as decimal literals in any engine.
  */
object Similarity {

  /** Deterministic hyperplane component in [-1, 1]: first 15 md5 hex chars
    * of "plane{p}:{d}" mod 2001, shifted and scaled by 1/1000.
    */
  def planeComponent(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane$p:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
  }

  /** The plane matrix as Scala data (numPlanes × dim). */
  def planes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map(p => (0 until dim).map(d => planeComponent(p, d)))

  /** Left-fold dot product of two array columns as doubles — the
    * engine-portable formulation (same fold order everywhere).
    */
  def dot(a: String, b: String): Column = expr(
    s"aggregate(zip_with(`$a`, `$b`, (x, y) -> CAST(x AS DOUBLE) * " +
      s"CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)")

  /** Same fold, as the native codegen'd [[graft.functions.FloatDot]] —
    * bit-identical result, no interpreted lambda dispatch. Callers must
    * have run [[graft.functions.VectorExpressions.register]].
    */
  private def dotFast(a: String, b: String): Column =
    expr(s"graft_dot(`$a`, `$b`)")

  def selfNorm(a: String): Column = sqrt(dot(a, a))

  private def selfNormFast(a: String): Column = sqrt(dotFast(a, a))

  /** `numPlanes`-bit signed-random-projection bucket of a vector column. */
  def hyperplaneBucket(vecCol: String, numPlanes: Int, dim: Int): Column = {
    val terms = planes(numPlanes, dim).zipWithIndex.map { case (plane, p) =>
      val lit = plane.map(v => s"${v}D").mkString("array(", ", ", ")")
      s"IF(aggregate(zip_with(`$vecCol`, $lit, (x, y) -> " +
        s"CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v) > 0, " +
        s"${1L << p}L, 0L)"
    }
    expr(terms.mkString("(", " + ", ")"))
  }

  private def topK(
      scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_sim"))
  }

  /** Exact cosine top-k of each query against the whole corpus. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("v_c"),
      selfNormFast(vecCol).as("n_c"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("v_q"),
      selfNormFast(vecCol).as("n_q"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dotFast("v_q", "v_c") / (col("n_q") * col("n_c")))
    topK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    * `threshold` (exact). This is the verification-grade form — at corpus
    * scale, generate candidates with [[lshTopK]]'s hyperplane buckets (or
    * ANN indexes) first and run this exact filter only on candidates; the
    * quadratic form here is the oracle-checkable ground truth.
    */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      selfNormFast(vecCol).as("n_a"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      selfNormFast(vecCol).as("n_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dotFast("v_a", "v_b") / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cos_sim"))
  }

  /** Bucketed ANN: equi-join on the hyperplane bucket, exact re-rank inside.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 8,
      dim: Int = 64): DataFrame = {
    graft.functions.VectorExpressions.register(corpus.sparkSession)
    // A dim mismatch on EITHER side would null the plane dots and silently
    // collapse vectors into bucket 0 (an unpruned join) — fail loudly.
    def checkDim(df: DataFrame, side: String): Unit =
      df.select(size(col(vecCol)).as("n")).filter(col("n").isNotNull)
        .limit(1).collect().headOption.foreach { r =>
          require(r.getInt(0) == dim,
            s"lshTopK: dim=$dim but $side '$vecCol' arrays have " +
              s"${r.getInt(0)} elements")
        }
    checkDim(corpus, "corpus")
    checkDim(queries, "queries")
    val bucket = hyperplaneBucket(vecCol, numPlanes, dim)
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("v_c"),
      selfNormFast(vecCol).as("n_c"), bucket.as("bucket"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("v_q"),
      selfNormFast(vecCol).as("n_q"), bucket.as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", dotFast("v_q", "v_c") / (col("n_q") * col("n_c")))
    topK(scored, k)
  }
}
