package graft.queries

import graft.ext.Similarity

import org.apache.spark.sql.functions._

/** ANN queries over `embeddings` (64-dim float vectors). The oracles replay
  * the identical IEEE left-fold arithmetic in DuckDB, so cosines are
  * bit-exact across engines — ranks need no epsilon tolerance.
  */
object SimilarityQueries {

  private[queries] val Dim = 64
  private val NumPlanes = 8

  /** DuckDB left-fold dot product between two array expressions. */
  private[queries] def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"

  /** DuckDB dot of an embedding with a literal plane array. */
  private def planeDotSql(vec: String, plane: Seq[Double]): String = {
    val lit = plane.mkString("[", ", ", "]")
    s"list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}), " +
      s"i -> $vec[i]::DOUBLE * ($lit)[i])), (x, y) -> x + y)"
  }

  private def bucketSql(vec: String): String =
    Similarity.planes(NumPlanes, Dim).zipWithIndex.map { case (plane, p) =>
      s"(CASE WHEN ${planeDotSql(vec, plane)} > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Bucket over planes [from, from+n) of the shared plane matrix — the
    * oracle twin of [[Similarity.hyperplaneBucketSliced]] (q253's
    * LSH-forest seed tables).
    */
  private def bucketSliceSql(vec: String, from: Int, n: Int): String =
    Similarity.planes(from + n, Dim).slice(from, from + n).zipWithIndex
      .map { case (plane, p) =>
        s"(CASE WHEN ${planeDotSql(vec, plane)} > 0 " +
          s"THEN ${1L << p} ELSE 0 END)"
      }.mkString("(", " + ", ")")

  private val normCte =
    s"""WITH nv AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings)""".stripMargin

  val q21AnnBruteForce: QuerySpec = QuerySpec.oracled(
    "q21_ann_brute_force",
    s"""$normCte,
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM nv q JOIN nv c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.bruteForceTopK(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  val q22AnnLsh: QuerySpec = QuerySpec.oracled(
    "q22_ann_lsh",
    s"""$normCte,
       |b AS (
       |  SELECT vec_id, embedding, nrm, ${bucketSql("embedding")} AS bucket
       |  FROM nv),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM b q JOIN b c
       |    ON q.bucket = c.bucket AND q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.lshTopK(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 3,
      numPlanes = NumPlanes, dim = Dim)
      .orderBy("query_id", "rank")
  }

  val q31EmbeddingNearDup: QuerySpec = QuerySpec.oracled(
    "q31_embedding_near_dup",
    s"""$normCte,
       |p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
       |  FROM nv a JOIN nv b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, round(cosine, 6) AS cos_sim
       |FROM p WHERE cosine >= 0.4
       |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    Similarity.cosineNearDupPairs(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      idCol = "vec_id", vecCol = "embedding", threshold = 0.4)
      .orderBy("id_a", "id_b")
  }.correctnessOnly // deliberate all-pairs verification twin of q41 —
  // adjudicated for VALUES, never timed: benching a scale-forbidden shape
  // adds ~1 s/round of noise for a number no user should ever reproduce

  /** Banded-LSH near-dup pairs checked against the EXACT all-pairs oracle
    * (same SQL shape as q31): green iff banded candidate generation loses
    * no qualifying pair — recall verified exactly, not statistically. See
    * [[graft.ext.Similarity.cosineNearDupPairsBucketed]] for the parameter
    * honesty note (threshold 0.4 is the indexing-hostile regime; the win
    * here is the join shape, the high-threshold regime is spec-covered).
    */
  val q41EmbeddingNearDupLsh: QuerySpec = QuerySpec.oracled(
    "q41_embedding_near_dup_lsh",
    s"""$normCte,
       |p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
       |  FROM nv a JOIN nv b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, round(cosine, 6) AS cos_sim
       |FROM p WHERE cosine >= 0.4
       |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    Similarity.cosineNearDupPairsBucketed(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      idCol = "vec_id", vecCol = "embedding", threshold = 0.4)
      .orderBy("id_a", "id_b")
  }

  /** Higher-threshold banded near-dup, demonstrating the pruning regime
    * (q41's docstring honesty note). 0.5 is the TOP of this corpus's
    * similarity range (max pair cosine: 0.51 at sf0.01, 0.60 at sf0.1 —
    * random 64-dim cosines concentrate near 0, planted near-dups sit at
    * 0.4–0.5), so this is the most indexing-friendly threshold the oracle
    * can adjudicate non-vacuously. Measured with 6-bit × 32-band signatures
    * (ProfileBandedNearDup): sf0.1 candidates 813,628 of 1,999,000 pairs
    * (40.7% — a 2.5× cut vs all-pairs, vs q41's near-100% at 0.4) at
    * recall 14/14 = 100%. The genuinely-high regime (≥ 0.9, ~7% candidates
    * at 8 bits × 16 bands) has no pairs in this corpus at all, so it is
    * demonstrated on a planted-dup fixture in BandedNearDupSpec instead of
    * a vacuous 0-row oracle query.
    */
  val q53EmbeddingNearDupHi: QuerySpec = QuerySpec.oracled(
    "q53_embedding_near_dup_hi",
    s"""$normCte,
       |p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
       |  FROM nv a JOIN nv b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, round(cosine, 6) AS cos_sim
       |FROM p WHERE cosine >= 0.5
       |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    Similarity.cosineNearDupPairsBucketed(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      idCol = "vec_id", vecCol = "embedding", threshold = 0.5,
      bandBits = 6, numBands = 32)
      .orderBy("id_a", "id_b")
  }

  /** DuckDB replay of the multi-probe bucket list: base bucket plus flips
    * of the lowest-|dot| planes, flip order = lexicographic sort on
    * (|dot|, plane index) — byte-identical to
    * [[graft.functions.HyperplaneMath.probes]].
    */
  private def probesSql(vec: String, numProbes: Int): String = {
    val dots = Similarity.planes(NumPlanes, Dim).map(planeDotSql(vec, _))
      .mkString("[", ", ", "]")
    val flips = s"list_transform(list_sort(list_transform(range(1, " +
      s"${NumPlanes + 1}), i -> [abs(($dots)[i]), CAST(i - 1 AS DOUBLE)])), " +
      s"x -> CAST(x[2] AS INT))"
    val probes = (1 until numProbes).map(j =>
      s"xor(${bucketSql(vec)}, (CAST(1 AS BIGINT) << ($flips)[$j]))")
    (Seq(bucketSql(vec)) ++ probes).mkString("[", ", ", "]")
  }

  /** Multi-probe LSH ANN: query probes its base bucket plus the 3 buckets
    * reached by flipping its lowest-margin planes. The oracle replays the
    * identical probe-set construction, so the result is exact-checked; the
    * recall improvement over single-probe is asserted separately in
    * MultiProbeRecallSpec on a planted-neighbor fixture.
    */
  val q42AnnLshMultiprobe: QuerySpec = QuerySpec.oracled(
    "q42_ann_lsh_multiprobe",
    s"""$normCte,
       |b AS (
       |  SELECT vec_id, embedding, nrm, ${bucketSql("embedding")} AS bucket
       |  FROM nv),
       |qp AS (
       |  SELECT vec_id, embedding, nrm, ${probesSql("embedding", 4)} AS probes
       |  FROM nv WHERE vec_id < 20),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM qp q JOIN b c
       |    ON list_contains(q.probes, c.bucket) AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.lshTopK(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 3,
      numPlanes = NumPlanes, dim = Dim, numProbes = 4)
      .orderBy("query_id", "rank")
  }

  private val NumCentroids = 16

  /** DuckDB replay of the IVF cell ordering: centroid indices sorted by
    * (-dot, index) — byte-identical to
    * [[graft.functions.HyperplaneMath.ivfCells]].
    */
  private def ivfCellsSql(vec: String): String = {
    val dots = Similarity.centroids(NumCentroids, Dim)
      .map(planeDotSql(vec, _)).mkString("[", ", ", "]")
    // the 16×64-term dots list is the ARGUMENT of the indexed lambda, so
    // it evaluates ONCE per row — the previous range-lambda form rebuilt
    // it per centroid (16× per row), which alone cost ~70 s per IVF
    // oracle at sf0.01; values and tie order are bit-identical
    s"list_transform(list_sort(list_transform($dots, " +
      s"(__d, __i) -> [-__d, CAST(__i - 1 AS DOUBLE)])), " +
      s"x -> CAST(x[2] AS BIGINT))"
  }

  /** IVF ANN: corpus in one inverted list per nearest centroid, queries
    * probe their 2 nearest cells, exact cosine re-rank inside. The oracle
    * replays the identical centroid assignment and probe ordering.
    */
  val q44AnnIvf: QuerySpec = QuerySpec.oracled(
    "q44_ann_ivf",
    s"""$normCte,
       |cv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1]
       |    AS cell
       |  FROM nv),
       |qv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1:2]
       |    AS cells
       |  FROM nv WHERE vec_id < 20),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM qv q JOIN cv c
       |    ON list_contains(q.cells, c.cell) AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopK(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 3,
      numCentroids = NumCentroids, dim = Dim, numProbes = 2)
      .orderBy("query_id", "rank")
  }

  /** IVF ANN after ONE deterministic Lloyd refinement of the md5 seed
    * centroids ([[graft.ext.Similarity.ivfTopKLloyd]]): the oracle replays
    * the identical fixed-point member mean (exact int64 sums → one double
    * division), re-assignment (dot vs refined centroids, ties to the lower
    * cell), query-side 2-probe, and exact re-rank.
    */
  val q55AnnIvfLloyd: QuerySpec = QuerySpec.oracled(
    "q55_ann_ivf_lloyd",
    s"""$normCte,
       |cv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1]
       |    AS cell0
       |  FROM nv),
       |fx AS (
       |  SELECT cell0, i,
       |    sum(CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM cv, range(1, ${Dim + 1}) t(i)
       |  GROUP BY cell0, i),
       |cent AS (
       |  SELECT cell0 AS cell,
       |    list(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0
       |         ORDER BY i) AS cvec
       |  FROM fx GROUP BY cell0),
       |asg AS (
       |  SELECT v.vec_id, v.embedding, v.nrm, e.cell,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}),
       |      i -> v.embedding[i]::DOUBLE * e.cvec[i])), (x, y) -> x + y) AS d
       |  FROM cv v CROSS JOIN cent e),
       |rnk AS (
       |  SELECT vec_id, embedding, nrm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell)
       |      AS rk
       |  FROM asg),
       |corp AS (SELECT * FROM rnk WHERE rk = 1),
       |qp AS (SELECT * FROM rnk WHERE rk <= 2 AND vec_id < 20),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM qp q JOIN corp c ON q.cell = c.cell AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.ivfTopKLloyd(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 3,
      numCentroids = NumCentroids, dim = Dim, numProbes = 2)
      .orderBy("query_id", "rank")
  }

  /** Persisted + incrementally-maintained IVF index
    * ([[graft.ext.AnnIndex]]): the quantizer is TRAINED on the even-id
    * half of the corpus and frozen into a versioned on-disk artifact
    * (manifest-pointer commit); the odd-id half then FOLDS in against
    * the frozen centroids — stored postings never read, delta-sized IO
    * (AnnIndexSpec proves the no-scan property) — and queries run
    * against the maintained index. Because assignment is the shared
    * [[graft.ext.Similarity.assignCells]] under one frozen quantizer,
    * the maintained answer must equal a one-shot assignment of the FULL
    * corpus under the same quantizer; the oracle replays exactly that
    * (q55's fixed-point Lloyd replay with training restricted to the
    * even half).
    */
  val q271AnnIndexFold: QuerySpec = QuerySpec.oracled(
    "q271_ann_index_fold",
    s"""$normCte,
       |cv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1]
       |    AS cell0
       |  FROM nv),
       |fx AS (
       |  SELECT cell0, i,
       |    sum(CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM cv, range(1, ${Dim + 1}) t(i)
       |  WHERE vec_id % 2 = 0
       |  GROUP BY cell0, i),
       |cent AS (
       |  SELECT cell0 AS cell,
       |    list(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0
       |         ORDER BY i) AS cvec
       |  FROM fx GROUP BY cell0),
       |asg AS (
       |  SELECT v.vec_id, v.embedding, v.nrm, e.cell,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}),
       |      i -> v.embedding[i]::DOUBLE * e.cvec[i])), (x, y) -> x + y) AS d
       |  FROM cv v CROSS JOIN cent e),
       |rnk AS (
       |  SELECT vec_id, embedding, nrm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell)
       |      AS rk
       |  FROM asg),
       |corp AS (SELECT * FROM rnk WHERE rk = 1),
       |qp AS (SELECT * FROM rnk WHERE rk <= 2 AND vec_id < 20),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM qp q JOIN corp c ON q.cell = c.cell AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    import graft.ext.AnnIndex
    val idxDir = QuerySpec.stagedPath("q271_index", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
    new java.io.File(idxDir).mkdirs()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    AnnIndex.build(spark, emb.filter(col("vec_id") % 2 === 0),
      idxDir, "emb", "vec_id", "embedding",
      numCentroids = NumCentroids, dim = Dim)
    AnnIndex.fold(spark, emb.filter(col("vec_id") % 2 === 1),
      idxDir, "emb", "vec_id", "embedding")
    AnnIndex.topK(spark, emb.filter(col("vec_id") < 20),
      idxDir, "emb", "vec_id", "embedding", k = 3, numProbes = 2)
      .orderBy("query_id", "rank")
  }

  /** IVF-PQ with ADC ([[graft.ext.Similarity.ivfPqTopK]] — the FAISS
    * IVFPQ composition): Lloyd cells prune the scan (a query touches only
    * its 2 probed inverted lists) while residual PQ codes compress what
    * is scanned 32×; the top-50 ADC candidates re-rank exactly. The
    * oracle replays the ENTIRE structure — fixed-point Lloyd means,
    * per-cell residuals, residual-codebook training (one fixed-point
    * k-means step in the `ivfpq` md5 namespace), encode, per-probe
    * distance tables, the integer ADC sum, and the exact re-rank —
    * bit-for-bit.
    */
  val q274AnnIvfPq: QuerySpec = QuerySpec.oracled(
    "q274_ann_ivfpq",
    s"""$normCte,
       |cv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1]
       |    AS cell0
       |  FROM nv),
       |fx AS (
       |  SELECT cell0, i,
       |    sum(CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM cv, range(1, ${Dim + 1}) t(i)
       |  GROUP BY cell0, i),
       |cent AS (
       |  SELECT cell0 AS cell,
       |    list(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0
       |         ORDER BY i) AS cvec
       |  FROM fx GROUP BY cell0),
       |asg AS (
       |  SELECT v.vec_id, v.embedding, v.nrm, e.cell, e.cvec,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}),
       |      i -> v.embedding[i]::DOUBLE * e.cvec[i])), (x, y) -> x + y) AS d
       |  FROM cv v CROSS JOIN cent e),
       |rnk AS (
       |  SELECT vec_id, embedding, nrm, cell, cvec,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell)
       |      AS rk
       |  FROM asg),
       |corp AS (
       |  SELECT vec_id, cell,
       |    list_transform(range(1, ${Dim + 1}),
       |      i -> embedding[i]::DOUBLE - cvec[i]) AS resid
       |  FROM rnk WHERE rk = 1),
       |qp AS (
       |  SELECT vec_id, cell,
       |    list_transform(range(1, ${Dim + 1}),
       |      i -> embedding[i]::DOUBLE - cvec[i]) AS resid
       |  FROM rnk WHERE rk <= 2 AND vec_id < 20),
       |cs AS (
       |  SELECT vec_id AS cid, cell, CAST(t.mi AS INT) AS m,
       |    list_slice(resid, t.mi * 8 + 1, t.mi * 8 + 8) AS sub
       |  FROM corp CROSS JOIN range(8) t(mi)),
       |${pqCbSql("ivfpq")},
       |sd0 AS (
       |  SELECT cs.cid, cs.m, seed.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (cs.sub[i]::DOUBLE - seed.cvec[i]) *
       |             (cs.sub[i]::DOUBLE - seed.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS d2u
       |  FROM cs JOIN seed USING (m)),
       |sasg AS (
       |  SELECT cid, m, cw FROM (
       |    SELECT cid, m, cw,
       |      row_number() OVER (PARTITION BY cid, m ORDER BY d2u, cw) AS rk
       |    FROM sd0) WHERE rk = 1),
       |fx2 AS (
       |  SELECT sasg.m, sasg.cw, t.i,
       |    sum(CAST(floor(cs.sub[t.i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM sasg
       |  JOIN cs ON cs.cid = sasg.cid AND cs.m = sasg.m
       |  CROSS JOIN range(1, 9) t(i)
       |  GROUP BY 1, 2, 3),
       |cent2 AS (
       |  SELECT m, cw,
       |    list(CAST(s AS DOUBLE) / cnt / 1000000.0 ORDER BY i) AS tvec
       |  FROM fx2 GROUP BY 1, 2),
       |cb AS (
       |  SELECT seed.m, seed.cw, coalesce(cent2.tvec, seed.cvec) AS cvec
       |  FROM seed LEFT JOIN cent2
       |    ON cent2.m = seed.m AND cent2.cw = seed.cw),
       |d0 AS (
       |  SELECT cs.cid, cs.cell, cs.m, cb.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (cs.sub[i]::DOUBLE - cb.cvec[i]) *
       |             (cs.sub[i]::DOUBLE - cb.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS d2u
       |  FROM cs JOIN cb USING (m)),
       |enc AS (
       |  SELECT cid, cell, m, cw FROM (
       |    SELECT cid, cell, m, cw,
       |      row_number() OVER (PARTITION BY cid, m ORDER BY d2u, cw) AS rk
       |    FROM d0) WHERE rk = 1),
       |qs AS (
       |  SELECT vec_id AS qid, cell, CAST(t.mi AS INT) AS m,
       |    list_slice(resid, t.mi * 8 + 1, t.mi * 8 + 8) AS sub
       |  FROM qp CROSS JOIN range(8) t(mi)),
       |qt AS (
       |  SELECT qs.qid, qs.cell, qs.m, cb.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (qs.sub[i]::DOUBLE - cb.cvec[i]) *
       |             (qs.sub[i]::DOUBLE - cb.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS qd2u
       |  FROM qs JOIN cb USING (m)),
       |adc AS (
       |  SELECT qt.qid, enc.cid, CAST(sum(qt.qd2u) AS BIGINT) AS ad2u
       |  FROM enc JOIN qt
       |    ON enc.cell = qt.cell AND enc.m = qt.m AND enc.cw = qt.cw
       |  WHERE enc.cid <> qt.qid
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY ad2u, cid) AS crk
       |    FROM adc) WHERE crk <= 50),
       |scored AS (
       |  SELECT cand.qid AS query_id, cand.cid AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM cand
       |  JOIN nv q ON q.vec_id = cand.qid
       |  JOIN nv c ON c.vec_id = cand.cid),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.ivfPqTopK(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 3,
      numCentroids = NumCentroids, dim = Dim, numProbes = 2,
      numSub = 8, codebookSize = 16, candidates = 50)
      .orderBy("query_id", "rank")
  }

  /** Prefix-d dot product — the truncation ladder's scoring fold. */
  private def dotSqlPrefix(a: String, b: String, d: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, ${d + 1}), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"

  /** Embedding-truncation recall audit
    * ([[graft.ext.Similarity.truncationRecallAudit]] — the Matryoshka
    * serving question): exact top-3 under the first 8/16/32/64
    * components vs the full-dimension top-3, one recall row per rung
    * (the 64 rung is the 1.0 sanity row). The oracle replays every
    * rung's prefix-cosine ranking exactly.
    */
  val q280TruncationRecall: QuerySpec = QuerySpec.oracled(
    "q280_truncation_recall", {
      val rungs = Seq(8, 16, 32, 64)
      val ctes = rungs.map { d =>
        s"""nv$d AS (
           |  SELECT vec_id, embedding,
           |    sqrt(${dotSqlPrefix("embedding", "embedding", d)}) AS nrm
           |  FROM embeddings),
           |r$d AS (
           |  SELECT CAST($d AS BIGINT) AS dim_prefix,
           |    q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${dotSqlPrefix("q.embedding", "c.embedding", d)}
           |        / (q.nrm * c.nrm) DESC, c.vec_id) AS rank
           |  FROM nv$d q JOIN nv$d c
           |    ON q.vec_id < 20 AND c.vec_id <> q.vec_id)""".stripMargin
      }.mkString(",\n")
      val union = rungs
        .map(d => s"SELECT dim_prefix, query_id, neighbor_id FROM r$d " +
          "WHERE rank <= 3")
        .mkString("\n  UNION ALL ")
      s"""WITH $ctes,
         |per AS (
         |  $union),
         |tr AS (SELECT query_id, neighbor_id FROM r64 WHERE rank <= 3)
         |SELECT per.dim_prefix, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_matched,
         |  CAST(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS recall_ppm
         |FROM per LEFT JOIN tr
         |  ON per.query_id = tr.query_id
         |  AND per.neighbor_id = tr.neighbor_id
         |GROUP BY per.dim_prefix
         |ORDER BY per.dim_prefix""".stripMargin
    }) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.truncationRecallAudit(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 3,
      prefixes = Seq(8, 16, 32, 64), dim = Dim)
      .orderBy("dim_prefix")
  }

  /** Prototypicality pruning
    * ([[graft.ext.Similarity.prototypicalityPrune]] — Sorscher et al.
    * 2022): every vector scored by cosine to its Lloyd-cell centroid;
    * the hardest 30% per cell (lowest cosine, ties on id) are kept, the
    * prototypical rest pruned — the data-pruning recipe that beats
    * random selection when data is abundant. Per-cell quotas keep the
    * prune stratified. The oracle replays the fixed-point Lloyd fit,
    * assignment, centroid-norm cosine, rank, and quota exactly.
    */
  val q279ProtoPrune: QuerySpec = QuerySpec.oracled(
    "q279_proto_prune",
    s"""$normCte,
       |cv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1]
       |    AS cell0
       |  FROM nv),
       |fx AS (
       |  SELECT cell0, i,
       |    sum(CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM cv, range(1, ${Dim + 1}) t(i)
       |  GROUP BY cell0, i),
       |cent AS (
       |  SELECT cell0 AS cell,
       |    list(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0
       |         ORDER BY i) AS cvec
       |  FROM fx GROUP BY cell0),
       |asg AS (
       |  SELECT v.vec_id, v.nrm, e.cell, e.cvec,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}),
       |      i -> v.embedding[i]::DOUBLE * e.cvec[i])), (x, y) -> x + y) AS d
       |  FROM cv v CROSS JOIN cent e),
       |rnk AS (
       |  SELECT vec_id, nrm, cell, cvec, d,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell)
       |      AS rk
       |  FROM asg),
       |pr AS (
       |  SELECT vec_id, cell,
       |    d / (nrm * sqrt(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, ${Dim + 1}),
       |        i -> cvec[i] * cvec[i])), (x, y) -> x + y))) AS proto
       |  FROM rnk WHERE rk = 1),
       |rkp AS (
       |  SELECT vec_id, cell, proto,
       |    row_number() OVER (PARTITION BY cell ORDER BY proto, vec_id)
       |      AS hard_rank,
       |    count(*) OVER (PARTITION BY cell) AS n
       |  FROM pr)
       |SELECT vec_id, cell, round(proto, 6) AS proto_cos,
       |  CAST(hard_rank AS INTEGER) AS hard_rank,
       |  hard_rank <= (n * 30 + 99) // 100 AS kept
       |FROM rkp
       |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
    Similarity.prototypicalityPrune(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      idCol = "vec_id", vecCol = "embedding", keepHardestPct = 30,
      numCentroids = NumCentroids, dim = Dim)
      .orderBy("vec_id")
  }

  private val q281Staging = new QuerySpec.StagingCache[String]

  /** Stage the odd-id embedding half as TWO parquet files so the index
    * maintenance loop sees two micro-batches. Memoized per sf dir.
    */
  private def stageQ281(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    q281Staging.getOrStage(dir) {
      val staged = new java.io.File(QuerySpec.stagedPath("q281_emb", dir))
      org.apache.commons.io.FileUtils.deleteQuietly(staged)
      staged.mkdirs()
      val odd = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 2 === 1)
      odd.filter(col("vec_id") % 4 === 1).coalesce(1)
        .write.parquet(s"$staged/00")
      QuerySpec.flattenPart(spark, staged.toString, "00", "a.parquet")
      odd.filter(col("vec_id") % 4 === 3).coalesce(1)
        .write.parquet(s"$staged/01")
      QuerySpec.flattenPart(spark, staged.toString, "01", "b.parquet")
      staged.toString
    }

  /** q271's persisted index MAINTAINED over a real micro-batch stream:
    * the quantizer trains once on the even-id half (batch build), then
    * each streamed micro-batch of new vectors FOLDS into the index via
    * `foreachBatch` — append-only, assignment against the frozen
    * centroids, so the maintained index is independent of fold order and
    * count and equals a one-shot assignment of the full corpus exactly
    * (the q256 stream ≡ batch discipline applied to an INDEX artifact
    * rather than a sample). The oracle is q271's full replay with a
    * wider query set. This is how a 100 TB ANN serving index ingests a
    * live embedding feed: delta-sized fold IO per trigger, no retrain,
    * no rescan.
    */
  val q281AnnIndexStream: QuerySpec = QuerySpec.oracled(
    "q281_ann_index_stream",
    s"""$normCte,
       |cv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1]
       |    AS cell0
       |  FROM nv),
       |fx AS (
       |  SELECT cell0, i,
       |    sum(CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM cv, range(1, ${Dim + 1}) t(i)
       |  WHERE vec_id % 2 = 0
       |  GROUP BY cell0, i),
       |cent AS (
       |  SELECT cell0 AS cell,
       |    list(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0
       |         ORDER BY i) AS cvec
       |  FROM fx GROUP BY cell0),
       |asg AS (
       |  SELECT v.vec_id, v.embedding, v.nrm, e.cell,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}),
       |      i -> v.embedding[i]::DOUBLE * e.cvec[i])), (x, y) -> x + y) AS d
       |  FROM cv v CROSS JOIN cent e),
       |rnk AS (
       |  SELECT vec_id, embedding, nrm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell)
       |      AS rk
       |  FROM asg),
       |corp AS (SELECT * FROM rnk WHERE rk = 1),
       |qp AS (SELECT * FROM rnk WHERE rk <= 2 AND vec_id >= 20
       |       AND vec_id < 50),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM qp q JOIN corp c ON q.cell = c.cell AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    import graft.ext.AnnIndex
    import org.apache.spark.sql.streaming.Trigger
    val staged = stageQ281(spark, dir)
    val idxDir = QuerySpec.stagedPath("q281_index", dir)
    val ckpt = QuerySpec.stagedPath("q281_ckpt", dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    new java.io.File(idxDir).mkdirs()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    AnnIndex.build(spark, emb.filter(col("vec_id") % 2 === 0),
      idxDir, "emb", "vec_id", "embedding",
      numCentroids = NumCentroids, dim = Dim)
    val schema = spark.read.parquet(s"$staged/a.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
    spark.streams.active.filter(_.name == "q281_fold").foreach(_.stop())
    val q = stream.writeStream
      .queryName("q281_fold")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the batchId IS the fold generation: a retried micro-batch
        // replaying its committed generation is a no-op, not a
        // double-insert (foreachBatch is at-least-once)
        AnnIndex.fold(batch.sparkSession, batch, idxDir, "emb",
          "vec_id", "embedding", generation = Some(batchId + 1))
      }
      .start()
    q.awaitTermination()
    AnnIndex.topK(spark,
      emb.filter(col("vec_id") >= 20 && col("vec_id") < 50),
      idxDir, "emb", "vec_id", "embedding", k = 3, numProbes = 2)
      .orderBy("query_id", "rank")
  }.withSetup((s, d) => { stageQ281(s, d); () })

  /** Margin-based aligned-pair mining
    * ([[graft.ext.Similarity.marginMiningPairs]] — Artetxe & Schwenk
    * 2019 ratio margin, the CCMatrix criterion): even-id vectors mine
    * their best odd-id partner by cosine relative to both items' top-4
    * neighborhoods (hub suppression), with mutual-best pairs flagged —
    * the precision-grade subset a mined corpus keeps. Cosines fix to
    * 1e-9 units clamped at zero; neighborhood averages stay integer
    * top-4 sums, so the margin is one exact division the oracle
    * replays bit-for-bit.
    */
  /** The margin algebra tail over a `pr(src_id, tgt_id, cfix)` CTE —
    * [[graft.ext.Similarity.marginFromCandidates]] replayed in SQL. Pure
    * relational ops on ids, so it composes with ANY candidate CTE: the
    * brute cross join (q286), the exhaustive-probe IVF cell join (q302),
    * and the partial-probe IVF cell join (q303) all share it verbatim.
    */
  private val marginTailSql =
    """ss AS (
      |  SELECT src_id, CAST(sum(cfix) AS BIGINT) AS sum_s FROM (
      |    SELECT src_id, cfix,
      |      row_number() OVER (PARTITION BY src_id
      |        ORDER BY cfix DESC, tgt_id) AS r
      |    FROM pr) WHERE r <= 4 GROUP BY src_id),
      |st2 AS (
      |  SELECT tgt_id, CAST(sum(cfix) AS BIGINT) AS sum_t FROM (
      |    SELECT tgt_id, cfix,
      |      row_number() OVER (PARTITION BY tgt_id
      |        ORDER BY cfix DESC, src_id) AS r
      |    FROM pr) WHERE r <= 4 GROUP BY tgt_id),
      |m AS (
      |  SELECT pr.src_id, pr.tgt_id, pr.cfix,
      |    CAST(pr.cfix * 8 * 1000000 // (ss.sum_s + st2.sum_t) AS BIGINT)
      |      AS margin_ppm
      |  FROM pr
      |  JOIN ss ON pr.src_id = ss.src_id
      |  JOIN st2 ON pr.tgt_id = st2.tgt_id
      |  WHERE ss.sum_s + st2.sum_t > 0),
      |fwd AS (
      |  SELECT * FROM (
      |    SELECT m.*, row_number() OVER (PARTITION BY src_id
      |      ORDER BY margin_ppm DESC, tgt_id) AS br
      |    FROM m) WHERE br = 1),
      |bwd AS (
      |  SELECT src_id, tgt_id FROM (
      |    SELECT m.*, row_number() OVER (PARTITION BY tgt_id
      |      ORDER BY margin_ppm DESC, src_id) AS tr
      |    FROM m) WHERE tr = 1)
      |SELECT f.src_id, f.tgt_id, f.cfix AS cos_fix, f.margin_ppm,
      |  (b.src_id IS NOT NULL) AS mutual
      |FROM fwd f LEFT JOIN bwd b
      |  ON f.src_id = b.src_id AND f.tgt_id = b.tgt_id
      |ORDER BY f.src_id""".stripMargin

  /** The brute margin-mining SQL: cross-join candidates + the shared
    * algebra tail. q286's own oracle, and — because exhaustive-probe IVF
    * candidates are the same pair set — q302's too.
    */
  private val marginBruteSql =
    s"""$normCte,
       |sv AS (SELECT vec_id AS src_id, embedding, nrm FROM nv
       |       WHERE vec_id % 2 = 0),
       |tv AS (SELECT vec_id AS tgt_id, embedding, nrm FROM nv
       |       WHERE vec_id % 2 = 1),
       |pr AS (
       |  SELECT s.src_id, t.tgt_id,
       |    CAST(greatest(CAST(floor(
       |      ${dotSql("s.embedding", "t.embedding")} / (s.nrm * t.nrm)
       |      * 1000000000.0 + 0.5) AS BIGINT), 0) AS BIGINT) AS cfix
       |  FROM sv s CROSS JOIN tv t),
       |$marginTailSql""".stripMargin

  val q286MarginMining: QuerySpec = QuerySpec.oracled(
    "q286_margin_mining", marginBruteSql) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.marginMiningPairs(
      source = emb.filter(col("vec_id") % 2 === 0),
      target = emb.filter(col("vec_id") % 2 === 1),
      idCol = "vec_id", vecCol = "embedding", k = 4)
      .orderBy("src_id")
  }.correctnessOnly // deliberate all-pairs oracle twin of q302/q303 —
  // the cross-join candidate generator is the scale-forbidden shape the
  // library exists to avoid; its margins verify the candidate-fed rows

  /** Candidate-fed margin mining, exhaustive probes
    * ([[graft.ext.Similarity.marginFromCandidates]] over
    * [[graft.ext.Similarity.marginCandidatesIvf]] at
    * numProbes = numCentroids): every (src, tgt) pair appears exactly
    * once in the IVF cell join when sources probe all surviving cells,
    * so the candidate-fed plumbing — Lloyd assignment, cell equi-join,
    * id-only margin algebra — must reproduce the brute cross join
    * BIT-FOR-BIT, and the oracle is exactly q286's brute SQL. This is
    * the algebra-equivalence gate; q303 exercises genuinely partial
    * probing.
    */
  val q302MarginAnnExhaustive: QuerySpec = QuerySpec.oracled(
    "q302_margin_ann_exhaustive", marginBruteSql) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.marginFromCandidates(
      Similarity.marginCandidatesIvf(
        source = emb.filter(col("vec_id") % 2 === 0),
        target = emb.filter(col("vec_id") % 2 === 1),
        idCol = "vec_id", vecCol = "embedding",
        numCentroids = NumCentroids, dim = Dim,
        numProbes = NumCentroids), k = 4)
      .orderBy("src_id")
  }.correctnessOnly // exhaustive probes make the cell join deliberately
  // all-pairs — an adjudication twin (algebra ≡ brute), not a shape to
  // time; q303's partial probes are the timed scale path

  /** Candidate-fed margin mining at PARTIAL probes — the 100 TB shape:
    * Lloyd centroids trained on the target corpus, targets in 1 cell,
    * sources probing their 6 of 16 nearest cells, margins computed only
    * over cell-join candidates. The gate corpus is isotropic-random
    * (ANN-hostile: decisive neighbors sit at cosine ≈ 0.21 vs a ≈ 0
    * bulk), so partial-probe margins deliberately differ from brute —
    * the oracle therefore replays the ENTIRE candidate-fed computation
    * (fixed-point Lloyd means, dot-ranked assignment, cell join, margin
    * algebra) in DuckDB, q55's discipline: the scale path itself is
    * what's verified bit-for-bit. On clustered production embeddings the
    * same partial-probe setting recovers brute picks because decisive
    * neighbors share cells; q302 pins that equivalence exactly at
    * exhaustive probes.
    */
  val q303MarginAnnIvf: QuerySpec = QuerySpec.oracled(
    "q303_margin_ann_ivf",
    s"""$normCte,
       |tv AS (SELECT vec_id, embedding, nrm FROM nv WHERE vec_id % 2 = 1),
       |hc AS MATERIALIZED (
       |  SELECT vec_id, embedding, (${ivfCellsSql("embedding")})[1] AS cell0
       |  FROM tv),
       |fx AS (
       |  SELECT cell0, i,
       |    sum(CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM hc, range(1, ${Dim + 1}) t(i)
       |  GROUP BY cell0, i),
       |cent AS (
       |  SELECT cell0 AS cell,
       |    list(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0
       |         ORDER BY i) AS cvec
       |  FROM fx GROUP BY cell0),
       |asg AS (
       |  SELECT v.vec_id, v.embedding, v.nrm, e.cell,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}),
       |      i -> v.embedding[i]::DOUBLE * e.cvec[i])), (x, y) -> x + y) AS d
       |  FROM nv v CROSS JOIN cent e),
       |rnk AS (
       |  SELECT vec_id, embedding, nrm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell)
       |      AS rk
       |  FROM asg),
       |tb AS (SELECT vec_id AS tgt_id, embedding, nrm, cell FROM rnk
       |       WHERE rk = 1 AND vec_id % 2 = 1),
       |sb AS (SELECT vec_id AS src_id, embedding, nrm, cell FROM rnk
       |       WHERE rk <= 6 AND vec_id % 2 = 0),
       |pr AS (
       |  SELECT s.src_id, t.tgt_id,
       |    CAST(greatest(CAST(floor(
       |      ${dotSql("s.embedding", "t.embedding")} / (s.nrm * t.nrm)
       |      * 1000000000.0 + 0.5) AS BIGINT), 0) AS BIGINT) AS cfix
       |  FROM sb s JOIN tb t ON s.cell = t.cell),
       |$marginTailSql""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.marginFromCandidates(
      Similarity.marginCandidatesIvf(
        source = emb.filter(col("vec_id") % 2 === 0),
        target = emb.filter(col("vec_id") % 2 === 1),
        idCol = "vec_id", vecCol = "embedding",
        numCentroids = NumCentroids, dim = Dim,
        numProbes = 6), k = 4)
      .orderBy("src_id")
  }

  /** Maintained IVF-PQ index ([[graft.ext.AnnIndex.buildPq]] /
    * [[graft.ext.AnnIndex.foldPq]] / [[graft.ext.AnnIndex.topKPq]]): the
    * quantizer and residual codebooks train on the EVEN half and freeze;
    * the odd half arrives later as a fold — encoded against the frozen
    * artifacts with no scan of stored codes — and ADC top-k runs over
    * base + committed delta codes with a candidates-sized exact re-rank.
    * The oracle replays the whole maintained lifecycle (q274's one-shot
    * replay with train CTEs restricted to evens, encode over everyone) —
    * a persisted-index bit drift from the one-shot algebra fails here.
    */
  private val q304Staging = new QuerySpec.StagingCache[String]

  /** Build evens + fold odds into the persisted PQ index once per
    * (JVM, sf dir) — the amortized artifact; the gate query then times
    * only the repeated operation, the ADC query path.
    */
  private def stageQ304(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    q304Staging.getOrStage(dir) {
      import graft.ext.AnnIndex
      val idxDir = QuerySpec.stagedPath("q304_index", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
      new java.io.File(idxDir).mkdirs()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      AnnIndex.buildPq(spark, emb.filter(col("vec_id") % 2 === 0),
        idxDir, "emb", "vec_id", "embedding",
        numCentroids = NumCentroids, dim = Dim, numSub = 8,
        codebookSize = 16)
      AnnIndex.foldPq(spark, emb.filter(col("vec_id") % 2 === 1),
        idxDir, "emb", "vec_id", "embedding")
      idxDir
    }

  val q304AnnIndexPq: QuerySpec = QuerySpec.oracled(
    "q304_ann_index_pq",
    s"""$normCte,
       |cv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1]
       |    AS cell0
       |  FROM nv),
       |fx AS (
       |  SELECT cell0, i,
       |    sum(CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM cv, range(1, ${Dim + 1}) t(i)
       |  WHERE vec_id % 2 = 0
       |  GROUP BY cell0, i),
       |cent AS (
       |  SELECT cell0 AS cell,
       |    list(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0
       |         ORDER BY i) AS cvec
       |  FROM fx GROUP BY cell0),
       |asg AS (
       |  SELECT v.vec_id, v.embedding, v.nrm, e.cell, e.cvec,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${Dim + 1}),
       |      i -> v.embedding[i]::DOUBLE * e.cvec[i])), (x, y) -> x + y) AS d
       |  FROM cv v CROSS JOIN cent e),
       |rnk AS (
       |  SELECT vec_id, embedding, nrm, cell, cvec,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell)
       |      AS rk
       |  FROM asg),
       |corp AS (
       |  SELECT vec_id, cell,
       |    list_transform(range(1, ${Dim + 1}),
       |      i -> embedding[i]::DOUBLE - cvec[i]) AS resid
       |  FROM rnk WHERE rk = 1),
       |qp AS (
       |  SELECT vec_id, cell,
       |    list_transform(range(1, ${Dim + 1}),
       |      i -> embedding[i]::DOUBLE - cvec[i]) AS resid
       |  FROM rnk WHERE rk <= 2 AND vec_id < 20),
       |cs AS (
       |  SELECT vec_id AS cid, cell, CAST(t.mi AS INT) AS m,
       |    list_slice(resid, t.mi * 8 + 1, t.mi * 8 + 8) AS sub
       |  FROM corp CROSS JOIN range(8) t(mi)),
       |${pqCbSql("ivfpq")},
       |sd0 AS (
       |  SELECT cs.cid, cs.m, seed.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (cs.sub[i]::DOUBLE - seed.cvec[i]) *
       |             (cs.sub[i]::DOUBLE - seed.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS d2u
       |  FROM cs JOIN seed USING (m)
       |  WHERE cs.cid % 2 = 0),
       |sasg AS (
       |  SELECT cid, m, cw FROM (
       |    SELECT cid, m, cw,
       |      row_number() OVER (PARTITION BY cid, m ORDER BY d2u, cw) AS rk
       |    FROM sd0) WHERE rk = 1),
       |fx2 AS (
       |  SELECT sasg.m, sasg.cw, t.i,
       |    sum(CAST(floor(cs.sub[t.i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM sasg
       |  JOIN cs ON cs.cid = sasg.cid AND cs.m = sasg.m
       |  CROSS JOIN range(1, 9) t(i)
       |  GROUP BY 1, 2, 3),
       |cent2 AS (
       |  SELECT m, cw,
       |    list(CAST(s AS DOUBLE) / cnt / 1000000.0 ORDER BY i) AS tvec
       |  FROM fx2 GROUP BY 1, 2),
       |cb AS (
       |  SELECT seed.m, seed.cw, coalesce(cent2.tvec, seed.cvec) AS cvec
       |  FROM seed LEFT JOIN cent2
       |    ON cent2.m = seed.m AND cent2.cw = seed.cw),
       |d0 AS (
       |  SELECT cs.cid, cs.cell, cs.m, cb.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (cs.sub[i]::DOUBLE - cb.cvec[i]) *
       |             (cs.sub[i]::DOUBLE - cb.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS d2u
       |  FROM cs JOIN cb USING (m)),
       |enc AS (
       |  SELECT cid, cell, m, cw FROM (
       |    SELECT cid, cell, m, cw,
       |      row_number() OVER (PARTITION BY cid, m ORDER BY d2u, cw) AS rk
       |    FROM d0) WHERE rk = 1),
       |qs AS (
       |  SELECT vec_id AS qid, cell, CAST(t.mi AS INT) AS m,
       |    list_slice(resid, t.mi * 8 + 1, t.mi * 8 + 8) AS sub
       |  FROM qp CROSS JOIN range(8) t(mi)),
       |qt AS (
       |  SELECT qs.qid, qs.cell, qs.m, cb.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (qs.sub[i]::DOUBLE - cb.cvec[i]) *
       |             (qs.sub[i]::DOUBLE - cb.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS qd2u
       |  FROM qs JOIN cb USING (m)),
       |adc AS (
       |  SELECT qt.qid, enc.cid, CAST(sum(qt.qd2u) AS BIGINT) AS ad2u
       |  FROM enc JOIN qt
       |    ON enc.cell = qt.cell AND enc.m = qt.m AND enc.cw = qt.cw
       |  WHERE enc.cid <> qt.qid
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY ad2u, cid) AS crk
       |    FROM adc) WHERE crk <= 50),
       |scored AS (
       |  SELECT cand.qid AS query_id, cand.cid AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM cand
       |  JOIN nv q ON q.vec_id = cand.qid
       |  JOIN nv c ON c.vec_id = cand.cid),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val idxDir = stageQ304(spark, dir)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    graft.ext.AnnIndex.topKPq(spark, emb.filter(col("vec_id") < 20),
      idxDir, "emb", "vec_id", "embedding", k = 3, numProbes = 2,
      candidates = 50)
      .orderBy("query_id", "rank")
  }.withSetup((s, d) => { stageQ304(s, d); () })

  /** q295's oracle, generated: the k-center greedy trajectory unrolled
    * round by round — each round's pick (max running min-distance, ties
    * on id), center extraction, and integer `least` fold of the
    * min-distance table, in the same 1e-6 fixed point as the operator.
    */
  private def kCenterSql(k: Int): String = {
    def d2(m: String, c: String): String =
      s"CAST(greatest(floor(($m.n2 + $c.n2 - 2 * " +
        dotSql(s"$m.embedding", s"$c.embedding") +
        ") * 1000000.0 + 0.5), 0) AS BIGINT)"
    val sb = new StringBuilder
    sb ++= "WITH nv AS (SELECT vec_id, embedding, " +
      s"${dotSql("embedding", "embedding")} AS n2 FROM embeddings),\n"
    sb ++= "c1 AS (SELECT nv.* FROM nv " +
      "WHERE vec_id = (SELECT min(vec_id) FROM nv)),\n"
    sb ++= s"m1 AS (SELECT nv.vec_id, ${d2("nv", "c1")} AS md " +
      "FROM nv, c1)"
    (2 to k).foreach { r =>
      val excl = (Seq("SELECT vec_id FROM c1") ++
        (2 until r).map(i => s"SELECT vec_id FROM p$i"))
        .mkString(" UNION ALL ")
      sb ++= s",\np$r AS (SELECT vec_id, md FROM m${r - 1} " +
        s"WHERE vec_id NOT IN ($excl) ORDER BY md DESC, vec_id LIMIT 1)"
      if (r < k) {
        sb ++= s",\nc$r AS (SELECT nv.* FROM nv, p$r " +
          s"WHERE nv.vec_id = p$r.vec_id)"
        sb ++= s",\nm$r AS (SELECT m.vec_id, " +
          s"least(m.md, ${d2("nv", s"c$r")}) AS md " +
          s"FROM m${r - 1} m JOIN nv ON nv.vec_id = m.vec_id, c$r)"
      }
    }
    sb ++= "\nSELECT CAST(1 AS BIGINT) AS round, " +
      "(SELECT vec_id FROM c1) AS vec_id, CAST(0 AS BIGINT) AS dist_fix"
    (2 to k).foreach { r =>
      sb ++= s"\nUNION ALL SELECT CAST($r AS BIGINT), vec_id, md FROM p$r"
    }
    sb ++= "\nORDER BY round"
    sb.toString
  }

  /** k-center greedy coreset ([[graft.ext.Similarity.kCenterGreedy]] —
    * Gonzalez 1985 / Sener & Savarese 2018 farthest-point selection):
    * six diversity-first picks over the embedding corpus, every round's
    * pick and integer-fixed min-distance fold replayed by the generated
    * oracle. The frontier-keeping complement of q279's core-keeping
    * prototypicality prune.
    */
  val q295KCenterCoreset: QuerySpec = QuerySpec.oracled(
    "q295_kcenter_coreset", kCenterSql(6)) { (spark, dir) =>
    Similarity.kCenterGreedy(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      "vec_id", "embedding", k = 6)
      .orderBy("round")
  }

  /** Int8 embedding quantization: the oracle replays the abs-max reduction
    * and floor(x + 0.5) rounding element-wise. The registered output carries
    * the quantized vector as a CSV string (`qvec_csv`), not the raw array:
    * the driver's pandas-based hash cannot sort/hash an array-typed column
    * (r3 `unhashable type: numpy.ndarray` crash), and a comma join of every
    * element in order is a faithful scalar encoding of the same values.
    */
  val q48QuantizeInt8: QuerySpec = QuerySpec.oracled(
    "q48_quantize_int8",
    s"""WITH m AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
       |      AS maxabs
       |  FROM embeddings)
       |SELECT vec_id,
       |  array_to_string(
       |    CASE WHEN maxabs > 0 THEN list_transform(embedding,
       |      x -> CAST(floor(x::DOUBLE * 127.0 / maxabs + 0.5) AS INT))
       |    ELSE list_transform(embedding, x -> 0) END, ',') AS qvec_csv,
       |  round(CASE WHEN maxabs > 0 THEN maxabs / 127.0 ELSE 0 END, 9)
       |    AS scale
       |FROM m
       |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
    Similarity.quantizeInt8(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      .select(col("vec_id"),
        array_join(expr("transform(qvec, x -> CAST(x AS STRING))"), ",")
          .as("qvec_csv"),
        col("scale"))
      .orderBy("vec_id")
  }

  /** Semantic dedup ([[graft.ext.Similarity.semanticDedup]]): coarse
    * k-means-cell clustering (the IVF home cell), then the min-id survivor
    * rule within each cluster at cosine ≥ 0.4 — SemDeDup's shape, with
    * every decision deterministic so the oracle replays assignment, pair
    * filter, and survivorship exactly. Candidate pairs are cluster-scoped
    * equi-joins (Σ|cell|², never n²); the accepted approximation is that
    * boundary-straddling near-dups are missed — q41 is the exhaustive
    * variant when recall must be total.
    */
  val q97SemanticDedup: QuerySpec = QuerySpec.oracled(
    "q97_semantic_dedup",
    s"""$normCte,
       |cv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1]
       |    AS cell
       |  FROM nv),
       |drp AS (
       |  SELECT DISTINCT b.vec_id AS vec_id
       |  FROM cv a JOIN cv b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
       |    >= 0.4)
       |SELECT c.vec_id, c.cell, (d.vec_id IS NULL) AS kept
       |FROM cv c LEFT JOIN drp d ON c.vec_id = d.vec_id
       |ORDER BY c.vec_id""".stripMargin) { (spark, dir) =>
    Similarity.semanticDedup(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      idCol = "vec_id", vecCol = "embedding", threshold = 0.4,
      numCentroids = NumCentroids, dim = Dim)
      .orderBy("vec_id")
  }

  /** The PQ codebook (8 sub-spaces × 16 codewords × 8 dims) as literal
    * SQL VALUES rows — k/1000 rationals print exactly. */
  private def pqCbSql(tag: String = "pq"): String = {
    val rows = Similarity.pqCodebook(8, 16, 8, tag).map { case (m, c, v) =>
      s"($m, $c, ${v.mkString("[", ", ", "]")})"
    }.mkString(", ")
    s"seed(m, cw, cvec) AS (VALUES $rows)"
  }

  /** Product-quantization ANN ([[graft.ext.Similarity.pqTopK]]): corpus
    * compressed to 8 one-byte codes per 64-dim vector (32× smaller than
    * float32 — the index that fits in memory at 100 TB), queries scan the
    * CODES via an ADC distance-table sum and only the top-50 candidates
    * touch float vectors for the exact re-rank. Sub-space distances are
    * fixed-pointed (`floor(d²·1e6 + 0.5)` int64) immediately after a
    * bit-exact ordered fold, so the ADC sum is an integer sum — the
    * oracle replays codebook TRAINING (one fixed-point k-means step per
    * sub-space, [[graft.ext.Similarity.pqTrainedCodebook]] — recall@3
    * 0.38 at this budget, ~2× the untrained seeds at tight budgets),
    * encode, scan, and re-rank exactly.
    */
  val q180AnnPq: QuerySpec = QuerySpec.oracled(
    "q180_ann_pq",
    s"""$normCte,
       |${pqCbSql()},
       |cs AS (
       |  SELECT vec_id AS cid, CAST(t.mi AS INT) AS m,
       |    list_slice(embedding, t.mi * 8 + 1, t.mi * 8 + 8) AS sub
       |  FROM embeddings CROSS JOIN range(8) t(mi)),
       |sd0 AS (
       |  SELECT cs.cid, cs.m, seed.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (cs.sub[i]::DOUBLE - seed.cvec[i]) *
       |             (cs.sub[i]::DOUBLE - seed.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS d2u
       |  FROM cs JOIN seed USING (m)),
       |sasg AS (
       |  SELECT cid, m, cw FROM (
       |    SELECT cid, m, cw,
       |      row_number() OVER (PARTITION BY cid, m ORDER BY d2u, cw) AS rk
       |    FROM sd0) WHERE rk = 1),
       |fx AS (
       |  SELECT sasg.m, sasg.cw, t.i,
       |    sum(CAST(floor(cs.sub[t.i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM sasg
       |  JOIN cs ON cs.cid = sasg.cid AND cs.m = sasg.m
       |  CROSS JOIN range(1, 9) t(i)
       |  GROUP BY 1, 2, 3),
       |cent AS (
       |  SELECT m, cw,
       |    list(CAST(s AS DOUBLE) / cnt / 1000000.0 ORDER BY i) AS tvec
       |  FROM fx GROUP BY 1, 2),
       |cb AS (
       |  SELECT seed.m, seed.cw, coalesce(cent.tvec, seed.cvec) AS cvec
       |  FROM seed LEFT JOIN cent
       |    ON cent.m = seed.m AND cent.cw = seed.cw),
       |d0 AS (
       |  SELECT cs.cid, cs.m, cb.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (cs.sub[i]::DOUBLE - cb.cvec[i]) *
       |             (cs.sub[i]::DOUBLE - cb.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS d2u
       |  FROM cs JOIN cb USING (m)),
       |enc AS (
       |  SELECT cid, m, cw FROM (
       |    SELECT cid, m, cw,
       |      row_number() OVER (PARTITION BY cid, m ORDER BY d2u, cw) AS rk
       |    FROM d0) WHERE rk = 1),
       |qt AS (SELECT cid AS qid, m, cw, d2u FROM d0 WHERE cid < 20),
       |adc AS (
       |  SELECT qt.qid, enc.cid, CAST(sum(qt.d2u) AS BIGINT) AS ad2u
       |  FROM enc JOIN qt ON enc.m = qt.m AND enc.cw = qt.cw
       |  WHERE enc.cid <> qt.qid
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY ad2u, cid) AS crk
       |    FROM adc) WHERE crk <= 50),
       |scored AS (
       |  SELECT cand.qid AS query_id, cand.cid AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM cand
       |  JOIN nv q ON q.vec_id = cand.qid
       |  JOIN nv c ON c.vec_id = cand.cid),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
       |  round(cosine, 6) AS cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.pqTopK(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 3,
      numSub = 8, codebookSize = 16, dim = Dim, candidates = 50)
      .orderBy("query_id", "rank")
  }

  /** PQ re-rank budget curve ([[graft.ext.Similarity.pqRerankCurve]]):
    * recall@3 of the trained-PQ ADC pipeline at candidate budgets
    * 10/25/50, against the exact brute-force top-3 — the audit that
    * justifies a re-rank budget before the 100 TB run. One encode + one
    * ADC ranking + one exact re-rank at the largest budget; smaller
    * budgets are prefix cuts of the same ranking (nested by
    * construction). The oracle replays the whole ladder.
    */
  val q283PqRerankCurve: QuerySpec = QuerySpec.oracled(
    "q283_pq_rerank_curve",
    s"""$normCte,
       |${pqCbSql()},
       |cs AS (
       |  SELECT vec_id AS cid, CAST(t.mi AS INT) AS m,
       |    list_slice(embedding, t.mi * 8 + 1, t.mi * 8 + 8) AS sub
       |  FROM embeddings CROSS JOIN range(8) t(mi)),
       |sd0 AS (
       |  SELECT cs.cid, cs.m, seed.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (cs.sub[i]::DOUBLE - seed.cvec[i]) *
       |             (cs.sub[i]::DOUBLE - seed.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS d2u
       |  FROM cs JOIN seed USING (m)),
       |sasg AS (
       |  SELECT cid, m, cw FROM (
       |    SELECT cid, m, cw,
       |      row_number() OVER (PARTITION BY cid, m ORDER BY d2u, cw) AS rk
       |    FROM sd0) WHERE rk = 1),
       |fx AS (
       |  SELECT sasg.m, sasg.cw, t.i,
       |    sum(CAST(floor(cs.sub[t.i]::DOUBLE * 1000000 + 0.5) AS BIGINT))
       |      AS s,
       |    count(*) AS cnt
       |  FROM sasg
       |  JOIN cs ON cs.cid = sasg.cid AND cs.m = sasg.m
       |  CROSS JOIN range(1, 9) t(i)
       |  GROUP BY 1, 2, 3),
       |cent AS (
       |  SELECT m, cw,
       |    list(CAST(s AS DOUBLE) / cnt / 1000000.0 ORDER BY i) AS tvec
       |  FROM fx GROUP BY 1, 2),
       |cb AS (
       |  SELECT seed.m, seed.cw, coalesce(cent.tvec, seed.cvec) AS cvec
       |  FROM seed LEFT JOIN cent
       |    ON cent.m = seed.m AND cent.cw = seed.cw),
       |d0 AS (
       |  SELECT cs.cid, cs.m, cb.cw,
       |    CAST(floor(list_reduce(list_prepend(0.0,
       |      list_transform(range(1, 9),
       |        i -> (cs.sub[i]::DOUBLE - cb.cvec[i]) *
       |             (cs.sub[i]::DOUBLE - cb.cvec[i]))),
       |      (a, v) -> a + v) * 1000000 + 0.5) AS BIGINT) AS d2u
       |  FROM cs JOIN cb USING (m)),
       |enc AS (
       |  SELECT cid, m, cw FROM (
       |    SELECT cid, m, cw,
       |      row_number() OVER (PARTITION BY cid, m ORDER BY d2u, cw) AS rk
       |    FROM d0) WHERE rk = 1),
       |qt AS (SELECT cid AS qid, m, cw, d2u FROM d0 WHERE cid < 20),
       |adc AS (
       |  SELECT qt.qid, enc.cid, CAST(sum(qt.d2u) AS BIGINT) AS ad2u
       |  FROM enc JOIN qt ON enc.m = qt.m AND enc.cw = qt.cw
       |  WHERE enc.cid <> qt.qid
       |  GROUP BY 1, 2),
       |rkc AS (
       |  SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY ad2u, cid) AS crk
       |  FROM adc),
       |pp(b) AS (VALUES (10), (25), (50)),
       |sc AS (
       |  SELECT CAST(p.b AS BIGINT) AS budget, r.qid AS query_id,
       |    r.cid AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM rkc r JOIN pp p ON r.crk <= p.b
       |  JOIN nv q ON q.vec_id = r.qid
       |  JOIN nv c ON c.vec_id = r.cid),
       |rk2 AS (
       |  SELECT budget, query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY budget, query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM sc),
       |got AS (SELECT budget, query_id, neighbor_id FROM rk2
       |        WHERE rank <= 3),
       |tsc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM nv q JOIN nv c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |tr AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY cosine DESC, neighbor_id) AS rank
       |    FROM tsc) WHERE rank <= 3)
       |SELECT got.budget, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_matched,
       |  CAST(sum(CASE WHEN tr.query_id IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000000 // count(*) AS BIGINT) AS recall_ppm
       |FROM got LEFT JOIN tr
       |  ON got.query_id = tr.query_id
       |  AND got.neighbor_id = tr.neighbor_id
       |GROUP BY got.budget
       |ORDER BY got.budget""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    Similarity.pqRerankCurve(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 3,
      budgets = Seq(10, 25, 50), numSub = 8, codebookSize = 16, dim = Dim)
      .orderBy("budget")
  }

  /** kNN label-agreement audit ([[graft.ext.Similarity.labelAudit]]): each
    * vector's LSH-bucket top-5 neighbors vote on its class; disagreement
    * flags likely labeling errors (the confident-learning signal for
    * training-data QA). The all-vs-all candidate set stays a bucket
    * equi-self-join — Σ|bucket|² pairs, never n² — and every verdict
    * (ranking, majority, ties) is deterministic, so the oracle replays the
    * full audit. Thin buckets yield `n_neigh = 0` with NULL verdicts.
    */
  val q234LabelAudit: QuerySpec = QuerySpec.oracled(
    "q234_label_audit",
    s"""WITH nv AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |b AS (
       |  SELECT vec_id, label, embedding, nrm, ${bucketSql("embedding")}
       |    AS bucket
       |  FROM nv),
       |sc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    c.label AS n_label,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM b q JOIN b c
       |    ON q.bucket = c.bucket AND c.vec_id <> q.vec_id),
       |rk AS (
       |  SELECT query_id, neighbor_id, n_label,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM sc),
       |tk AS (SELECT query_id, neighbor_id, n_label FROM rk WHERE rank <= 5),
       |nn AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_neigh
       |  FROM tk GROUP BY 1),
       |vt AS (
       |  SELECT query_id, n_label, CAST(count(*) AS BIGINT) AS votes
       |  FROM tk GROUP BY 1, 2),
       |tp AS (
       |  SELECT query_id, n_label AS top_label, votes AS top_votes FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY votes DESC, n_label) AS vr
       |    FROM vt) WHERE vr = 1)
       |SELECT b.vec_id, b.label,
       |  CAST(coalesce(nn.n_neigh, 0) AS BIGINT) AS n_neigh,
       |  tp.top_label, tp.top_votes, (tp.top_label = b.label) AS agree
       |FROM b
       |LEFT JOIN nn ON b.vec_id = nn.query_id
       |LEFT JOIN tp ON b.vec_id = tp.query_id
       |ORDER BY b.vec_id""".stripMargin) { (spark, dir) =>
    Similarity.labelAudit(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      idCol = "vec_id", vecCol = "embedding", labelCol = "label",
      k = 5, numPlanes = NumPlanes, dim = Dim)
      .orderBy("vec_id")
  }

  /** NN-descent kNN-graph construction ([[Similarity.nnDescentTopK]]):
    * LSH-bucket seed graph, then ONE neighbors-of-neighbors refinement
    * round — reverse neighbors capped at k, combined lists capped at 2k
    * per shared member, candidate equi-join on the member, exact cosine
    * re-rank. Every cap and tie-break is rank-deterministic, so the
    * oracle replays the CONSTRUCTION itself (seed, reverse cap, member
    * cap, candidate join, final ranking) — the refined graph's exact
    * edges are adjudicated, not a recall statistic. This is the
    * graph-based ANN family's build step (what HNSW-style indexes
    * amortize), in pure joins + windows.
    */
  val q253NnDescent: QuerySpec = QuerySpec.oracled(
    "q253_ann_nn_descent",
    s"""$normCte,
       |b AS (
       |  SELECT vec_id, nrm, 0 AS tbl,
       |    ${bucketSliceSql("embedding", 0, 6)} AS bucket FROM nv
       |  UNION ALL SELECT vec_id, nrm, 1,
       |    ${bucketSliceSql("embedding", 6, 6)} FROM nv
       |  UNION ALL SELECT vec_id, nrm, 2,
       |    ${bucketSliceSql("embedding", 12, 6)} FROM nv
       |  UNION ALL SELECT vec_id, nrm, 3,
       |    ${bucketSliceSql("embedding", 18, 6)} FROM nv),
       |seedp AS (
       |  SELECT DISTINCT q.vec_id AS u, c.vec_id AS m
       |  FROM b q JOIN b c
       |    ON q.tbl = c.tbl AND q.bucket = c.bucket
       |    AND q.vec_id <> c.vec_id),
       |seeds AS (
       |  SELECT s.u, s.m,
       |    ${dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm)
       |      AS cosine
       |  FROM seedp s
       |  JOIN nv x ON x.vec_id = s.u
       |  JOIN nv y ON y.vec_id = s.m),
       |g0 AS (
       |  SELECT u, m, cosine FROM (
       |    SELECT u, m, cosine,
       |      row_number() OVER (PARTITION BY u
       |                         ORDER BY cosine DESC, m) AS rk
       |    FROM seeds) WHERE rk <= 4),
       |rev AS (
       |  SELECT nu AS u, nm AS m, cosine FROM (
       |    SELECT m AS nu, u AS nm, cosine,
       |      row_number() OVER (PARTITION BY m
       |                         ORDER BY cosine DESC, u) AS rr
       |    FROM g0) WHERE rr <= 4),
       |und AS (
       |  SELECT u, m, max(cosine) AS cosine FROM (
       |    SELECT u, m, cosine FROM g0
       |    UNION ALL SELECT u, m, cosine FROM rev)
       |  GROUP BY u, m),
       |capped AS (
       |  SELECT u, m FROM (
       |    SELECT u, m,
       |      row_number() OVER (PARTITION BY m
       |                         ORDER BY cosine DESC, u) AS cm
       |    FROM und) WHERE cm <= 8),
       |cand AS (
       |  SELECT a.u AS u, b.u AS m
       |  FROM capped a JOIN capped b ON a.m = b.m AND a.u <> b.u
       |  UNION
       |  SELECT u, m FROM g0),
       |scored AS (
       |  SELECT cand.u, cand.m,
       |    ${dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm)
       |      AS cosine
       |  FROM cand
       |  JOIN nv x ON x.vec_id = cand.u
       |  JOIN nv y ON y.vec_id = cand.m),
       |fin AS (
       |  SELECT u, m, cosine,
       |    row_number() OVER (PARTITION BY u
       |                       ORDER BY cosine DESC, m) AS rank
       |  FROM scored)
       |SELECT u AS query_id, CAST(rank AS INTEGER) AS rank,
       |  m AS neighbor_id, round(cosine, 6) AS cos_sim
       |FROM fin WHERE rank <= 4
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    Similarity.nnDescentTopK(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      idCol = "vec_id", vecCol = "embedding", k = 4, rounds = 1,
      seedTables = 4, seedPlanes = 6, dim = Dim)
      .orderBy("query_id", "rank")
  }

  /** One IVF probe rung of the q321 oracle: corpus in its home cell,
    * queries probing their `p` nearest cells, exact cosine re-rank,
    * top-5 — q44's chain with a parameterized probe width.
    */
  private def probeRungSql(p: Int): String =
    s"""ap$p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM qp$p q JOIN cv c
       |    ON list_contains(q.cells, c.cell) AND c.vec_id <> q.vec_id),
       |ar$p AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM ap$p),
       |at$p AS (SELECT query_id, neighbor_id FROM ar$p WHERE rank <= 5),
       |m$p AS (
       |  SELECT CAST($p AS INTEGER) AS probes,
       |    CAST(count(*) AS BIGINT) AS matched
       |  FROM ext e JOIN at$p a
       |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id)""".stripMargin

  /** IVF probe-count recall curve — the standard ANN operating-point
    * audit (the FAISS nprobe sweep): exact recall@5 of
    * [[graft.ext.Similarity.ivfTopK]] at 1 / 2 / 4 probes against the
    * brute-force truth, as exact integers (`recall_ppm = matched·10⁴`
    * over 20 queries × 5). Completes the audit family: q220 measures
    * LSH single-probe recall, q280 dimension truncation, q283 PQ
    * re-rank budgets — this is the probe axis, the knob a production
    * IVF deployment actually tunes. Both pipelines and the
    * intersection replay in the oracle, so the curve is adjudicated,
    * not sampled.
    */
  val q321IvfProbeCurve: QuerySpec = QuerySpec.oracled(
    "q321_ivf_probe_curve",
    s"""$normCte,
       |cv AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, (${ivfCellsSql("embedding")})[1]
       |    AS cell
       |  FROM nv),
       |exs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM nv q JOIN nv c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |exr AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM exs),
       |ext AS (SELECT query_id, neighbor_id FROM exr WHERE rank <= 5),
       |${Seq(1, 2, 4).map(p =>
            s"""qp$p AS MATERIALIZED (
               |  SELECT vec_id, embedding, nrm,
               |    (${ivfCellsSql("embedding")})[1:$p] AS cells
               |  FROM nv WHERE vec_id < 20),
               |${probeRungSql(p)}""".stripMargin).mkString(",\n")}
       |SELECT probes, CAST(20 AS BIGINT) AS n_queries, matched,
       |  CAST(matched * 10000 AS BIGINT) AS recall_ppm
       |FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2
       |      UNION ALL SELECT * FROM m4)
       |ORDER BY probes""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    Seq(1, 2, 4).map { p =>
      val ap = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          k = 5, numCentroids = NumCentroids, dim = Dim, numProbes = p)
        .select("query_id", "neighbor_id")
      exact.join(ap, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("matched"))
        .select(lit(p).as("probes"), lit(20L).as("n_queries"),
          col("matched"), (col("matched") * 10000).as("recall_ppm"))
    }.reduce(_.unionByName(_)).orderBy("probes")
  }

  val all: Seq[QuerySpec] =
    Seq(q21AnnBruteForce, q22AnnLsh, q31EmbeddingNearDup,
      q41EmbeddingNearDupLsh, q42AnnLshMultiprobe, q44AnnIvf,
      q48QuantizeInt8, q53EmbeddingNearDupHi, q55AnnIvfLloyd,
      q97SemanticDedup, q140CentroidPool, q180AnnPq, q202AnnInt8,
      q220AnnRecall, q234LabelAudit, q253NnDescent, q271AnnIndexFold,
      q274AnnIvfPq, q279ProtoPrune, q280TruncationRecall,
      q281AnnIndexStream, q283PqRerankCurve, q286MarginMining,
      q295KCenterCoreset, q302MarginAnnExhaustive, q303MarginAnnIvf,
      q304AnnIndexPq, q321IvfProbeCurve)

  /** ANN recall@5 audit: the LSH index's top-5 (q22 parameters) against
    * the exact brute-force top-5 per query, as exact integers — matched
    * count and `recall_ppm = matched · 200000` — the q215 discipline
    * applied to the ANN family: the measurement harness that justifies
    * `numPlanes` in production (single-probe recall is the number
    * multi-probe q42 exists to raise). `n_approx` < 5 exposes queries
    * whose bucket was thinner than k. Both pipelines and the intersection
    * are replayed in the oracle, so the recall NUMBERS are adjudicated,
    * not sampled.
    */
  lazy val q220AnnRecall: QuerySpec = QuerySpec.oracled(
    "q220_ann_recall",
    s"""$normCte,
       |b AS (
       |  SELECT vec_id, embedding, nrm, ${bucketSql("embedding")} AS bucket
       |  FROM nv),
       |exs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM nv q JOIN nv c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |exr AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM exs),
       |ext AS (SELECT query_id, neighbor_id FROM exr WHERE rank <= 5),
       |aps AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
       |      AS cosine
       |  FROM b q JOIN b c
       |    ON q.bucket = c.bucket AND q.vec_id < 20
       |    AND c.vec_id <> q.vec_id),
       |apr AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM aps),
       |apt AS (SELECT query_id, neighbor_id FROM apr WHERE rank <= 5),
       |m AS (
       |  SELECT e.query_id, count(*) AS matched
       |  FROM ext e JOIN apt a ON e.query_id = a.query_id
       |    AND e.neighbor_id = a.neighbor_id
       |  GROUP BY 1),
       |na AS (SELECT query_id, count(*) AS n_approx FROM apt GROUP BY 1),
       |qq AS (SELECT vec_id AS query_id FROM nv WHERE vec_id < 20)
       |SELECT qq.query_id,
       |  CAST(coalesce(na.n_approx, 0) AS BIGINT) AS n_approx,
       |  CAST(coalesce(m.matched, 0) AS BIGINT) AS matched,
       |  CAST(coalesce(m.matched, 0) * 200000 AS BIGINT) AS recall_ppm
       |FROM qq LEFT JOIN na ON qq.query_id = na.query_id
       |LEFT JOIN m ON qq.query_id = m.query_id
       |ORDER BY qq.query_id""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val approx = Similarity.lshTopK(emb, queries,
        "vec_id", "embedding", k = 5, numPlanes = NumPlanes, dim = Dim)
      .select("query_id", "neighbor_id")
    val matched = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("matched"))
    val nApprox = approx.groupBy("query_id")
      .agg(count(lit(1)).as("n_approx"))
    queries.select(col("vec_id").as("query_id"))
      .join(nApprox, Seq("query_id"), "left")
      .join(matched, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_approx"), lit(0L)).as("n_approx"),
        coalesce(col("matched"), lit(0L)).as("matched"),
        (coalesce(col("matched"), lit(0L)) * 200000).as("recall_ppm"))
      .orderBy("query_id")
  }

  /** Int8 integer-dot ANN ([[graft.ext.Retrieval.int8TopK]]): corpus and
    * queries quantized per q48's abs-max scheme, candidates scored by the
    * EXACT BIGINT dot of the int8 code vectors, ranked by the de-scaled
    * approximate dot in integer micro-units. The memory-bound scale path
    * q48 exists for: 4× less scan traffic than float32 and an
    * integer-accumulate inner loop, with recall degrading only by
    * quantization noise (PipelineOpsSpec bounds it). Ranking and hashing
    * both key on BIGINTs — the only floats are the two per-vector scales,
    * multiplied once per pair from identical 9-dp-rounded operands.
    */
  lazy val q202AnnInt8: QuerySpec = QuerySpec.oracled(
    "q202_ann_int8",
    s"""WITH m AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
       |      AS maxabs
       |  FROM embeddings),
       |qz AS (
       |  SELECT vec_id,
       |    CASE WHEN maxabs > 0 THEN list_transform(embedding,
       |      x -> CAST(floor(x::DOUBLE * 127.0 / maxabs + 0.5) AS INT))
       |    ELSE list_transform(embedding, x -> 0) END AS qvec,
       |    round(CASE WHEN maxabs > 0 THEN maxabs / 127.0 ELSE 0 END, 9)
       |      AS scale
       |  FROM m),
       |qs AS (SELECT * FROM qz WHERE vec_id < 20),
       |sc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, ${Dim + 1}),
       |        i -> CAST(q.qvec[i] AS BIGINT) * c.qvec[i])),
       |      (x, y) -> x + y) AS idot,
       |    q.scale AS s_q, c.scale AS s_c
       |  FROM qs q JOIN qz c ON c.vec_id <> q.vec_id),
       |a AS (
       |  SELECT query_id, neighbor_id, idot,
       |    CAST(floor((s_q * s_c) * idot * 1000000.0 + 0.5) AS BIGINT)
       |      AS approx_dot_micro
       |  FROM sc),
       |r AS (
       |  SELECT query_id, neighbor_id, idot, approx_dot_micro,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY approx_dot_micro DESC, neighbor_id)
       |      AS rnk
       |  FROM a)
       |SELECT query_id, CAST(rnk AS INTEGER) AS rank, neighbor_id,
       |  idot, approx_dot_micro
       |FROM r WHERE rnk <= 5
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    graft.ext.Retrieval.int8TopK(
      corpus = emb,
      queries = emb.filter(col("vec_id") < 20),
      idCol = "vec_id", vecCol = "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  /** Per-label embedding centroid (mean-pool) in long form: `posexplode`
    * expands vectors to (label, pos, value) rows, values quantize to
    * exact 1e-4-step integers, and ONE partially-aggregated groupBy on
    * (label, pos) produces the pooled sums — the map-side combine means
    * the shuffle carries at most |labels|·dim rows per partition no
    * matter how many vectors feed it, which is what makes class
    * centroids / prototype vectors computable over 100 TB of
    * embeddings. Output stays long-form (label, pos) — arrays don't
    * hash portably across engines — with the mean as one fixed-order
    * division chain; reassembly to vectors is the caller's
    * `sort_array(collect_list(...))`. Oracle: DuckDB 1.0 has no UNNEST
    * WITH ORDINALITY, so it replays positions via a lateral
    * `range(len(...))` + 1-based list indexing.
    */
  lazy val q140CentroidPool: QuerySpec = QuerySpec.oracled(
    "q140_centroid_pool",
    """SELECT label, pos, count(*) AS n_vecs,
      |  CAST(sum(CAST(round(CAST(embedding[pos + 1] AS DOUBLE) * 10000)
      |    AS BIGINT)) AS BIGINT) AS s_q,
      |  (CAST(sum(CAST(round(CAST(embedding[pos + 1] AS DOUBLE) * 10000)
      |     AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 10000
      |    AS mean_val
      |FROM (
      |  SELECT label, embedding, CAST(t.p AS BIGINT) AS pos
      |  FROM embeddings, UNNEST(range(len(embedding))) AS t(p))
      |GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin) { (spark, dir) =>
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        round(col("val").cast("double") * 10000).cast("long").as("q"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n_vecs"), sum("q").as("s_q"))
      .withColumn("mean_val",
        (col("s_q").cast("double") / col("n_vecs").cast("double")) / 10000)
      .orderBy("label", "pos")
  }
}
