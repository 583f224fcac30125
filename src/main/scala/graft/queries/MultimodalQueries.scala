package graft.queries

import graft.ext.Multimodal

import org.apache.spark.sql.functions._

/** Multimodal plumbing, oracle-checked on its SQL-visible slice: payload
  * byte accounting + a payload digest. The mapPartitions decode path (fake
  * codec) is additionally exercised end-to-end and its deterministic outputs
  * (byte histogram features → dimensions) asserted in MultimodalSpec.
  */
object MultimodalQueries {

  val q27MultimodalMeta: QuerySpec = QuerySpec.oracled(
    "q27_multimodal_meta",
    """SELECT doc_id AS asset_id,
      |  octet_length(encode(text))::BIGINT AS n_bytes,
      |  substr(md5(text), 1, 8) AS payload_digest
      |FROM documents
      |ORDER BY asset_id""".stripMargin) { (spark, dir) =>
    val assets = Multimodal.assetsFromText(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
    val decoded = Multimodal.decode(assets)
    decoded.toDF()
      .select("asset_id", "n_bytes")
      // digest computed columnar on the original text (payload = UTF-8 of
      // text, so md5(text) == md5(payload))
      .join(
        spark.read.parquet(s"$dir/documents.parquet").select(
          col("doc_id").as("asset_id"),
          substring(md5(col("text")), 1, 8).as("payload_digest")),
        "asset_id")
      .orderBy("asset_id")
  }

  /** Frame sampling: 256-char frames, every 4th kept; the oracle replays
    * chunk offsets and substring digests per document.
    */
  val q45FrameSample: QuerySpec = QuerySpec.oracled(
    "q45_frame_sample",
    """SELECT asset_id, frame_idx, frame_idx * 256 AS offset_chars,
      |  md5(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256))
      |    AS frame_digest
      |FROM (
      |  SELECT doc_id AS asset_id, text,
      |    unnest(range(0, (length(text) + 255) // 256)) AS frame_idx
      |  FROM documents)
      |WHERE frame_idx % 4 = 0
      |ORDER BY asset_id, frame_idx""".stripMargin) { (spark, dir) =>
    val assets = Multimodal.assetsFromText(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
    Multimodal.sampleFrames(assets, frameChars = 256, stride = 4)
      .orderBy("asset_id", "frame_idx")
  }

  /** Resize-decode: stub original dims (md5-derived) → 32×24 target with
    * scale factors; the oracle replays the md5-byte dimension derivation.
    */
  val q46ResizeMeta: QuerySpec = QuerySpec.oracled(
    "q46_resize_meta",
    """SELECT asset_id, orig_w, orig_h, 32 AS width, 24 AS height,
      |  round(32.0 / orig_w, 6) AS scale_x,
      |  round(24.0 / orig_h, 6) AS scale_y
      |FROM (
      |  SELECT doc_id AS asset_id,
      |    1 + (('0x' || substr(md5(text), 1, 2))::INT % 64) AS orig_w,
      |    1 + (('0x' || substr(md5(text), 3, 2))::INT % 64) AS orig_h
      |  FROM documents)
      |ORDER BY asset_id""".stripMargin) { (spark, dir) =>
    val assets = Multimodal.assetsFromText(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
    Multimodal.decodeResized(assets, targetW = 32, targetH = 24)
      .select("asset_id", "orig_w", "orig_h", "width", "height",
        "scale_x", "scale_y")
      .orderBy("asset_id")
  }

  /** Binary-layer exact dedup: identical payload BYTES collapse to a
    * min-id survivor, regardless of any metadata — the first pass every
    * multimodal corpus runs (identical images re-crawled under different
    * ids). The corpus has no exact byte duplicates at gate sf, so the
    * fixture PLANTS them (q85's discipline): every %40th asset re-ingests
    * under id+10000 — the same additive injection in both engines, so the
    * dup groups are adjudicated nonzero. Digests compute map-side in the
    * scan stage, so the one shuffle carries (16-byte digest, id, length)
    * rows, never payloads — at 100 TB of media that is the entire design:
    * bytes stay where they were read. Reports only groups with copies
    * plus the bytes reclaimed by keeping one survivor each.
    */
  val q122MultimodalDedup: QuerySpec = QuerySpec.oracled(
    "q122_multimodal_dedup",
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 40 = 0),
      |h AS (
      |  SELECT doc_id AS asset_id, md5(text) AS payload_md5,
      |    octet_length(encode(text))::BIGINT AS n_bytes
      |  FROM d)
      |SELECT payload_md5, count(*) AS n_copies,
      |  min(asset_id) AS survivor_id,
      |  CAST((count(*) - 1) * min(n_bytes) AS BIGINT) AS bytes_reclaimed
      |FROM h GROUP BY payload_md5 HAVING count(*) >= 2
      |ORDER BY payload_md5""".stripMargin) { (spark, dir) =>
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val withDups = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val assets = Multimodal.assetsFromText(withDups, "doc_id", "text")
    assets.toDF()
      .select(col("asset_id"), md5(col("payload")).as("payload_md5"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy("payload_md5")
      .agg(count(lit(1)).as("n_copies"),
        min("asset_id").as("survivor_id"),
        ((count(lit(1)) - 1) * min(col("n_bytes"))).as("bytes_reclaimed"))
      .filter(col("n_copies") >= 2)
      .orderBy("payload_md5")
  }

  /** PERCEPTUAL near-dup over decoded features — q122 finds byte-identical
    * copies; this finds assets whose DECODED content matches: run the
    * batched [[graft.ext.Multimodal.decode]] (stub codec, real
    * mapPartitions plumbing), quantize the 16-lane feature histogram to a
    * 16-symbol perceptual key, and group assets by key — the pHash-bucket
    * dedup an image pipeline runs, where re-encoded/renamed copies hash
    * differently as bytes but identically as content. Quantization is
    * EXACT integer arithmetic: the normalized float lane is un-normalized
    * back to its integer count (`round(f · n_bytes)` — counts < 2^24 are
    * float-exact), then `(count · 32) div n_bytes` — no float compare
    * crosses the engine boundary, which is what makes a perceptual key
    * hash-adjudicable at all. One shuffle of (key, id) rows; payloads
    * never move.
    */
  val q167PerceptualDedup: QuerySpec = QuerySpec.oracled(
    "q167_phash_dedup",
    """WITH ch AS (
      |  SELECT doc_id, octet_length(encode(text))::BIGINT AS n,
      |    ascii(substr(text, i, 1)) % 16 AS bin
      |  FROM documents, unnest(range(1, len(text) + 1)) AS t(i)),
      |cnt AS (SELECT doc_id, any_value(n) AS n, bin, count(*) AS c
      |        FROM ch GROUP BY doc_id, bin),
      |grid AS (
      |  SELECT d.doc_id, d.n, b.bin, coalesce(cnt.c, 0) AS c
      |  FROM (SELECT DISTINCT doc_id, n FROM cnt) d
      |  CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
      |  LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.bin = b.bin),
      |keys AS (
      |  SELECT doc_id,
      |    string_agg(CAST((c * 32) // n AS VARCHAR), '-' ORDER BY bin)
      |      AS pkey
      |  FROM grid GROUP BY doc_id)
      |SELECT pkey, count(*) AS n_assets,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM keys GROUP BY 1 HAVING count(*) >= 2
      |ORDER BY 1""".stripMargin) { (spark, dir) =>
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val decoded = Multimodal.decode(
      Multimodal.assetsFromText(docs, "doc_id", "text"))
    decoded.toDF()
      .select(col("asset_id"),
        expr("array_join(transform(sequence(0, 15), i -> " +
          "CAST((CAST(round(element_at(features, i + 1) * n_bytes) " +
          "AS BIGINT) * 32) div n_bytes AS STRING)), '-')").as("pkey"))
      .groupBy("pkey")
      .agg(count(lit(1)).as("n_assets"),
        min("asset_id").as("min_id"), max("asset_id").as("max_id"))
      .filter(col("n_assets") >= 2)
      .orderBy("pkey")
  }

  /** Hamming-radius perceptual near-dup — q167's exact-key match misses a
    * re-encode that shifts ONE coarse feature bin; this finds all asset
    * pairs whose 16-symbol perceptual keys differ in ≤ 1 position, by the
    * dedup family's pigeonhole trick: split the key into 4 bands of 4 —
    * radius 1 touches at most one band, so every qualifying pair shares
    * ≥ 3 exact bands and the (band, value) equi-join loses nothing.
    * Sharper still: radius 1 leaves ≥ 3 exact bands, so some exact PAIR
    * of bands exists — the join key is a band-pair (C(4,2) = 6 per
    * asset), whose match rate is roughly the square of a single coarse
    * band's, cutting candidates multiplicatively while recall stays
    * complete. Candidates carry ids only; the exact Hamming verify is
    * one ordered integer fold over the two key arrays. Hot band-pairs
    * salt exactly like [[graft.ext.Dedup.saltedSelfJoin]].
    */
  val q187PhashHamming: QuerySpec = QuerySpec.oracled(
    "q187_phash_hamming",
    """WITH ch AS (
      |  SELECT doc_id, octet_length(encode(text))::BIGINT AS n,
      |    ascii(substr(text, i, 1)) % 16 AS bin
      |  FROM documents, unnest(range(1, len(text) + 1)) AS t(i)),
      |cnt AS (SELECT doc_id, any_value(n) AS n, bin, count(*) AS c
      |        FROM ch GROUP BY doc_id, bin),
      |grid AS (
      |  SELECT d.doc_id, d.n, b.bin, coalesce(cnt.c, 0) AS c
      |  FROM (SELECT DISTINCT doc_id, n FROM cnt) d
      |  CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
      |  LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.bin = b.bin),
      |k AS (
      |  SELECT doc_id, list(CAST((c * 32) // n AS INT) ORDER BY bin) AS kv
      |  FROM grid GROUP BY doc_id),
      |bv AS (
      |  SELECT doc_id, list_transform(range(0, 4), b ->
      |    array_to_string(list_transform(kv[b*4+1 : b*4+4],
      |      x -> x::VARCHAR), ':')) AS bvs
      |  FROM k),
      |bands AS (
      |  SELECT doc_id, t1.b1 * 4 + t2.b2 AS bp,
      |    bvs[t1.b1 + 1] || '|' || bvs[t2.b2 + 1] AS bpv
      |  FROM bv, range(0, 3) t1(b1), range(0, 4) t2(b2)
      |  WHERE t2.b2 > t1.b1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.bp = b.bp AND a.bpv = b.bpv AND a.doc_id < b.doc_id),
      |ver AS (
      |  SELECT cand.id_a, cand.id_b,
      |    CAST(list_sum(list_transform(range(1, 17),
      |      i -> CASE WHEN x.kv[i] = y.kv[i] THEN 0 ELSE 1 END))
      |      AS BIGINT) AS hamming
      |  FROM cand
      |  JOIN k x ON x.doc_id = cand.id_a
      |  JOIN k y ON y.doc_id = cand.id_b)
      |SELECT id_a, id_b, hamming FROM ver WHERE hamming <= 1
      |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val decoded = Multimodal.decode(
      Multimodal.assetsFromText(docs, "doc_id", "text"))
    val keyed = decoded.toDF().select(col("asset_id"),
      expr("transform(sequence(0, 15), i -> " +
        "CAST((CAST(round(element_at(features, i + 1) * n_bytes) " +
        "AS BIGINT) * 32) div n_bytes AS INT))").as("kv"))
    val bands = keyed
      .withColumn("bvs", expr("transform(sequence(0, 3), b -> " +
        "array_join(transform(slice(kv, b * 4 + 1, 4), " +
        "x -> CAST(x AS STRING)), ':'))"))
      .select(col("asset_id"),
        explode(expr("flatten(transform(sequence(0, 2), " +
          "b1 -> transform(sequence(b1 + 1, 3), " +
          "b2 -> struct(b1 * 4 + b2 AS bp, concat(" +
          "element_at(bvs, b1 + 1), '|', element_at(bvs, b2 + 1)) " +
          "AS bpv))))")).as("e"))
      .select(col("asset_id"), col("e.bp").as("bp"),
        col("e.bpv").as("bpv"))
    val cand = bands.select(col("asset_id").as("id_a"), col("bp"),
        col("bpv"))
      .join(bands.select(col("asset_id").as("id_b"),
        col("bp").as("bp_b"), col("bpv").as("bpv_b")),
        col("bp") === col("bp_b") && col("bpv") === col("bpv_b") &&
          col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(keyed.select(col("asset_id").as("id_a"), col("kv").as("kv_a")),
        "id_a")
      .join(keyed.select(col("asset_id").as("id_b"), col("kv").as("kv_b")),
        "id_b")
      .withColumn("hamming", expr(
        "CAST(aggregate(zip_with(kv_a, kv_b, " +
          "(x, y) -> CASE WHEN x = y THEN 0 ELSE 1 END), 0, " +
          "(a, v) -> a + v) AS BIGINT)"))
      .filter(col("hamming") <= 1)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** Aspect-ratio bucketing: every asset assigned to the NEAREST of the
    * five standard training buckets (1:2, 3:4, 1:1, 4:3, 2:1) — the
    * batching prerequisite for image training (resizing a portrait to a
    * landscape canvas destroys it; bucketing batches like with like).
    * "Nearest ratio" is decided in EXACT integers: |w/h − wb/hb| ranks
    * identically to |w·hb − h·wb| · (12/hb) (12 = lcm of the hb's clears
    * the denominators), so no float ever enters the argmin and ties break
    * on bucket index — engine-identical by construction. Dims come from
    * the q46 stub decode (md5-derived, the honest fake). Scale: bucket
    * table is 5 rows broadcast; assignment is map-side; `id_sum`
    * adjudicates exact membership (the q204 discipline).
    */
  val q208AspectBuckets: QuerySpec = QuerySpec.oracled(
    "q208_aspect_buckets",
    """WITH dims AS (
      |  SELECT doc_id AS asset_id,
      |    1 + (('0x' || substr(md5(text), 1, 2))::INT % 64) AS w,
      |    1 + (('0x' || substr(md5(text), 3, 2))::INT % 64) AS h
      |  FROM documents),
      |bk AS (
      |  SELECT * FROM (VALUES (0, 1, 2), (1, 3, 4), (2, 1, 1),
      |    (3, 4, 3), (4, 2, 1)) AS t(bidx, wb, hb)),
      |scored AS (
      |  SELECT d.asset_id, d.w, d.h, b.bidx, b.wb, b.hb,
      |    abs(d.w * b.hb - d.h * b.wb) * (12 // b.hb) AS dist,
      |    row_number() OVER (PARTITION BY d.asset_id
      |                       ORDER BY abs(d.w * b.hb - d.h * b.wb)
      |                         * (12 // b.hb), b.bidx) AS rn
      |  FROM dims d CROSS JOIN bk b)
      |SELECT bidx AS bucket,
      |  wb || ':' || hb AS ratio,
      |  count(*) AS n_assets,
      |  CAST(sum(asset_id) AS BIGINT) AS id_sum
      |FROM scored WHERE rn = 1
      |GROUP BY bidx, wb, hb
      |ORDER BY bucket""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val assets = Multimodal.assetsFromText(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
    val dims = Multimodal.decode(assets).toDF()
      .select(col("asset_id"), col("width").as("w"), col("height").as("h"))
    val bk = broadcast(Seq((0, 1, 2), (1, 3, 4), (2, 1, 1), (3, 4, 3),
      (4, 2, 1)).toDF("bidx", "wb", "hb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("asset_id")
      .orderBy(col("dist"), col("bidx"))
    dims.crossJoin(bk)
      .withColumn("dist",
        abs(col("w") * col("hb") - col("h") * col("wb")) *
          expr("12 DIV hb"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("bidx").as("bucket"),
        concat(col("wb"), lit(":"), col("hb")).as("ratio"))
      .agg(count(lit(1)).as("n_assets"), sum("asset_id").as("id_sum"))
      .orderBy("bucket")
  }

  private val q324Staging = new QuerySpec.StagingCache[String]

  /** Stage the q324 image fixtures once per (JVM, dir): seven REAL PNGs
    * with deterministic pixels (BufferedImage → ImageIO PNG writer —
    * lossless, so decoded rasters are the authored rasters exactly) plus
    * one corrupt payload, as a parquet assets table.
    */
  private def stageQ324(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    q324Staging.getOrStage(dir) {
      import spark.implicits._
      val staged = QuerySpec.stagedPath("q324_images", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staged))
      def solid(r: Int, g: Int, b: Int): (Int, Int) => Int =
        (_, _) => (r << 16) | (g << 8) | b
      val fixtures: Seq[(Long, Array[Byte])] = Seq(
        1L -> Multimodal.pngBytes(9, 5, solid(10, 200, 255)),
        2L -> Multimodal.pngBytes(20, 3, solid(255, 0, 128)),
        3L -> Multimodal.pngBytes(7, 7, solid(33, 66, 99)),
        4L -> Multimodal.pngBytes(12, 30, solid(160, 160, 160)),
        5L -> Multimodal.pngBytes(33, 2, solid(17, 255, 1)),
        6L -> Multimodal.pngBytes(5, 64, solid(250, 90, 45)),
        // half-split raster: left 8 columns black, right 8 red(240) —
        // the R histogram splits 0.5/0.5 across bins 0 and 15
        7L -> Multimodal.pngBytes(16, 16,
          (x, _) => if (x < 8) 0x000000 else 0xf00000),
        8L -> "definitely not an image".getBytes("UTF-8"))
      fixtures.toDF("asset_id", "payload")
        .select(col("asset_id"), lit("image/png").as("media_type"),
          col("payload"))
        .coalesce(1).write.mode("overwrite").parquet(staged)
      staged
    }

  /** REAL image decode ([[graft.ext.Multimodal.ImageIoCodec]] —
    * javax.imageio, in the JDK, through the r7 pluggable-codec seam):
    * seven planted PNGs decode to their TRUE raster dimensions and
    * per-channel 16-bin histograms, one corrupt payload routes to the
    * error column as data. Everything adjudicated is decode-derived —
    * width/height off the raster, per-channel argmax bins, the top-R
    * bin mass in ppm (bin fractions are exact small-integer ratios, so
    * the float→ppm fix is exact) — against a hard-coded expected table:
    * the pixels are authored, PNG is lossless, the oracle KNOWS the
    * answer. A stub decode (md5-derived dims) cannot pass this row.
    */
  val q324ImageDecode: QuerySpec = QuerySpec.oracled(
    "q324_image_decode",
    """SELECT CAST(asset_id AS BIGINT) AS asset_id, decode_ok,
      |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
      |  CAST(r_bin AS BIGINT) AS r_bin, CAST(g_bin AS BIGINT) AS g_bin,
      |  CAST(b_bin AS BIGINT) AS b_bin,
      |  CAST(top_r_ppm AS BIGINT) AS top_r_ppm,
      |  CAST(error AS VARCHAR) AS error
      |FROM (VALUES
      |  (1, true, 9, 5, 0, 12, 15, 1000000, NULL),
      |  (2, true, 20, 3, 15, 0, 8, 1000000, NULL),
      |  (3, true, 7, 7, 2, 4, 6, 1000000, NULL),
      |  (4, true, 12, 30, 10, 10, 10, 1000000, NULL),
      |  (5, true, 33, 2, 1, 15, 0, 1000000, NULL),
      |  (6, true, 5, 64, 15, 5, 2, 1000000, NULL),
      |  (7, true, 16, 16, 0, 0, 0, 500000, NULL),
      |  (8, false, NULL, NULL, NULL, NULL, NULL, NULL,
      |    'undecodable image payload'))
      |  AS t(asset_id, decode_ok, width, height, r_bin, g_bin, b_bin,
      |       top_r_ppm, error)
      |ORDER BY asset_id""".stripMargin) { (spark, dir) =>
    val staged = stageQ324(spark, dir)
    import spark.implicits._
    val assets = spark.read.parquet(staged)
      .select("asset_id", "media_type", "payload").as[graft.ext.Asset]
    Multimodal.decodeWith(assets, Multimodal.ImageIoCodec).toDF()
      .select(
        col("asset_id"),
        col("error").isNull.as("decode_ok"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        expr("array_position(slice(decoded.features, 1, 16), " +
          "array_max(slice(decoded.features, 1, 16))) - 1").as("r_bin"),
        expr("array_position(slice(decoded.features, 17, 16), " +
          "array_max(slice(decoded.features, 17, 16))) - 1").as("g_bin"),
        expr("array_position(slice(decoded.features, 33, 16), " +
          "array_max(slice(decoded.features, 33, 16))) - 1").as("b_bin"),
        expr("CAST(floor(array_max(slice(decoded.features, 1, 16)) " +
          "* 1000000 + 0.5) AS BIGINT)").as("top_r_ppm"),
        col("error"))
      .orderBy("asset_id")
  }.withSetup((s, d) => { stageQ324(s, d); () })

  private val q336Staging = new QuerySpec.StagingCache[String]

  /** Stage the q336 audio fixtures once per (JVM, dir): five REAL WAVs
    * with deterministic 16-bit PCM (JDK WAV writer — lossless) plus one
    * corrupt payload, as a parquet assets table.
    */
  private def stageQ336(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    q336Staging.getOrStage(dir) {
      import spark.implicits._
      val staged = QuerySpec.stagedPath("q336_audio", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staged))
      val fixtures: Seq[(Long, Array[Byte])] = Seq(
        1L -> Multimodal.wavBytes(100, 1, 8000f, (_, _) => 1000.toShort),
        2L -> Multimodal.wavBytes(64, 2, 16000f, (_, _) => 5000.toShort),
        // alternating ±20000: |amp| constant -> one bin
        3L -> Multimodal.wavBytes(32, 1, 8000f,
          (f, _) => (if (f % 2 == 0) 20000 else -20000).toShort),
        // stereo split: silent left channel, loud right -> 0.5/0.5 bins
        4L -> Multimodal.wavBytes(16, 2, 8000f,
          (_, c) => (if (c == 0) 0 else 30000).toShort),
        // full-scale negative clamps to 32767 -> top bin
        5L -> Multimodal.wavBytes(50, 1, 8000f, (_, _) => Short.MinValue),
        6L -> "definitely not audio".getBytes("UTF-8"))
      fixtures.toDF("asset_id", "payload")
        .select(col("asset_id"), lit("audio/wav").as("media_type"),
          col("payload"))
        .coalesce(1).write.mode("overwrite").parquet(staged)
      staged
    }

  /** REAL PCM audio decode ([[graft.ext.Multimodal.WavCodec]] —
    * javax.sound.sampled, in the JDK, through the same pluggable codec
    * seam as q324's images): five planted WAVs decode to their TRUE
    * frame counts, channel counts, and |amplitude| histograms; one
    * corrupt payload routes to the error column as data. Adjudicated
    * against a hard-coded expected table — the PCM is authored and WAV
    * is lossless, so the oracle KNOWS the answer; a stub decode cannot
    * pass. Video stays the honestly-blocked leg (no JDK codec).
    */
  val q336AudioDecode: QuerySpec = QuerySpec.oracled(
    "q336_audio_decode",
    """SELECT CAST(asset_id AS BIGINT) AS asset_id, decode_ok,
      |  CAST(frames AS INTEGER) AS frames,
      |  CAST(channels AS INTEGER) AS channels,
      |  CAST(amp_bin AS BIGINT) AS amp_bin,
      |  CAST(top_ppm AS BIGINT) AS top_ppm,
      |  CAST(error AS VARCHAR) AS error
      |FROM (VALUES
      |  (1, true, 100, 1, 0, 1000000, NULL),
      |  (2, true, 64, 2, 2, 1000000, NULL),
      |  (3, true, 32, 1, 9, 1000000, NULL),
      |  (4, true, 16, 2, 0, 500000, NULL),
      |  (5, true, 50, 1, 15, 1000000, NULL),
      |  (6, false, NULL, NULL, NULL, NULL, 'undecodable audio payload'))
      |  AS t(asset_id, decode_ok, frames, channels, amp_bin, top_ppm,
      |       error)
      |ORDER BY asset_id""".stripMargin) { (spark, dir) =>
    val staged = stageQ336(spark, dir)
    import spark.implicits._
    val assets = spark.read.parquet(staged)
      .select("asset_id", "media_type", "payload").as[graft.ext.Asset]
    Multimodal.decodeWith(assets, Multimodal.WavCodec).toDF()
      .select(
        col("asset_id"),
        col("error").isNull.as("decode_ok"),
        col("decoded.width").as("frames"),
        col("decoded.height").as("channels"),
        expr("array_position(decoded.features, " +
          "array_max(decoded.features)) - 1").as("amp_bin"),
        expr("CAST(floor(array_max(decoded.features) " +
          "* 1000000 + 0.5) AS BIGINT)").as("top_ppm"),
        col("error"))
      .orderBy("asset_id")
  }.withSetup((s, d) => { stageQ336(s, d); () })

  /** REAL image resize-decode ([[graft.ext.Multimodal.ImageResizeCodec]]
    * — q324's planted PNGs decoded AT a 6×6 target raster through the
    * deterministic nearest-neighbor remap, histograms recomputed on the
    * TARGET pixels): the resize leg of the multimodal pipeline is no
    * longer stub-based (q46 keeps the stub twin for the honest-fake
    * path). The half-split fixture proves the remap is real: at 16×16 →
    * 6×6 exactly ⌈6·8/16⌉ = 3 of 6 destination columns map to the black
    * half, so the R histogram lands 0.5/0.5 — a codec that scored the
    * SOURCE raster would land 0.5/0.5 too, but one that merely copied
    * q324's features would carry the wrong original-dims tail, and any
    * interpolating resampler would smear the solid bins. Expected table
    * hand-computed from the authored pixels.
    */
  val q337ImageResize: QuerySpec = QuerySpec.oracled(
    "q337_image_resize",
    """SELECT CAST(asset_id AS BIGINT) AS asset_id, decode_ok,
      |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
      |  CAST(orig_w AS INTEGER) AS orig_w,
      |  CAST(orig_h AS INTEGER) AS orig_h,
      |  CAST(r_bin AS BIGINT) AS r_bin,
      |  CAST(top_r_ppm AS BIGINT) AS top_r_ppm,
      |  CAST(error AS VARCHAR) AS error
      |FROM (VALUES
      |  (1, true, 6, 6, 9, 5, 0, 1000000, NULL),
      |  (2, true, 6, 6, 20, 3, 15, 1000000, NULL),
      |  (3, true, 6, 6, 7, 7, 2, 1000000, NULL),
      |  (4, true, 6, 6, 12, 30, 10, 1000000, NULL),
      |  (5, true, 6, 6, 33, 2, 1, 1000000, NULL),
      |  (6, true, 6, 6, 5, 64, 15, 1000000, NULL),
      |  (7, true, 6, 6, 16, 16, 0, 500000, NULL),
      |  (8, false, NULL, NULL, NULL, NULL, NULL, NULL,
      |    'undecodable image payload'))
      |  AS t(asset_id, decode_ok, width, height, orig_w, orig_h, r_bin,
      |       top_r_ppm, error)
      |ORDER BY asset_id""".stripMargin) { (spark, dir) =>
    val staged = stageQ324(spark, dir) // the same planted PNGs
    import spark.implicits._
    val assets = spark.read.parquet(staged)
      .select("asset_id", "media_type", "payload").as[graft.ext.Asset]
    Multimodal.decodeWith(assets, Multimodal.ImageResizeCodec(6, 6)).toDF()
      .select(
        col("asset_id"),
        col("error").isNull.as("decode_ok"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        expr("CAST(element_at(decoded.features, 49) AS INT)").as("orig_w"),
        expr("CAST(element_at(decoded.features, 50) AS INT)").as("orig_h"),
        expr("array_position(slice(decoded.features, 1, 16), " +
          "array_max(slice(decoded.features, 1, 16))) - 1").as("r_bin"),
        expr("CAST(floor(array_max(slice(decoded.features, 1, 16)) " +
          "* 1000000 + 0.5) AS BIGINT)").as("top_r_ppm"),
        col("error"))
      .orderBy("asset_id")
  }.withSetup((s, d) => { stageQ324(s, d); () })

  private val q338Staging = new QuerySpec.StagingCache[String]

  /** Stage the q338 animated-GIF fixtures once per (JVM, dir): two REAL
    * multi-frame GIFs (JDK sequence writer — lossless for small
    * palettes) plus one corrupt payload.
    */
  private def stageQ338(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    q338Staging.getOrStage(dir) {
      import spark.implicits._
      val staged = QuerySpec.stagedPath("q338_gifs", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staged))
      def solid(c: Int): (Int, Int) => Int = (_, _) => c
      val fixtures: Seq[(Long, Array[Byte])] = Seq(
        // four solid frames, distinct colors
        1L -> Multimodal.gifBytes(5, 3, Seq(
          solid(0xc80000), solid(0x00c800), solid(0x0000c8),
          solid(0x646464))),
        // frame 0: half-split tie (dominant = smaller color); frame 1:
        // solid; frame 2: near-solid with one outlier pixel
        2L -> Multimodal.gifBytes(4, 4, Seq(
          (x, _) => if (x < 2) 0x111111 else 0x222222,
          solid(0x333333),
          (x, y) => if (x == 0 && y == 0) 0xffffff else 0x0a0a0a)),
        3L -> "definitely not a gif".getBytes("UTF-8"))
      fixtures.toDF("asset_id", "payload")
        .select(col("asset_id"), lit("image/gif").as("media_type"),
          col("payload"))
        .coalesce(1).write.mode("overwrite").parquet(staged)
      staged
    }

  /** REAL multi-frame extraction ([[graft.ext.Multimodal.gifFrames]] —
    * animated GIF, the one sequence container javax.imageio decodes):
    * every SECOND frame sampled (the stride knob), per-frame true dims
    * and dominant packed RGB adjudicated against a hand-computed table
    * — frame 1 of asset 2 must be ABSENT (stride), the half-split
    * frame's tie must resolve to the smaller color, the outlier pixel
    * must not flip the dominant, and the corrupt payload must land as
    * one error row. True video (mp4/webm) stays the honestly-blocked
    * stub leg.
    */
  val q338GifFrames: QuerySpec = QuerySpec.oracled(
    "q338_gif_frames",
    """SELECT CAST(asset_id AS BIGINT) AS asset_id,
      |  CAST(frame_idx AS INTEGER) AS frame_idx,
      |  CAST(width AS INTEGER) AS width,
      |  CAST(height AS INTEGER) AS height,
      |  CAST(dom_rgb AS BIGINT) AS dom_rgb,
      |  CAST(error AS VARCHAR) AS error
      |FROM (VALUES
      |  (1, 0, 5, 3, 13107200, NULL),
      |  (1, 2, 5, 3, 200, NULL),
      |  (2, 0, 4, 4, 1118481, NULL),
      |  (2, 2, 4, 4, 657930, NULL),
      |  (3, NULL, NULL, NULL, NULL, 'undecodable gif payload'))
      |  AS t(asset_id, frame_idx, width, height, dom_rgb, error)
      |ORDER BY asset_id, frame_idx""".stripMargin) { (spark, dir) =>
    val staged = stageQ338(spark, dir)
    import spark.implicits._
    val assets = spark.read.parquet(staged)
      .select("asset_id", "media_type", "payload").as[graft.ext.Asset]
    Multimodal.gifFrames(assets, stride = 2).toDF()
      .orderBy("asset_id", "frame_idx")
  }.withSetup((s, d) => { stageQ338(s, d); () })

  val all: Seq[QuerySpec] =
    Seq(q27MultimodalMeta, q45FrameSample, q46ResizeMeta,
      q122MultimodalDedup, q167PerceptualDedup, q187PhashHamming,
      q208AspectBuckets, q324ImageDecode, q336AudioDecode,
      q337ImageResize, q338GifFrames)
}
