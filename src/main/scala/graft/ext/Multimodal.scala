package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: an opaque binary payload plus typed metadata.
  * Image/audio/video bytes live in `payload` (parquet BINARY — column-store
  * friendly, no small-file problem); decoded features are typed columns.
  */
final case class Asset(
    asset_id: Long,
    media_type: String,
    payload: Array[Byte])

/** Decoded view of an asset. Images decode for REAL via
  * [[Multimodal.ImageIoCodec]] (javax.imageio — in the JDK) and PCM
  * audio via [[Multimodal.WavCodec]] (javax.sound.sampled — also JDK);
  * for media the JDK has no codec for (video, compressed audio),
  * [[Multimodal.StubCodec]] derives deterministic fake
  * dimensions/features from the payload bytes while keeping the
  * pipeline shape — binary column in, typed struct + feature vector
  * out, batched per-partition processing — identical to what a native
  * codec drops into.
  */
final case class DecodedAsset(
    asset_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    features: Array[Float])

/** A decode outcome: exactly one of `decoded`/`error` is set. Errors are
  * DATA (a corrupt payload is a per-row fact to route and count, not a
  * reason to kill a 100 TB job); the caller splits on `error IS NULL`.
  */
final case class DecodeResult(
    asset_id: Long,
    decoded: Option[DecodedAsset],
    error: Option[String])

/** A pluggable media codec. `open()` runs ONCE per partition (where a
  * native decoder context — libjpeg handle, ffmpeg demuxer — is
  * initialized); the returned session decodes that partition's assets
  * and is closed when the task completes, success or failure. The trait
  * is the seam a real codec drops into as CONFIG, not a code change:
  * everything else ([[Multimodal.decodeWith]]'s batching, schema, error
  * routing) is codec-agnostic.
  */
trait Codec extends Serializable {
  def open(): CodecSession
}

/** One partition's live decoder: [[decode]] returns Right(decoded) or
  * Left(errorMessage) — throwing is for codec BUGS, data problems are
  * values. [[close]] releases native resources; it is invoked via a task
  * completion listener, so it runs even when downstream processing fails.
  */
trait CodecSession {
  def decode(a: Asset): Either[String, DecodedAsset]
  def close(): Unit
}

/** One decoded frame of a multi-frame asset ([[Multimodal.gifFrames]]):
  * exactly one of (frame fields)/`error` is populated — a corrupt asset
  * is one error row, not a killed job.
  */
final case class FrameDecode(
    asset_id: Long,
    frame_idx: Option[Int],
    width: Option[Int],
    height: Option[Int],
    dom_rgb: Option[Long],
    error: Option[String])

/** Multimodal-column plumbing (SURVEY extension): treat media as opaque
  * `binary` columns, decode/feature-extract per partition.
  *
  * Scale design: `mapPartitions` keeps the (expensive, native-library)
  * decoder amortized over a whole batch per task — the Scala analogue of a
  * vectorized Python `mapInPandas` decode; rows never hit the driver; the
  * binary column rides normal parquet encodings so predicate pushdown on the
  * metadata columns still prunes row groups before any payload is read.
  * Partition sizing: payloads dominate row width — size
  * `spark.sql.files.maxPartitionBytes` so a batch of payloads fits executor
  * memory (e.g. 128 MB batches of ~1 MB images).
  */
object Multimodal {

  /** Wrap a text corpus as fake binary assets (fixture generator: payload =
    * UTF-8 bytes). In production this is `spark.read.format("binaryFile")`
    * or a parquet table with a real bytes column.
    */
  def assetsFromText(
      df: DataFrame, idCol: String, textCol: String): Dataset[Asset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit("text/plain").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload")).as[Asset]
  }

  /** STUB decoder — deterministic fake: "dimensions" come from the first
    * md5 bytes of the payload, "features" are a fixed-length byte histogram
    * normalized to [0,1]. A real codec (JPEG decode, audio PCM, frame
    * sample) replaces only the body of `decodeOne`; the batched partition
    * shape stays.
    */
  private val digestTl =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def decodeOne(a: Asset): DecodedAsset = {
    val digest = digestTl.get()
    digest.reset()
    val md = digest.digest(a.payload)
    val hist = new Array[Float](16)
    a.payload.foreach(b => hist((b & 0xff) % 16) += 1f)
    val n = math.max(1, a.payload.length).toFloat
    DecodedAsset(
      asset_id = a.asset_id,
      media_type = a.media_type,
      n_bytes = a.payload.length.toLong,
      width = 1 + ((md(0) & 0xff) % 64),
      height = 1 + ((md(1) & 0xff) % 64),
      features = hist.map(_ / n))
  }

  /** The default codec: the deterministic stub decode, wrapped in the
    * pluggable seam. A real codec replaces THIS VALUE (one line of
    * config), not any pipeline code.
    */
  object StubCodec extends Codec {
    def open(): CodecSession = new CodecSession {
      def decode(a: Asset): Either[String, DecodedAsset] =
        Right(decodeOne(a))
      def close(): Unit = ()
    }
  }

  /** REAL image codec through the same seam: `javax.imageio` ships in
    * the JDK (PNG/JPEG/BMP/GIF decode, zero external dependencies), so
    * the image leg of the multimodal pipeline needs no stub. Output:
    * true raster width/height plus a 48-float feature vector — a 16-bin
    * histogram per RGB channel, each normalized by the pixel count (bin
    * = channel value / 16). Bin fractions are exact small-integer
    * ratios, so planted fixtures adjudicate bit-for-bit.
    *
    * Error routing is DATA, not failure: bytes no installed reader
    * recognizes (`ImageIO.read` returns null) or that throw mid-decode
    * route to the `error` column and the 100 TB job keeps running.
    * Video/audio remain honestly blocked — no codec for them ships in
    * the JDK; their path stays [[StubCodec]]/[[sampleFrames]]-shaped.
    */
  object ImageIoCodec extends Codec {
    def open(): CodecSession = new CodecSession {
      def decode(a: Asset): Either[String, DecodedAsset] =
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload))
          if (img == null) Left("undecodable image payload")
          else {
            val w = img.getWidth
            val h = img.getHeight
            val hist = new Array[Float](48)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                hist(((rgb >> 16) & 0xff) >> 4) += 1f
                hist(16 + (((rgb >> 8) & 0xff) >> 4)) += 1f
                hist(32 + ((rgb & 0xff) >> 4)) += 1f
                x += 1
              }
              y += 1
            }
            val n = (w.toLong * h.toLong).toFloat
            Right(DecodedAsset(
              asset_id = a.asset_id,
              media_type = a.media_type,
              n_bytes = a.payload.length.toLong,
              width = w,
              height = h,
              features = hist.map(_ / n)))
          }
        } catch {
          case e: Exception =>
            Left(s"image decode failed: ${e.getClass.getSimpleName}")
        }
      def close(): Unit = ()
    }
  }

  /** REAL audio codec through the same seam: `javax.sound.sampled` ships
    * in the JDK (WAV/AIFF/AU — uncompressed PCM decode, zero external
    * deps), so the audio leg needs no stub either. Decodes 16-bit signed
    * PCM; output maps the [[DecodedAsset]] contract as width = FRAMES
    * (samples per channel), height = CHANNELS, features = a 16-bin
    * histogram of |amplitude| (bin = |sample| / 2048, clamped) normalized
    * by total sample count — exact small-integer ratios, so planted
    * fixtures adjudicate bit-for-bit. Unsupported containers, compressed
    * encodings, and non-16-bit widths route to the error column as data.
    * VIDEO remains the honestly-blocked leg — the JDK ships no video
    * codec; its path stays [[StubCodec]]/[[sampleFrames]]-shaped.
    */
  object WavCodec extends Codec {
    def open(): CodecSession = new CodecSession {
      def decode(a: Asset): Either[String, DecodedAsset] =
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(a.payload))
          val fmt = ais.getFormat
          if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            Left(s"unsupported audio encoding: ${fmt.getEncoding}")
          else if (fmt.getSampleSizeInBits != 16)
            Left(s"unsupported sample width: ${fmt.getSampleSizeInBits}")
          else {
            val bytes = ais.readAllBytes()
            val big = fmt.isBigEndian
            val nSamples = bytes.length / 2
            val hist = new Array[Float](16)
            var i = 0
            while (i < nSamples) {
              val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
              val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
              val s = (hi << 8) | lo
              val abs = math.min(math.abs(s), 32767)
              hist(abs >> 11) += 1f
              i += 1
            }
            val channels = fmt.getChannels
            val frames = nSamples / channels
            Right(DecodedAsset(
              asset_id = a.asset_id,
              media_type = a.media_type,
              n_bytes = a.payload.length.toLong,
              width = frames,
              height = channels,
              features = hist.map(_ / math.max(1, nSamples).toFloat)))
          }
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException =>
            Left("undecodable audio payload")
          case e: Exception =>
            Left(s"audio decode failed: ${e.getClass.getSimpleName}")
        }
      def close(): Unit = ()
    }
  }

  /** REAL image decode AT A TARGET RASTER through the same seam — the
    * resize leg, no longer stub-based: decode via javax.imageio, remap
    * to `targetW`×`targetH` by NEAREST-NEIGHBOR (dst(x,y) = src(⌊x·W/tW⌋,
    * ⌊y·H/tH⌋) — explicit integer pixel mapping, no Graphics2D
    * interpolation, so the resample is bit-deterministic on any JVM),
    * and compute the per-channel histograms ON THE TARGET raster.
    * Output dims are the target; the ORIGINAL dims ride in the features
    * tail (lanes 48, 49 — a decode-derived fact the caller would
    * otherwise lose). Error routing as in [[ImageIoCodec]].
    */
  final case class ImageResizeCodec(targetW: Int, targetH: Int)
      extends Codec {
    require(targetW > 0 && targetH > 0,
      s"ImageResizeCodec: target must be positive, got $targetW x $targetH")
    def open(): CodecSession = new CodecSession {
      def decode(a: Asset): Either[String, DecodedAsset] =
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload))
          if (img == null) Left("undecodable image payload")
          else {
            val sw = img.getWidth
            val sh = img.getHeight
            val hist = new Array[Float](50)
            var y = 0
            while (y < targetH) {
              val sy = y.toLong * sh / targetH
              var x = 0
              while (x < targetW) {
                val sx = x.toLong * sw / targetW
                val rgb = img.getRGB(sx.toInt, sy.toInt)
                hist(((rgb >> 16) & 0xff) >> 4) += 1f
                hist(16 + (((rgb >> 8) & 0xff) >> 4)) += 1f
                hist(32 + ((rgb & 0xff) >> 4)) += 1f
                x += 1
              }
              y += 1
            }
            val n = (targetW.toLong * targetH.toLong).toFloat
            var i = 0
            while (i < 48) { hist(i) /= n; i += 1 }
            hist(48) = sw.toFloat
            hist(49) = sh.toFloat
            Right(DecodedAsset(
              asset_id = a.asset_id,
              media_type = a.media_type,
              n_bytes = a.payload.length.toLong,
              width = targetW,
              height = targetH,
              features = hist))
          }
        } catch {
          case e: Exception =>
            Left(s"image decode failed: ${e.getClass.getSimpleName}")
        }
      def close(): Unit = ()
    }
  }

  /** WAV bytes of a deterministic 16-bit signed PCM clip (fixture
    * generator for the audio-decode gate/specs): `sampleAt(frame,
    * channel)` is the sample value. Encoded with the JDK's own WAV
    * writer — PCM is lossless, so expected frames/channels/histograms
    * are computable at authoring time.
    */
  def wavBytes(
      frames: Int, channels: Int, sampleRate: Float,
      sampleAt: (Int, Int) => Short): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, channels, /*signed=*/ true, /*bigEndian=*/ false)
    val raw = new Array[Byte](frames * channels * 2)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val s = sampleAt(f, c).toInt
        val off = 2 * (f * channels + c)
        raw(off) = (s & 0xff).toByte
        raw(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** PNG bytes of a deterministic raster (fixture generator for the
    * image-decode gate/specs): `colorAt(x, y)` is the packed 0xRRGGBB
    * pixel. Encoded with the JDK's own ImageIO PNG writer — the decode
    * side recovers the exact pixels (PNG is lossless), so expected
    * dims/histograms are computable at authoring time.
    */
  def pngBytes(w: Int, h: Int, colorAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, colorAt(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Batched decode: one decoder instance per partition (where a native
    * codec context would be initialized once), streamed over the iterator.
    * Convenience form of [[decodeWith]] for the infallible stub: decode
    * errors from a pluggable codec need [[decodeWith]]'s error routing.
    */
  def decode(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    decodeWith(assets, StubCodec)
      .flatMap(_.decoded)
  }

  /** Batched decode through a pluggable [[Codec]]: `codec.open()` runs
    * once per partition, each asset routes to `decoded` or `error`, and
    * the session closes on task completion (even on failure — a native
    * context must not leak across a task retry). The iterator is
    * consumed lazily, so payloads stream through the decoder without
    * buffering a partition in memory.
    */
  def decodeWith(
      assets: Dataset[Asset], codec: Codec): Dataset[DecodeResult] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      val session = codec.open()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => session.close()))
      it.map { a =>
        session.decode(a) match {
          case Right(d) => DecodeResult(a.asset_id, Some(d), None)
          case Left(err) => DecodeResult(a.asset_id, None, Some(err))
        }
      }
    }
  }

  /** Feature table ready for the ANN operators ([[Similarity]]): decoded
    * features as the embedding column.
    */
  def featureTable(spark: SparkSession, decoded: Dataset[DecodedAsset]): DataFrame =
    decoded.toDF().select(
      col("asset_id").as("vec_id"),
      col("features").as("embedding"))

  /** Frame sampling (the video/audio path): the payload as fixed-size
    * frames, every `stride`-th frame kept — one output row per sampled
    * frame with its index, offset, and content digest. Fully columnar
    * (sequence → explode → substring → md5), so frame rows fan out in
    * executors with no payload ever visiting the driver; downstream
    * per-frame decode/feature-extract reuses the [[decode]] batched shape.
    *
    * STUB NOTE: frames here are fixed-size CHARACTER chunks of the
    * UTF-8 payload (this container has no media codecs, and the DuckDB
    * oracle can replay character substrings but not blob slices); a real
    * container parser swaps in byte-offset framing — the fan-out plumbing,
    * schema, and stride sampling are the real thing.
    */
  def sampleFrames(
      assets: Dataset[Asset], frameChars: Int, stride: Int): DataFrame = {
    require(frameChars > 0 && stride > 0)
    assets.toDF()
      .select(col("asset_id"),
        // functions.decode (charset), not Multimodal.decode (the codec)
        org.apache.spark.sql.functions.decode(col("payload"), "UTF-8")
          .as("__txt"))
      .select(col("asset_id"), col("__txt"),
        explode(expr(
          s"IF(length(__txt) = 0, CAST(array() AS ARRAY<BIGINT>), " +
            s"sequence(0L, CAST((length(__txt) + ${frameChars - 1}) " +
            s"DIV $frameChars AS BIGINT) - 1))")).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("asset_id"), col("frame_idx"),
        (col("frame_idx") * frameChars).as("offset_chars"),
        md5(expr(s"substring(__txt, " +
          s"CAST(frame_idx * $frameChars + 1 AS INT), $frameChars)"))
          .as("frame_digest"))
  }

  /** REAL multi-frame extraction for the one "video-shaped" container
    * the JDK decodes — animated GIF (javax.imageio reads every frame of
    * a sequence; the spike-proved lossless round-trip makes planted
    * fixtures adjudicable): one row per SAMPLED frame (every `stride`-th,
    * the frame-sampling knob) with the frame's true raster dims and its
    * DOMINANT packed RGB (most frequent pixel value, ties to the
    * smallest — an integer fact both engines can state). Corrupt or
    * frameless payloads emit one error row. True video containers
    * (mp4/webm) remain the honestly-blocked leg — no JDK codec; their
    * plumbing twin stays [[sampleFrames]].
    *
    * Scale shape: one ImageReader per PARTITION (the codec-seam
    * discipline — decoder contexts amortize over a task's assets),
    * frames fan out in executors, payloads never visit the driver.
    */
  def gifFrames(
      assets: Dataset[Asset], stride: Int = 1): Dataset[FrameDecode] = {
    require(stride > 0, s"gifFrames: stride must be > 0, got $stride")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => reader.dispose()))
      it.flatMap { a =>
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(a.payload))
          reader.setInput(iis, /*seekForwardOnly=*/ false)
          val n = reader.getNumImages(/*allowSearch=*/ true)
          // bytes no GIF reader recognizes surface as ZERO frames, not
          // an exception — same routing either way
          if (n <= 0)
            Seq(FrameDecode(a.asset_id, None, None, None, None,
              Some("undecodable gif payload")))
          else (0 until n by stride).map { i =>
            val img = reader.read(i)
            val counts = new java.util.HashMap[Int, Long]()
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y) & 0xffffff
                counts.merge(rgb, 1L, (u, v) => u + v)
                x += 1
              }
              y += 1
            }
            var best = -1L
            var bestCnt = -1L
            counts.forEach { (rgb, c) =>
              if (c > bestCnt || (c == bestCnt && rgb < best)) {
                best = rgb.toLong; bestCnt = c
              }
            }
            FrameDecode(a.asset_id, Some(i), Some(img.getWidth),
              Some(img.getHeight), Some(best), None)
          }
        } catch {
          case _: Exception =>
            Seq(FrameDecode(a.asset_id, None, None, None, None,
              Some("undecodable gif payload")))
        }
      }
    }
  }

  /** Animated-GIF bytes of a deterministic frame sequence (fixture
    * generator): `frames(i)(x, y)` is frame i's packed 0xRRGGBB pixel.
    * Written with the JDK's own GIF sequence writer — palettized
    * losslessly for ≤ 256 distinct colors per frame, so expected
    * per-frame dims and dominant colors are computable at authoring
    * time.
    */
  def gifBytes(
      w: Int, h: Int, frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    require(frames.nonEmpty, "gifBytes: at least one frame")
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { colorAt =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, colorAt(x, y)); x += 1 }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Decode at a target raster size (the resize path): original dimensions
    * come from the stub decode, output dimensions are the target, scale
    * factors are carried for coordinate mapping. A real resampler would
    * recompute `features` at the target raster; the stub's byte-histogram
    * features are resolution-invariant, so they pass through unchanged —
    * the pipeline shape (batched decode → per-asset geometry columns) is
    * the real part.
    */
  def decodeResized(
      assets: Dataset[Asset], targetW: Int, targetH: Int): DataFrame =
    decode(assets).toDF()
      .select(col("asset_id"), col("media_type"), col("n_bytes"),
        col("width").as("orig_w"), col("height").as("orig_h"),
        lit(targetW).as("width"), lit(targetH).as("height"),
        round(lit(targetW.toDouble) / col("width"), 6).as("scale_x"),
        round(lit(targetH.toDouble) / col("height"), 6).as("scale_y"),
        col("features"))
}
