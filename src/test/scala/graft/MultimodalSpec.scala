package graft

import graft.ext.{Asset, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Counting fake codec: proves the [[graft.ext.Codec]] seam's init-once
  * and close-always contracts. Counters are JVM-static (object fields) —
  * valid in local mode where executors share the test JVM.
  */
object FakeCodec {
  val opens = new java.util.concurrent.atomic.AtomicInteger()
  val closes = new java.util.concurrent.atomic.AtomicInteger()
  val decodes = new java.util.concurrent.atomic.AtomicInteger()
  def reset(): Unit = { opens.set(0); closes.set(0); decodes.set(0) }
}

class FakeCodec extends graft.ext.Codec {
  def open(): graft.ext.CodecSession = {
    FakeCodec.opens.incrementAndGet()
    new graft.ext.CodecSession {
      def decode(a: graft.ext.Asset)
          : Either[String, graft.ext.DecodedAsset] = {
        FakeCodec.decodes.incrementAndGet()
        if (new String(a.payload, "UTF-8") == "CORRUPT")
          Left(s"corrupt payload for asset ${a.asset_id}")
        else Right(Multimodal.decodeOne(a))
      }
      def close(): Unit = { FakeCodec.closes.incrementAndGet(); () }
    }
  }
}

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("mapPartitions decode is deterministic and schema-stable") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")
    val decoded = Multimodal.decode(
      Multimodal.assetsFromText(docs, "doc_id", "text"))
    val rows = decoded.collect().sortBy(_.asset_id)
    assert(rows.map(_.n_bytes).toSeq == Seq(11L, 5L))
    assert(rows.forall(r => r.width >= 1 && r.width <= 64))
    assert(rows.forall(_.features.length == 16))
    // deterministic: re-running decode yields identical features
    val again = Multimodal.decode(
      Multimodal.assetsFromText(docs, "doc_id", "text"))
      .collect().sortBy(_.asset_id)
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
    // histogram is a probability mass (sums to ~1)
    assert(rows.forall(r => math.abs(r.features.sum - 1f) < 1e-3))
  }

  test("frame sampling: chunk count, stride, offsets, digest of each chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x" * 1000), // 4 frames of 256 chars (last partial) → idx 0 kept
      (2L, "y" * 2100), // 9 frames → idx 0, 4, 8
      (3L, ""), // empty payload → no frames
      (4L, "short")) // one partial frame → idx 0
      .toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.assetsFromText(docs, "doc_id", "text"),
      frameChars = 256, stride = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byAsset = frames.groupBy(_._1)
    assert(byAsset(1L).map(_._2).sorted.toSeq == Seq(0L))
    assert(byAsset(2L).map(_._2).sorted.toSeq == Seq(0L, 4L, 8L))
    assert(!byAsset.contains(3L))
    assert(byAsset(4L).map(_._2).toSeq == Seq(0L))
    assert(frames.forall { case (_, idx, off, _) => off == idx * 256 })
    // digest is of the chunk content: asset 4's only frame is the whole doc
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest("short".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(byAsset(4L).head._4 == expected)
  }

  test("resize-decode carries target dims + scale factors, features unchanged") {
    import spark.implicits._
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text")
    val orig = Multimodal.decode(assets).collect().head
    val r = Multimodal.decodeResized(assets, targetW = 32, targetH = 24)
      .collect().head
    assert(r.getAs[Int]("orig_w") == orig.width)
    assert(r.getAs[Int]("orig_h") == orig.height)
    assert(r.getAs[Int]("width") == 32 && r.getAs[Int]("height") == 24)
    assert(math.abs(r.getAs[Double]("scale_x") -
      math.rint(32.0 / orig.width * 1e6) / 1e6) < 1e-9)
    assert(r.getSeq[Float](r.fieldIndex("features")).toSeq ==
      orig.features.toSeq)
  }

  test("pluggable codec: init-once per partition, close on completion, error routing") {
    import spark.implicits._
    FakeCodec.reset()
    val docs = (1L to 40L).map(i =>
      (i, if (i % 7 == 0) "CORRUPT" else s"payload-$i")).toDF("doc_id", "text")
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text")
      .repartition(4)
    val res = Multimodal.decodeWith(assets, new FakeCodec).collect()
    // error ROUTING: corrupt payloads are rows with `error`, not task
    // failures — exactly one of decoded/error per row
    assert(res.forall(r => r.decoded.isDefined != r.error.isDefined))
    val (bad, good) = res.partition(_.error.isDefined)
    assert(bad.map(_.asset_id).sorted.toSeq ==
      (1L to 40L).filter(_ % 7 == 0), bad.mkString(","))
    assert(bad.forall(_.error.get.contains("corrupt")), bad.mkString(","))
    assert(good.length == 40 - bad.length)
    // init-ONCE semantics: one open per partition (not per row), and
    // every open was closed (the native-context leak guard)
    assert(FakeCodec.opens.get() == 4,
      s"expected 4 opens (one per partition), got ${FakeCodec.opens.get()}")
    assert(FakeCodec.closes.get() == FakeCodec.opens.get(),
      s"opens=${FakeCodec.opens.get()} closes=${FakeCodec.closes.get()}")
    // decode calls went through the SESSION (so a real codec's state is
    // reachable from every row it decodes)
    assert(FakeCodec.decodes.get() == 40)
  }

  test("feature table feeds the ANN operator shape") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val ft = Multimodal.featureTable(spark,
      Multimodal.decode(Multimodal.assetsFromText(docs, "doc_id", "text")))
    assert(ft.columns.toSeq == Seq("vec_id", "embedding"))
    val topk = graft.ext.Similarity.bruteForceTopK(
      ft, ft.filter($"vec_id" === 1L), "vec_id", "embedding", k = 1)
    val r = topk.collect()
    assert(r.length == 1 && r.head.getAs[Long]("neighbor_id") == 2L)
  }

  test("ImageIoCodec decodes real PNG bytes: true dims + exact channel histograms") {
    import spark.implicits._
    // 6×4 raster: top row red-ish (200,0,0), rest blue-ish (0,0,64)
    val bytes = Multimodal.pngBytes(6, 4,
      (_, y) => if (y == 0) 0xc80000 else 0x000040)
    val assets = Seq(Asset(1L, "image/png", bytes)).toDS()
    val out = Multimodal.decodeWith(assets, Multimodal.ImageIoCodec)
      .collect()
    assert(out.length == 1 && out.head.error.isEmpty)
    val d = out.head.decoded.get
    assert(d.width == 6 && d.height == 4)
    assert(d.features.length == 48)
    // R: 6 of 24 pixels at 200 (bin 12), 18 at 0 (bin 0)
    assert(d.features(12) == 0.25f && d.features(0) == 0.75f)
    // G: all 24 at 0
    assert(d.features(16) == 1.0f)
    // B: 18 of 24 at 64 (bin 4), 6 at 0
    assert(d.features(32 + 4) == 0.75f && d.features(32) == 0.25f)
    // each channel's histogram is a distribution
    Seq(0, 16, 32).foreach { off =>
      assert(math.abs(
        d.features.slice(off, off + 16).map(_.toDouble).sum - 1.0) < 1e-6)
    }
  }

  test("WavCodec decodes real PCM bytes: true frames/channels + exact amplitude histogram") {
    import spark.implicits._
    // 12 frames stereo: left channel quiet (500 -> bin 0), right loud
    // alternating ±10000 (bin 4)
    val bytes = Multimodal.wavBytes(12, 2, 8000f,
      (f, c) => (if (c == 0) 500 else if (f % 2 == 0) 10000 else -10000)
        .toShort)
    val out = Multimodal.decodeWith(
      Seq(Asset(1L, "audio/wav", bytes)).toDS(), Multimodal.WavCodec)
      .collect()
    assert(out.length == 1 && out.head.error.isEmpty, out.head.error)
    val d = out.head.decoded.get
    assert(d.width == 12 && d.height == 2)
    assert(d.features(0) == 0.5f && d.features(10000 >> 11) == 0.5f)
    assert(math.abs(d.features.map(_.toDouble).sum - 1.0) < 1e-6)
    // corrupt + unsupported-width payloads route as data
    val bad = Multimodal.decodeWith(
      Seq(Asset(2L, "audio/wav", "junk".getBytes("UTF-8"))).toDS(),
      Multimodal.WavCodec).collect()
    assert(bad.head.decoded.isEmpty &&
      bad.head.error.contains("undecodable audio payload"))
  }

  test("ImageResizeCodec: nearest-neighbor remap with target-raster histograms") {
    import spark.implicits._
    // 10×4 source: left 5 columns blue(64 -> bin 4), right 5 red-only;
    // at target 4×4, dst x maps to src ⌊x·10/4⌋ = 0,2,5,7 -> 2 blue cols
    val bytes = Multimodal.pngBytes(10, 4,
      (x, _) => if (x < 5) 0x000040 else 0x300000)
    val out = Multimodal.decodeWith(
      Seq(Asset(1L, "image/png", bytes)).toDS(),
      Multimodal.ImageResizeCodec(4, 4)).collect()
    assert(out.head.error.isEmpty, out.head.error)
    val d = out.head.decoded.get
    assert(d.width == 4 && d.height == 4)
    // original dims ride in the features tail
    assert(d.features(48) == 10f && d.features(49) == 4f)
    // B channel: dst cols 0,2 blue (bin 4), cols 5,7 zero (bin 0)
    assert(d.features(32 + 4) == 0.5f && d.features(32) == 0.5f)
    // R channel: two cols at 0x30 (bin 3), two at 0
    assert(d.features(3) == 0.5f && d.features(0) == 0.5f)
    val bad = Multimodal.decodeWith(
      Seq(Asset(2L, "image/png", "junk".getBytes("UTF-8"))).toDS(),
      Multimodal.ImageResizeCodec(4, 4)).collect()
    assert(bad.head.error.contains("undecodable image payload"))
    intercept[IllegalArgumentException] {
      Multimodal.ImageResizeCodec(0, 4)
    }
  }

  test("gifFrames: per-frame dims + dominant color, stride sampling, error routing") {
    import spark.implicits._
    val anim = Multimodal.gifBytes(3, 2, Seq(
      (_, _) => 0x102030,
      // well-separated colors (GIF palettization merges near-identical
      // ones): 2 pixels red-ish vs 4 pixels green-ish
      (x, _) => if (x == 0) 0x990000 else 0x009900,
      (_, _) => 0x405060))
    val out = Multimodal.gifFrames(
      Seq(Asset(1L, "image/gif", anim),
        Asset(2L, "image/gif", "nope".getBytes("UTF-8"))).toDS(),
      stride = 1)
      .collect().sortBy(r => (r.asset_id, r.frame_idx.getOrElse(-1)))
    val frames = out.filter(_.asset_id == 1L)
    assert(frames.map(_.frame_idx.get).toSeq == Seq(0, 1, 2))
    assert(frames.forall(f => f.width.contains(3) && f.height.contains(2)))
    assert(frames.map(_.dom_rgb.get).toSeq ==
      Seq(0x102030L, 0x009900L, 0x405060L))
    val err = out.filter(_.asset_id == 2L)
    assert(err.length == 1 &&
      err.head.error.contains("undecodable gif payload"))
    // stride 2 keeps frames 0 and 2 only
    val strided = Multimodal.gifFrames(
      Seq(Asset(1L, "image/gif", anim)).toDS(), stride = 2)
      .collect().flatMap(_.frame_idx).sorted.toSeq
    assert(strided == Seq(0, 2))
    intercept[IllegalArgumentException] {
      Multimodal.gifFrames(Seq(Asset(1L, "image/gif", anim)).toDS(), 0)
    }
  }

  test("ImageIoCodec routes undecodable payloads to the error column as data") {
    import spark.implicits._
    val good = Asset(1L, "image/png",
      Multimodal.pngBytes(3, 3, (_, _) => 0xffffff))
    val bad = Asset(2L, "image/png", "junk bytes".getBytes("UTF-8"))
    val out = Multimodal.decodeWith(Seq(good, bad).toDS().repartition(1),
      Multimodal.ImageIoCodec)
      .collect().sortBy(_.asset_id)
    assert(out(0).error.isEmpty &&
      out(0).decoded.exists(d => d.width == 3 && d.height == 3))
    assert(out(1).decoded.isEmpty &&
      out(1).error.contains("undecodable image payload"))
  }
}
