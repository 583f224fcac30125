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

/** Decoded view of an asset. The decode itself is a STUB (no image/audio
  * codecs in this environment): dimensions and features are derived
  * deterministically from the payload bytes, but the pipeline shape —
  * binary column in, typed struct + feature vector out, batched
  * per-partition processing — is the real thing a codec would drop into.
  */
final case class DecodedAsset(
    asset_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    features: Array[Float])

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

  /** Batched decode: one decoder instance per partition (where a native
    * codec context would be initialized once), streamed over the iterator.
    */
  def decode(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition init hook for a real codec lives here
      it.map(decodeOne)
    }
  }

  /** Feature table ready for the ANN operators ([[Similarity]]): decoded
    * features as the embedding column.
    */
  def featureTable(spark: SparkSession, decoded: Dataset[DecodedAsset]): DataFrame =
    decoded.toDF().select(
      col("asset_id").as("vec_id"),
      col("features").as("embedding"))
}
