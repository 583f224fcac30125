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

  val all: Seq[QuerySpec] = Seq(q27MultimodalMeta)
}
