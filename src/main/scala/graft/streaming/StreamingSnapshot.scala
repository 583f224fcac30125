package graft.streaming

import graft.operators.{Snapshot, SnapshotOptions}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental snapshot maintenance as a stream (SURVEY §2.6 stretch):
  * the batch `snapshotRecords` upsert applied per micro-batch via
  * `foreachBatch` — the Structured Streaming form of the reference's
  * batch-incremental stateful upsert.
  *
  * Semantics: after the stream drains, the snapshot equals folding
  * `snapshotRecords` over the micro-batches in order — which, because
  * keep-last is associative over batch order for distinct PKs, equals one
  * batch upsert of all the data. Exactly-once per micro-batch comes from the
  * checkpointed batch id; the snapshot write itself is the temp+rename from
  * the batch operator, so a crashed batch never leaves a torn snapshot.
  */
object StreamingSnapshot {

  /** Start a stream that folds `source` into
    * `{snapshotDir}/{stream}.snapshot.parquet`.
    */
  def start(
      spark: SparkSession,
      source: DataFrame,
      stream: String,
      snapshotDir: String,
      opts: SnapshotOptions,
      checkpointDir: String): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Snapshot.snapshotRecords(
          spark, Some(batch), stream, snapshotDir, opts)
        ()
      }
      .start()
}
