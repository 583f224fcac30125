package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CDC apply: merge a change log (insert/update/delete rows with a
  * sequence column) into a current snapshot — the general MERGE the
  * reference's keep-last upsert (SURVEY §2.3) is a special case of
  * (upsert = I/U only, seq = positional order, no deletes).
  *
  * Semantics: per key, the HIGHEST-seq change wins (ties broken by
  * preferring the delete, then by op string for full determinism); a
  * winning 'D' removes the key, a winning 'I'/'U' replaces the payload,
  * keys without changes keep their current row.
  *
  * 100 TB shape: one window over the change log (keyed shuffle bounded by
  * per-key change count) + one full-outer join between snapshot and
  * last-changes — both AQE-splittable equi-operations; the snapshot never
  * materializes per-change intermediate versions. For continuous
  * ingestion, run inside `foreachBatch` against the snapshot operator
  * (graft.streaming.StreamingSnapshot shows the checkpointed wiring).
  */
object Cdc {

  /** Apply `changes` to `current`. Both frames must carry `keyCol`;
    * `changes` additionally carries `opCol` ('I' | 'U' | 'D'), `seqCol`,
    * and the same payload columns as `current`. Returns the next snapshot
    * (current schema) plus a `src` column: kept | updated | inserted.
    */
  def apply(
      current: DataFrame,
      changes: DataFrame,
      keyCol: String,
      opCol: String,
      seqCol: String): DataFrame = {
    val payload = current.columns.filterNot(_ == keyCol).toSeq
    // Full deterministic precedence: highest seq, then delete, then op,
    // then the payload itself — identical (key, seq, op) changes with
    // different payloads resolve the same way on any partitioning.
    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol).desc +: (col(opCol) === "D").desc +:
        col(opCol) +: payload.map(col): _*)
    val last = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol) +: col(opCol).as("__op") +:
        payload.map(c => col(c).as(s"__c_$c")): _*)
    val joined = current
      .withColumn("__cur", lit(true))
      .join(last, Seq(keyCol), "full_outer")
    val merged = payload.foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        when(col("__op").isNull, col(c)).otherwise(col(s"__c_$c")))
    }
    merged
      .filter(col("__op").isNull || col("__op") =!= "D")
      .withColumn("src",
        when(col("__op").isNull, "kept")
          .when(col("__cur").isNull, "inserted")
          .otherwise("updated"))
      .select(col(keyCol) +: payload.map(col) :+ col("src"): _*)
  }
}
