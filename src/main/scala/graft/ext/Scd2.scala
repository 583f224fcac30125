package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Slowly-changing-dimension type 2: turn a change log (one row per
  * version of a key) into interval history — `valid_from`/`valid_to`
  * half-open ranges per key plus an `is_current` flag on the open row.
  * This is the history-keeping sibling of the reference's keep-last
  * snapshot upsert (SURVEY §2.3): where [[graft.operators.Upsert.keepLast]]
  * retains only the newest version, SCD2 retains every version with its
  * validity window.
  *
  * 100 TB shape: ONE shuffle on the key; per-key window state is a single
  * `lead` lookahead, so memory is O(1) per row regardless of history
  * length. Ties on the ordering columns are broken by the caller-supplied
  * tiebreaker to keep the history deterministic on any partitioning.
  */
object Scd2 {

  /** Build interval history from `changes`: per `key`, versions ordered by
    * `orderBy` then `tieBreak`; each version's `valid_to` is the next
    * version's `orderBy` value (null ⇒ still current).
    */
  def history(
      changes: DataFrame,
      key: Column,
      orderBy: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderBy, tieBreak)
    changes
      .withColumn("valid_from", orderBy)
      .withColumn("valid_to", lead(orderBy, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
