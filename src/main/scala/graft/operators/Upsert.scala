package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed keep-last upsert (M1+M2) — the core of the reference's snapshot
  * merge: `pl.concat([snapshot, newData])` then
  * `unique({subset:[pk], keep:"last"})` (ref: src/etl-utils.ts:289,319).
  *
  * Polars' "last" is positional (later row in the concat wins). Spark has no
  * stable row position across a shuffle, so precedence is made *explicit*: a
  * `_src_priority` literal per side and a `row_number` window over the PK
  * ordered by that priority. This is deterministic on any cluster layout and
  * AQE re-plan, which positional semantics are not.
  *
  * Scale notes (100 TB posture):
  *  - one shuffle on the PK — the minimum any keyed upsert needs;
  *  - `row_number` + filter is whole-stage-codegen'd; no driver
  *    materialization anywhere;
  *  - for repeated merges into a large snapshot, partition both sides by PK
  *    bucket on write so the shuffle becomes a local sort (see
  *    `Snapshot.scala`).
  */
object Upsert {

  private final val PriorityCol = "_src_priority"
  private final val RowNumCol = "_upsert_rn"

  /** Merge `fresh` over `old`: rows from `fresh` win on PK collision; rows
    * missing from one side's schema are null-filled (schema drift tolerance —
    * Polars `concat` requires equal schemas, `unionByName` with
    * `allowMissingColumns` is the defensive superset).
    *
    * Within one side, duplicate PKs are broken by `tieBreak` (deterministic);
    * the reference's behavior there is engine-arbitrary.
    *
    * NULL PKs group together (matches Polars `unique` null grouping).
    */
  def keepLast(
      old: DataFrame,
      fresh: DataFrame,
      pk: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(pk.nonEmpty, "keepLast requires at least one primary-key column")
    val o = old.withColumn(PriorityCol, lit(0))
    val n = fresh.withColumn(PriorityCol, lit(1))
    val merged = o.unionByName(n, allowMissingColumns = true)
    val ordering = desc(PriorityCol) +: tieBreak.map(desc)
    val w = Window.partitionBy(pk.map(col): _*).orderBy(ordering: _*)
    merged
      .withColumn(RowNumCol, row_number().over(w))
      .filter(col(RowNumCol) === 1)
      .drop(RowNumCol, PriorityCol)
  }
}
