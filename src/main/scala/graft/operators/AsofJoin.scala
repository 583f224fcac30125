package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (SURVEY §2.3 M4 notes it as
  * "custom needed"). Backward: for each left row, the most recent right row
  * of the same key with `rightTime <= leftTime`; forward: the earliest right
  * row with `rightTime >= leftTime` (`strict` makes the comparisons strict).
  *
  * Implementation choice (option (a) of the custom-operator ladder: compose
  * built-ins): instead of a range/theta join — which explodes to
  * |left|×|right-per-key| intermediate rows — both sides are unioned, tagged,
  * and swept with a single `last(..., ignoreNulls)` window per key in time
  * order (reversed for forward). Cost: ONE shuffle on the key, O(n log n)
  * per-partition sort, O(1) state per row — the sort-merge as-of, expressed
  * declaratively so Catalyst/Tungsten run it with codegen. This is the
  * 100 TB-safe shape: no build-side blowup, skew handled by AQE on the
  * single shuffle.
  *
  * The right row travels as ONE struct so the window picks a whole row
  * atomically (per-column fills would blend columns across right rows when
  * values are null). Right rows should be unique per (key, time) — ties are
  * otherwise broken by window order; dedupe first for full determinism.
  */
object AsofJoin {

  /** @param rightValueCols right columns to attach (each emitted as
    *                       `asof_<name>`)
    *  @param tolerance      optional max distance between the matched times:
    *                        a picked right row farther than this nulls out
    *                        (Polars/pandas `tolerance` semantics — the match
    *                        is NOT replaced by an older candidate). Same
    *                        type algebra as the time columns: an interval
    *                        for timestamps, a number for numeric times.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      strict: Boolean = false,
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, keyCols, leftTimeCol, rightTimeCol, rightValueCols,
      strict, forward = false, tolerance)

  /** Earliest right row at-or-after (after, if strict) the left time. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      strict: Boolean = false,
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, keyCols, leftTimeCol, rightTimeCol, rightValueCols,
      strict, forward = true, tolerance)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      strict: Boolean,
      forward: Boolean,
      tolerance: Option[Column] = None): DataFrame = {
    val sideCol = "_asof_side" // 1 = right, 0 = left
    val timeCol = "_asof_t"
    val payloadCol = "_asof_payload"
    val rtField = "_asof_rt" // matched right time, for the tolerance check

    val taggedRight = right.select(
      (keyCols.map(col) :+
        col(rightTimeCol).as(timeCol) :+
        lit(1).as(sideCol) :+
        struct((col(rightTimeCol).as(rtField) +:
          rightValueCols.map(col)): _*).as(payloadCol)): _*)
    val taggedLeft = left
      .withColumn(timeCol, col(leftTimeCol))
      .withColumn(sideCol, lit(0))

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // Equal timestamps: right sorts before left for inclusive semantics
    // (the left row may see it), after left for strict.
    val timeOrder: Column =
      if (forward) col(timeCol).desc else col(timeCol).asc
    val sideOrder: Column =
      if (strict) col(sideCol).asc else col(sideCol).desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled0 = unioned.withColumn(payloadCol,
      last(col(payloadCol), ignoreNulls = true).over(w))

    // Tolerance: null the WHOLE payload when the picked right row is too
    // far — per Polars/pandas asof semantics the match is dropped, not
    // replaced by the next-nearest candidate.
    val filled = tolerance.fold(filled0) { tol =>
      val matchedT = col(s"$payloadCol.$rtField")
      val dist =
        if (forward) matchedT - col(timeCol) else col(timeCol) - matchedT
      filled0.withColumn(payloadCol,
        when(col(payloadCol).isNotNull && dist <= tol, col(payloadCol)))
    }

    val projected = rightValueCols.foldLeft(filled) { (d, c) =>
      d.withColumn(s"asof_$c", col(s"$payloadCol.$c"))
    }
    projected
      .filter(col(sideCol) === 0)
      .drop(sideCol, timeCol, payloadCol)
  }
}
