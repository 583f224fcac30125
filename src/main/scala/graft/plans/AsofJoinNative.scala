package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: logical node + planner strategy + physical sort-merge
  * exec — tier (c) of the custom-operator ladder (whole-operator semantics
  * as a `LogicalPlan` + `SparkStrategy` + `SparkPlan`), for the operator
  * Spark lacks natively (SURVEY §2.3 M4; reference analogue
  * `/root/reference/src/etl-utils.ts` join helpers have no as-of either —
  * this is the timeseries-enrichment primitive).
  *
  * Why a physical operator when the composed form
  * ([[graft.operators.AsofJoin]], union + `last(ignoreNulls)` window) is
  * already one-shuffle: WindowExec BUFFERS each key's full row group
  * (spilling past `windowExecBufferInMemoryThreshold`), so a hot key —
  * one instrument with 10⁹ ticks at 100 TB — pays a giant sort-group
  * buffer. This exec streams BOTH sorted sides with O(1) state per
  * partition (current right row + last eligible match), the textbook
  * merge as-of. Same distribution contract as SortMergeJoinExec:
  * `ClusteredDistribution` per child (EnsureRequirements co-partitions
  * and sorts), so AQE still handles the single shuffle pair.
  *
  * Semantics (parity-locked to the composed operator by
  * AsofNativeSpec): backward = most recent right with rt ≤ lt (strict:
  * <); forward = earliest right with rt ≥ lt (strict: >); every left row
  * survives (left-outer shape) with the matched right values or nulls;
  * optional tolerance nulls matches farther than `toleranceUs` (the match
  * is dropped, not replaced — Polars/pandas semantics). Time columns are
  * LongType micros (the API wrapper converts timestamps); rows with null
  * time never match. Right rows should be unique per (key, time) — ties
  * broken by scan order otherwise, as in the composed form.
  */
object AsofJoinNative {

  final case class AsofJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      rightValues: Seq[Attribute],
      forward: Boolean,
      strict: Boolean,
      toleranceUs: Option[Long]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ rightValues.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  object AsofJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinPlan(l, r, lk, rk, lt, rt, rv, fwd, strict, tol) =>
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv,
          fwd, strict, tol) :: Nil
      case _ => Nil
    }
  }

  /** Optimizer rule: a custom logical node is OPAQUE to Catalyst's
    * pushdown rules (`PushPredicateThroughNonJoin` only knows built-in
    * nodes), so a `Filter` above the as-of join would otherwise pin every
    * predicate above the shuffle and the scans would read the world. This
    * rule restores the two pushes that are semantics-preserving for as-of:
    *
    *  - a deterministic conjunct referencing only LEFT output pushes into
    *    the left child (each output row is one left row; dropping a left
    *    row never changes any other row's match);
    *  - a conjunct referencing only left JOIN KEYS additionally pushes a
    *    key-rewritten COPY into the right child (right rows of a key that
    *    no surviving left row carries can never be matched) — the copy,
    *    not a move, so the left filter still applies.
    *
    * Predicates touching the attached `asof_` value columns stay above,
    * where they belong (they depend on the match). With both children
    * being parquet scans, the pushed conjuncts surface as
    * `PushedFilters` — partition/row-group pruning on BOTH sides of a
    * 100 TB as-of (AsofNativeSpec asserts the scan-level pushdown).
    */
  object AsofPushdownRule
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
      with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    import org.apache.spark.sql.catalyst.expressions.AttributeMap
    import org.apache.spark.sql.catalyst.plans.logical.Filter

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformDown {
        case f @ Filter(cond, aj: AsofJoinPlan) =>
          val conjuncts = splitConjunctivePredicates(cond)
          val (leftOnly, keep) = conjuncts.partition(c =>
            c.deterministic && c.references.subsetOf(aj.left.outputSet))
          if (leftOnly.isEmpty) f
          else {
            val keyPairs = aj.leftKeys.zip(aj.rightKeys).collect {
              case (lk: Attribute, rk: Attribute) => lk -> rk
            }
            val lkToRk = AttributeMap(keyPairs)
            val keyOnly = leftOnly.filter(
              _.references.forall(a => lkToRk.contains(a)))
            val newLeft = Filter(leftOnly.reduce(
              org.apache.spark.sql.catalyst.expressions.And), aj.left)
            val newRight = keyOnly match {
              case Nil => aj.right
              case ps => Filter(
                ps.map(_.transform {
                  case a: Attribute if lkToRk.contains(a) => lkToRk(a)
                }).reduce(
                  org.apache.spark.sql.catalyst.expressions.And),
                aj.right)
            }
            val pushed = aj.copy(left = newLeft, right = newRight)
            keep match {
              case Nil => pushed
              case ks => Filter(ks.reduce(
                org.apache.spark.sql.catalyst.expressions.And), pushed)
            }
          }
      }
  }

  /** Idempotently install the strategy on a session (the code-side path;
    * conf-side sessions get it via `graft.GraftExtensions`).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsofPushdownRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofPushdownRule
  }

  /** DataFrame-level entry point. Key columns must exist on both sides
    * under the same names; time columns must be LongType (µs — convert
    * timestamps with `unix_micros` upstream); right value column names
    * must not collide with left columns (they are emitted as
    * `asof_<name>`, matching the composed operator's contract). As with
    * any hand-built binary node, the two inputs must not share attribute
    * ids for the attached value columns — derive the right side through
    * an aggregation/aliasing step (the usual as-of shape) or alias first.
    */
  def asof(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      forward: Boolean = false,
      strict: Boolean = false,
      toleranceUs: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    def timeAttr(p: LogicalPlan, n: String): Attribute = {
      val a = attr(p, n)
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of time column $n must be LongType µs, got ${a.dataType}")
      a
    }
    val lKeys = keyCols.map(attr(lPlan, _))
    val rKeys = keyCols.map(attr(rPlan, _))
    // the exec's key projection/ordering is built from the LEFT key types;
    // a left/right dtype mismatch would silently mis-compare, not error
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"as-of key ${l.name} type mismatch: left ${l.dataType}, " +
          s"right ${r.dataType} — cast one side before joining")
    }
    val node = AsofJoinPlan(lPlan, rPlan,
      lKeys, rKeys,
      timeAttr(lPlan, leftTimeCol), timeAttr(rPlan, rightTimeCol),
      rightValueCols.map(attr(rPlan, _)),
      forward, strict, toleranceUs)
    rightValueCols.foldLeft(
      org.apache.spark.sql.graftplan.PlanBuilder.ofRows(spark, node)) {
      (d, c) => d.withColumnRenamed(c, s"asof_$c")
    }
  }

  final case class AsofJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      rightValues: Seq[Attribute],
      forward: Boolean,
      strict: Boolean,
      toleranceUs: Option[Long]) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ rightValues.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    /** Keys ascending, time ascending for backward / descending for
      * forward: in scan order, eligible right rows always precede the left
      * rows they can match, so the merge needs only the LAST consumed
      * eligible right row per key.
      */
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
      val dir = if (forward) Descending else Ascending
      Seq(
        leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, dir),
        rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, dir))
    }

    override def outputPartitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeys = leftKeys
      val rKeys = rightKeys
      val lTime = leftTime
      val rTime = rightTime
      val rVals = rightValues
      val fwd = forward
      val isStrict = strict
      val tol = toleranceUs
      val keyTypes = lKeys.map(_.dataType)
      val outAttrs = output

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeys, lOut)
        val rKeyProj = UnsafeProjection.create(rKeys, rOut)
        val lTimeEval = BindReferences.bindReference(lTime, lOut)
        val rTimeEval = BindReferences.bindReference(rTime, rOut)
        val rValProj = UnsafeProjection.create(rVals, rOut)
        // bind against the NULLABLE-widened value attrs: unmatched rows
        // carry nulls, and a non-nullable BoundReference would read them
        // as zero values instead of null
        val outProj = UnsafeProjection.create(outAttrs,
          lOut ++ rVals.map(_.withNullability(true)))
        val keyOrdering = org.apache.spark.sql.catalyst.expressions
          .InterpretedOrdering.forSchema(keyTypes)
        val nullRight = new GenericInternalRow(rVals.length)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var rCurrent: InternalRow = _ // next unconsumed right row
          private var rCurrentKey: InternalRow = _
          private var matchKey: InternalRow = _ // key of the held match
          private var matchVals: InternalRow = _ // projected right values
          private var matchTime: Long = _
          private def advanceRightRaw(): Unit =
            if (rIter.hasNext) {
              rCurrent = rIter.next()
              rCurrentKey = rKeyProj(rCurrent).copy()
            } else { rCurrent = null; rCurrentKey = null }
          advanceRightRaw()

          // eligible in scan order: backward rt <= lt (strict <);
          // forward rt >= lt i.e. (lt - rt) <= 0 under negated compare
          private def eligible(rt: Long, lt: Long): Boolean = {
            val d = if (fwd) lt - rt else rt - lt
            if (isStrict) d < 0 else d <= 0
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            if (lTimeEval.eval(lRow) == null) {
              joined(lRow, nullRight)
              return outProj(joined)
            }
            val lt = lTimeEval.eval(lRow).asInstanceOf[Long]
            // consume rights that are behind-or-eligible in scan order
            var advance = true
            while (advance && rCurrent != null) {
              val c = keyOrdering.compare(rCurrentKey, lKey)
              if (c < 0) advanceRightRaw() // dead key, discard
              else if (c == 0) {
                val rtRaw = rTimeEval.eval(rCurrent)
                if (rtRaw == null) advanceRightRaw() // null time never matches
                else {
                  val rt = rtRaw.asInstanceOf[Long]
                  if (eligible(rt, lt)) {
                    matchKey = rCurrentKey
                    matchVals = rValProj(rCurrent).copy()
                    matchTime = rt
                    advanceRightRaw()
                  } else advance = false
                }
              } else advance = false
            }
            val matched = matchKey != null &&
              keyOrdering.compare(matchKey, lKey) == 0 &&
              tol.forall { t =>
                val d = if (fwd) matchTime - lt else lt - matchTime
                d <= t
              }
            joined(lRow, if (matched) matchVals else nullRight)
            outProj(joined)
          }
        }
      }
    }
  }
}
