package graft

import graft.operators.AsofJoin
import graft.plans.AsofJoinNative

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity: the native LogicalPlan/Strategy/Exec as-of join must produce
  * exactly the composed (union + window) operator's result on every
  * direction × strictness × tolerance × partitioning combination,
  * including time ties and keys present on only one side.
  */
class AsofNativeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // deterministic fixture: interleaved keys, duplicate left times,
  // right times colliding with left times (the tie cases), gaps for
  // tolerance, and one-sided keys (7 left-only, 8 right-only)
  private val left = Seq(
    (1L, 100L, "l-a"), (1L, 200L, "l-b"), (1L, 200L, "l-c"),
    (1L, 350L, "l-d"), (2L, 50L, "l-e"), (2L, 400L, "l-f"),
    (3L, 10L, "l-g"), (7L, 123L, "l-h"))
    .toDF("k", "t", "lv")
  private val right = Seq(
    (1L, 100L, 10.0), (1L, 150L, 11.0), (1L, 300L, 12.0),
    (2L, 60L, 20.0), (2L, 390L, 21.0), (3L, 5L, 30.0), (8L, 1L, 80.0))
    .toDF("k", "rt", "price")

  private def composed(fwd: Boolean, strict: Boolean,
      tol: Option[Long]): DataFrame = {
    val f = if (fwd) AsofJoin.asofForward _ else AsofJoin.asofBackward _
    f(left, right, Seq("k"), "t", "rt", Seq("price"), strict,
      tol.map(l => lit(l)))
  }

  private def native(fwd: Boolean, strict: Boolean, tol: Option[Long],
      parts: Int): DataFrame =
    AsofJoinNative.asof(left.repartition(parts), right.repartition(parts),
      Seq("k"), "t", "rt", Seq("price"), forward = fwd, strict = strict,
      toleranceUs = tol)

  private def rows(df: DataFrame): Set[(Long, Long, String, Option[Double])] =
    df.select(col("k"), col("t"), col("lv"), col("asof_price"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSet

  test("native ≡ composed across direction × strict × tolerance × partitions") {
    for {
      fwd <- Seq(false, true)
      strict <- Seq(false, true)
      tol <- Seq(None, Some(60L))
      parts <- Seq(1, 3, 16)
    } {
      val want = rows(composed(fwd, strict, tol))
      val got = rows(native(fwd, strict, tol, parts))
      assert(got == want,
        s"fwd=$fwd strict=$strict tol=$tol parts=$parts:\n" +
          s"native=$got\nwindow=$want")
    }
  }

  test("tie semantics: inclusive match picks the equal-time right row") {
    val got = rows(native(fwd = false, strict = false, tol = None, parts = 2))
    assert(got.contains((1L, 100L, "l-a", Some(10.0)))) // rt == lt matched
    val strictGot =
      rows(native(fwd = false, strict = true, tol = None, parts = 2))
    assert(strictGot.contains((1L, 100L, "l-a", None))) // strict skips it
  }

  test("every left row survives; one-sided keys get nulls") {
    val got = rows(native(fwd = false, strict = false, tol = None, parts = 4))
    assert(got.size == 8)
    assert(got.contains((7L, 123L, "l-h", None)))
  }

  test("key predicate pushes through the node into BOTH children") {
    val df = native(fwd = false, strict = false, tol = None, parts = 2)
      .filter(col("k") === 1L && col("asof_price") > 10.0)
    val optimized = df.queryExecution.optimizedPlan
    // the key conjunct must sit BELOW the as-of node on both sides; the
    // asof_price conjunct (match-dependent) must stay above it
    val aj = optimized.collect {
      case p: AsofJoinNative.AsofJoinPlan => p
    }.head
    def hasFilterOnK(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.references.map(_.name).toSet.contains("k") => f
      }.nonEmpty
    assert(hasFilterOnK(aj.left), s"left child missing key filter:\n$optimized")
    assert(hasFilterOnK(aj.right), s"right child missing key filter:\n$optimized")
    // and the result is still correct
    val got = rows(df)
    val want = rows(composed(fwd = false, strict = false, None)
      .filter(col("k") === 1L && col("asof_price") > 10.0))
    assert(got == want)
  }

  test("left-only non-key predicate pushes left, not right") {
    val df = native(fwd = false, strict = false, tol = None, parts = 2)
      .filter(col("lv") === "l-d")
    val aj = df.queryExecution.optimizedPlan.collect {
      case p: AsofJoinNative.AsofJoinPlan => p
    }.head
    val leftFiltered = aj.left.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.nonEmpty
    val rightFiltered = aj.right.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.nonEmpty
    assert(leftFiltered && !rightFiltered)
    assert(rows(df) == Set((1L, 350L, "l-d", Some(12.0))))
  }

  test("the planned exec is the native operator, not a fallback") {
    val df = native(fwd = false, strict = false, tol = None, parts = 2)
    df.collect() // finalize the adaptive plan
    // the physical node prints with the Exec suffix stripped: "AsofJoin"
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin "), plan)
  }
}
