package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q157 sketch contract: HLL union is a lossless register-wise max, so
  * rolling daily sketches up to a week must give the SAME estimate as
  * sketching the week's raw values directly — that identity is what lets a
  * pipeline persist per-partition sketches and answer any coarser distinct
  * query without rescanning the fact table. Plus the accuracy claim the
  * oracle adjudicates: estimate within 5% of exact at lgConfigK = 12.
  */
class HllRollupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** 7 days × overlapping user sets: user u is active on day d iff
    * (u + d) % 3 != 0 — deterministic, every user spans multiple days so
    * the union actually exercises register merging (not disjoint adds).
    */
  private lazy val fixture = (for {
    d <- 0 until 7
    u <- 0 until 5000
    if (u + d) % 3 != 0
  } yield (d.toLong, u.toLong)).toDF("day", "user_id")

  test("union of daily sketches ≡ sketching the week directly") {
    val viaDaily = fixture.groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].head()
    val direct = fixture
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est"))
      .as[Long].head()
    assert(viaDaily == direct,
      s"merged estimate $viaDaily != direct estimate $direct")
  }

  test("estimate within 5% of exact at lgConfigK 12") {
    val exact = fixture.select("user_id").distinct().count()
    val est = fixture
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .as[Long].head()
    assert(math.abs(est - exact) <= exact * 0.05,
      s"estimate $est vs exact $exact")
  }
}
