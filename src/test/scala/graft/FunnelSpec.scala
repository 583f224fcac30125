package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q63 funnel state machine's semantics on planted users the sf
  * fixture doesn't exercise (it has no stage-0 users and no window
  * expiries at 6h): first-touch anchoring, window expiry, and
  * order-of-stages enforcement.
  */
class FunnelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // 1h in µs
  private val W = 21600000000L // the 6h conversion window

  private def stages(events: Seq[(Long, String, Long)]): Map[Long, Int] = {
    val e = events.toDF("user_id", "et", "tus")
    e.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("tus"), col("et")))).as("ev"))
      .withColumn("funnel_stage", expr(
        s"""aggregate(ev,
           |  struct(CAST(0 AS INT) AS stage, CAST(0 AS BIGINT) AS since),
           |  (acc, x) -> CASE
           |    WHEN acc.stage = 0 AND x.et = 'view'
           |      THEN struct(CAST(1 AS INT) AS stage, x.tus AS since)
           |    WHEN acc.stage = 1 AND x.et = 'click'
           |         AND x.tus > acc.since AND x.tus <= acc.since + ${W}L
           |      THEN struct(CAST(2 AS INT) AS stage, x.tus AS since)
           |    WHEN acc.stage = 2 AND x.et = 'purchase'
           |         AND x.tus > acc.since AND x.tus <= acc.since + ${W}L
           |      THEN struct(CAST(3 AS INT) AS stage, x.tus AS since)
           |    ELSE acc END,
           |  acc -> acc.stage)""".stripMargin))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
  }

  test("full conversion inside the window") {
    assert(stages(Seq((1L, "view", H), (1L, "click", 2 * H),
      (1L, "purchase", 3 * H))) == Map(1L -> 3))
  }

  test("click outside the 6h window does not convert") {
    assert(stages(Seq((1L, "view", H), (1L, "click", H + W + 1)))
      == Map(1L -> 1))
  }

  test("stage order is enforced: purchase before click does not count") {
    assert(stages(Seq((1L, "view", H), (1L, "purchase", 2 * H),
      (1L, "click", 3 * H))) == Map(1L -> 2))
  }

  test("clicks before the first view are ignored") {
    assert(stages(Seq((1L, "click", H), (1L, "view", 2 * H)))
      == Map(1L -> 1))
  }

  test("first-touch anchoring: a later view cannot reopen the window") {
    // first view at H, click at H+W+2h — outside the window of the FIRST
    // view even though a second view at H+W sits within 2h of the click
    assert(stages(Seq((1L, "view", H), (1L, "view", H + W),
      (1L, "click", H + W + 2 * H))) == Map(1L -> 1))
  }

  test("no view at all is stage 0") {
    assert(stages(Seq((1L, "click", H), (1L, "purchase", 2 * H)))
      == Map(1L -> 0))
  }
}
