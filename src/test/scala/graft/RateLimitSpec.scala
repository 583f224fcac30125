package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.streaming.RateLimit.QuotaProcessor]]: per-(user, window) MAP
  * state must stay exact across micro-batch boundaries — including windows
  * whose events straddle the staged file cuts. Oracle twin: q185.
  */
class RateLimitSpec extends AnyFunSuite with SparkSpec {

  test("stream quota equals batch GROUP BY on real data (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val stream = graft.queries.EventQueries.q185StreamQuota
      .fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val batch = graft.queries.CoreQueries.events(spark, dir)
      .select(col("user_id"),
        expr("((ts div 1000) div 86400000000) * 86400000000").as("win_us"))
      .groupBy("user_id", "win_us")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> {
        val n = r.getLong(2)
        (n, math.min(n, 3L), n - math.min(n, 3L))
      }).toMap
    assert(stream == batch)
    assert(stream.nonEmpty)
    // the fixture must actually exercise the quota (some window over 3)
    assert(stream.values.exists(_._3 > 0L), "no window exceeded the quota")
    // and the 3-file staging must straddle at least one (user, window):
    // cross-batch exactness is the property under test
    assert(stream.size > 1)
  }
}
