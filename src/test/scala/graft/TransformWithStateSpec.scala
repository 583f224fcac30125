package graft

import graft.streaming.StatefulSessions._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Proves the `transformWithState` session fold carries state ACROSS
  * micro-batches: a gap that straddles a batch boundary but is under the
  * session gap must NOT open a new session (it would if state were reset
  * per batch), while an over-gap event in a later batch must.
  */
class TransformWithStateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Min = 60L * 1000000L // one minute in µs

  private def run(batches: Seq[Seq[Event]]): Map[Long, (Long, Long)] = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val out = input.toDS()
        .groupByKey(_.user_id)
        .transformWithState(new SessionCountProcessor(30 * Min),
          TimeMode.None(), OutputMode.Update(),
          org.apache.spark.sql.Encoders.product[UserSessions])
      val q = out.writeStream
        .outputMode("update")
        .format("memory")
        .queryName("twss_mem")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      } finally q.stop()
      spark.table("twss_mem")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_events"),
          org.apache.spark.sql.functions.max("n_sessions"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("session continues across a batch boundary; state is not reset") {
    val got = run(Seq(
      Seq(Event(1L, 0L), Event(1L, 10 * Min)),
      // 25 min after the last batch-1 event: same session iff state kept
      Seq(Event(1L, 35 * Min), Event(1L, 120 * Min), Event(2L, 0L))))
    assert(got(1L) == ((4L, 2L)), "under-gap boundary must not open a session")
    assert(got(2L) == ((1L, 1L)), "a user first seen in batch 2 starts at 1")
  }

  test("unordered rows within a batch are folded in time order") {
    val got = run(Seq(
      Seq(Event(7L, 90 * Min), Event(7L, 0L), Event(7L, 10 * Min))))
    // sorted: 0, 10, 90 → gap 80 min opens one extra session
    assert(got(7L) == ((3L, 2L)))
  }

  test("exact-gap boundary opens a session (>= convention, as in q29)") {
    val got = run(Seq(
      Seq(Event(3L, 0L)), Seq(Event(3L, 30 * Min))))
    assert(got(3L) == ((2L, 2L)))
  }
}
