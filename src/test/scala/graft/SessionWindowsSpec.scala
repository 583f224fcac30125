package graft

import graft.streaming.{SessionEvent, SessionWindows, UserSession}
import org.scalatest.funsuite.AnyFunSuite

class SessionWindowsSpec extends AnyFunSuite with SparkSpec {

  private val M = 60L * 1000 * 1000 // one minute in µs
  private val Gap = SessionWindows.DefaultGapUs

  test("advance merges inside the gap and closes on gap expiry") {
    val events = Seq(
      SessionEvent(1, 1, 0), SessionEvent(1, 2, 10 * M),
      SessionEvent(1, 3, 60 * M), // 50 min after prev → new session
      SessionEvent(1, 4, 65 * M))
    val (closed, open) = SessionWindows.advance(events, None, Gap)
    assert(closed == Seq(UserSession(1, 0, 10 * M + Gap, 2)))
    assert(open.contains(UserSession(1, 60 * M, 65 * M + Gap, 2)))
    // boundary: an event exactly at session end starts a NEW session
    // (session_window end-exclusive semantics)
    val (closed2, open2) = SessionWindows.advance(
      Seq(SessionEvent(1, 5, 65 * M + Gap)), open, Gap)
    assert(closed2 == Seq(UserSession(1, 60 * M, 65 * M + Gap, 2)))
    assert(open2.contains(UserSession(1, 65 * M + Gap, 65 * M + 2 * Gap, 1)))
  }

  test("batch twin equals the per-user fold on real events") {
    import spark.implicits._
    val events = graft.queries.CoreQueries
      .events(spark, "/root/testdata/sf0.001")
      .selectExpr("user_id", "event_id", "ts div 1000 AS tus")
      .as[SessionEvent]
    val got = SessionWindows.batchSessionize(spark, events)
      .collect().groupBy(_.user_id)
    val raw = events.collect().groupBy(_.user_id)
    raw.foreach { case (u, evs) =>
      val (closed, open) = SessionWindows.advance(evs.toSeq, None, Gap)
      assert(got(u).toSet == (closed ++ open).toSet)
    }
  }
}
