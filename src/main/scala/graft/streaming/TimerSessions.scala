package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Event-time-TIMER-driven session finalization as a Spark 4
  * `StatefulProcessor` — the third leg of the transformWithState surface
  * beside [[StatefulSessions]] (ValueState) and [[RateLimit]] (MapState):
  * per-user events buffer in LIST state, every batch (re-)arms ONE timer
  * at `last event + gap`, and the session report is emitted from
  * `handleExpiredTimer` once the WATERMARK — not any input row — passes
  * that horizon. This is the push-based emission contract: nothing is
  * emitted until event time proves the session closed, exactly the
  * semantics `session_window` (q38) implements natively; here it is built
  * from the raw primitives so custom close rules (per-key gaps, session
  * caps, early heartbeats) have somewhere to live.
  *
  * Rows inside a micro-batch arrive unordered → the expired-timer handler
  * sorts the buffered events by (time, id) before the gap walk, making
  * emission deterministic for any partitioning. Honesty at scale: LIST
  * state grows with events per user per open horizon (bounded by the
  * watermark delay + gap in steady state, NOT by total history —
  * falling behind the watermark is what bounds it); sessions that only
  * need counts should fold into fixed-size state ([[StatefulSessions]]).
  */
object TimerSessions {
  final case class TimerEvent(
      user_id: Long, event_id: Long, ts_ts: java.sql.Timestamp)
  final case class Buffered(tus: Long, event_id: Long)
  final case class Session(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long)

  final class SessionEmitProcessor(gapUs: Long)
      extends StatefulProcessor[Long, TimerEvent, Session] {

    @transient private var buf: ListState[Buffered] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[Buffered](
        "buf", Encoders.product[Buffered], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimerEvent],
        timers: TimerValues): Iterator[Session] = {
      var maxTus = Long.MinValue
      rows.foreach { e =>
        val tus = e.ts_ts.getTime * 1000 +
          (e.ts_ts.getNanos / 1000) % 1000
        buf.appendValue(Buffered(tus, e.event_id))
        if (tus > maxTus) maxTus = tus
      }
      if (maxTus != Long.MinValue) {
        // one armed timer per key: the latest close horizon wins
        getHandle.listTimers().foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
        // ceil to ms so the timer never fires a microsecond early
        getHandle.registerTimer((maxTus + gapUs + 999L) / 1000L)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Session] = {
      val events = buf.get().toArray.sortBy(b => (b.tus, b.event_id))
      buf.clear()
      if (events.isEmpty) Iterator.empty
      else {
        val out = Vector.newBuilder[Session]
        var start = events.head.tus
        var last = events.head.tus
        var n = 1L
        events.tail.foreach { e =>
          if (e.tus - last >= gapUs) {
            out += Session(key, start, last + gapUs, n)
            start = e.tus; n = 0L
          }
          last = e.tus; n += 1L
        }
        out += Session(key, start, last + gapUs, n)
        out.result().iterator
      }
    }
  }
}
