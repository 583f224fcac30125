package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user lifetime session counting as a Spark 4 `StatefulProcessor`
  * (`transformWithState` — the successor to `flatMapGroupsWithState` with
  * typed per-key state primitives over the RocksDB store).
  *
  * State is ONE fixed-size record per user (event count, session count,
  * last event time): at 100 TB the store grows with |users|, never with
  * events, and RocksDB keeps it off-heap and incrementally checkpointed.
  * Rows inside a micro-batch arrive unordered, so the handler sorts the
  * batch's rows per key (bounded by per-user-per-batch volume) and folds
  * them into the state record; batches themselves arrive in source order,
  * so the fold continues exactly where the previous batch left a user's
  * `lastTus`. A session opens when the gap from the previous event is
  * ≥ `gapUs` — the same ≥ convention as the batch sessionizer
  * (`EventQueries.q29Sessionize`), which is what makes stream ≡ batch
  * provable. Emission is the running state record (Update mode); the final
  * per-user answer is the max-count row, monotone by construction.
  *
  * Reference analogue: none (`/root/reference` has no streaming); this is
  * the Spark-4-native form of the incremental session ledger.
  */
object StatefulSessions {
  final case class Event(user_id: Long, tus: Long)
  final case class UserSessions(
      user_id: Long, n_events: Long, n_sessions: Long, last_tus: Long)

  final class SessionCountProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Event, UserSessions] {

    @transient private var state: ValueState[UserSessions] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserSessions](
        "sessions", Encoders.product[UserSessions], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserSessions] = {
      val batch = rows.toArray.sortBy(_.tus)
      var st =
        if (state.exists()) state.get()
        else UserSessions(key, 0L, 0L, Long.MinValue)
      batch.foreach { e =>
        val opens = st.n_events == 0L || e.tus - st.last_tus >= gapUs
        st = UserSessions(key, st.n_events + 1L,
          st.n_sessions + (if (opens) 1L else 0L), e.tus)
      }
      state.update(st)
      Iterator.single(st)
    }
  }
}
