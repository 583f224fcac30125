package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** One input event for sessionization. */
final case class SessionEvent(user_id: Long, event_id: Long, tus: Long)

/** One session: [start, last event + gap). */
final case class UserSession(
    user_id: Long,
    session_start_us: Long,
    session_end_us: Long,
    n_events: Long)

/** Session windows over an event stream (SURVEY §2.6 streaming extension).
  *
  * The streaming form uses Spark's native `session_window` aggregation
  * (gap-merge semantics: an event extends the session iff its time is
  * strictly inside previous-event + gap; session end = last event + gap).
  * Composing the built-in is the right ladder rung here — a custom
  * `flatMapGroupsWithState` sessionizer was implemented and abandoned:
  * Spark 4.1.2's `FlatMapGroupsWithStateExec` hits an internal NPE at
  * planning time (`PythonSQLMetrics` init dereferences a null session), so
  * the operator is unusable in this release.
  *
  * Scale: session state is per (user, open-window), sharded by group key
  * across the cluster; the watermark bounds state and makes append-mode
  * emission final.
  */
object SessionWindows {

  final val DefaultGapUs: Long = 30L * 60 * 1000 * 1000 // 30 min

  /** Pure single-user gap-rule fold (session_window semantics: an event
    * joins the open session iff it lands strictly before the session end,
    * i.e. `t - lastEvent < gap`); factored for direct unit testing and used
    * by the batch twin.
    */
  def advance(
      events: Seq[SessionEvent],
      open: Option[UserSession],
      gapUs: Long): (Seq[UserSession], Option[UserSession]) = {
    val sorted = events.sortBy(e => (e.tus, e.event_id))
    var closed = Vector.empty[UserSession]
    var cur = open
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.tus < s.session_end_us =>
          cur = Some(s.copy(
            session_end_us = math.max(s.session_end_us, e.tus + gapUs),
            n_events = s.n_events + 1))
        case Some(s) =>
          closed :+= s
          cur = Some(UserSession(e.user_id, e.tus, e.tus + gapUs, 1))
        case None =>
          cur = Some(UserSession(e.user_id, e.tus, e.tus + gapUs, 1))
      }
    }
    (closed, cur)
  }

  /** Batch twin of the streaming aggregation (same semantics, plain
    * shuffle+fold — usable for backfill and as the streaming test oracle).
    */
  def batchSessionize(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      gapUs: Long = DefaultGapUs): Dataset[UserSession] = {
    implicit val enc = Encoders.product[UserSession]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id).flatMapGroups { (_, it) =>
      val (closed, open) = advance(it.toSeq, None, gapUs)
      (closed ++ open).iterator
    }
  }

  /** Streaming session aggregation over a stream with an event-time `ts_ts`
    * timestamp column: returns (user_id, session_start_us, session_end_us,
    * n_events) rows, final-on-emission (append + watermark).
    */
  def sessionWindowStream(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts_ts", watermarkDelay)
      .groupBy(session_window(col("ts_ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
}
