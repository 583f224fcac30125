package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming first-touch funnel: the q63 state machine run incrementally
  * with `mapGroupsWithState` — the custom-state streaming primitive the
  * contract surface calls for. (Its sibling `flatMapGroupsWithState` is
  * unusable in Spark 4.1.2 — planner NPE, see
  * [[graft.streaming.SessionWindows]] — but the map form plans and runs,
  * so custom keyed state gets a native implementation here rather than a
  * foreachBatch workaround.)
  *
  * Semantics are IDENTICAL to the batch q63 (same transitions, same 6h
  * windows, strict inequalities): within a micro-batch events are sorted
  * by (tus, et) before folding, and the per-user `FunnelState` carries
  * across batches, so for an event-time-ordered file sequence the stream
  * result equals the batch result (StreamingFunnelSpec pins both the
  * transition table and stream ≡ batch on real data). Out-of-order
  * ARRIVAL ACROSS batches is not repaired — a production deployment
  * fronts this with watermarked event-time sorting or accepts
  * first-arrival semantics; documented, not hidden.
  *
  * 100 TB shape: state is one 12-byte struct per user, sharded by group
  * key across executors; each micro-batch shuffles only that batch's
  * events once. No timeline is ever materialized per user.
  */
object StreamingFunnel {

  /** 6h conversion window (µs) — the single source of truth; the batch
    * q63 references this constant.
    */
  final val ConversionWindowUs: Long = 21600000000L

  final case class FunnelEvent(user_id: Long, et: String, tus: Long)
  final case class FunnelState(stage: Int, since: Long)

  /** Pure fold of one batch of events into the state — factored for
    * direct unit testing. Events are sorted by (tus, et) to match the
    * batch `sort_array(struct(tus, et))` exactly.
    */
  def advance(state: FunnelState, events: Seq[(Long, String)]): FunnelState =
    events.sortBy(identity).foldLeft(state) { case (acc, (tus, et)) =>
      if (acc.stage == 0 && et == "view") FunnelState(1, tus)
      else if (acc.stage == 1 && et == "click" && tus > acc.since &&
        tus <= acc.since + ConversionWindowUs) FunnelState(2, tus)
      else if (acc.stage == 2 && et == "purchase" && tus > acc.since &&
        tus <= acc.since + ConversionWindowUs) FunnelState(3, tus)
      else acc
    }

  /** (user_id, funnel_stage) after each micro-batch, update mode. */
  def funnelStages(
      events: Dataset[FunnelEvent]): Dataset[(Long, Int)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[FunnelEvent], st: GroupState[FunnelState]) =>
          val next = advance(
            st.getOption.getOrElse(FunnelState(0, 0L)),
            it.map(e => (e.tus, e.et)).toSeq)
          st.update(next)
          (user, next.stage)
      }
  }
}
