package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming conversion funnel via `mapGroupsWithState`: the
 * per-user ordered state machine (view → click-after-view →
 * purchase-after-that-click) maintained as explicit state across
 * micro-batches — the second custom-state streaming operator class next
 * to [[StatefulSessionizer]] (a fold whose transitions depend on event
 * ORDER, not just gaps). The batch shape of this operator is the
 * oracle-backed `events_funnel` query (cascaded strictly-preceding
 * windows).
 *
 * Stage flags are MONOTONE (a reached stage is never unreached), so the
 * per-batch Update-mode emissions aggregate to the final answer with a
 * plain per-user OR — no sentinel flush batch is needed, unlike the
 * sessionizer whose open sessions must be force-closed.
 *
 * Exactness contract: batches must arrive time-ordered per user (the
 * file-source staging feeds time-sliced files in modification-time
 * order); WITHIN a batch the fold sorts by `(ts_us, event_id)`, the same
 * total order the batch query's window uses.
 */
object StatefulFunnel {

  final case class Event(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)

  /** Monotone per-user stage flags; `seen_s2` = clicked after a view,
    * `seen_s3` = purchased after such a click. */
  final case class Flags(user_id: Long, seen_view: Boolean,
      seen_s2: Boolean, seen_s3: Boolean)

  /** Fold one batch of a user's events (sorted here) into the stage
    * flags. Transition checks read the flags BEFORE the current row is
    * folded in — the strictly-preceding semantics of the batch windows;
    * a row never has two types, so check-then-update is exact. */
  def step(userId: Long, events: Iterator[Event],
      state: GroupState[Flags]): Flags = {
    var f = state.getOption.getOrElse(Flags(userId, false, false, false))
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      val isS2 = e.event_type == "click" && f.seen_view
      val isS3 = e.event_type == "purchase" && f.seen_s2
      f = Flags(userId,
        f.seen_view || e.event_type == "view",
        f.seen_s2 || isS2,
        f.seen_s3 || isS3)
    }
    state.update(f)
    f
  }

  /** Per-user stage flags, one Update-mode emission per touched user per
    * micro-batch (monotone — aggregate with OR). */
  def flags(events: Dataset[Event]): Dataset[Flags] = {
    implicit val outEnc = Encoders.product[Flags]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(step)
  }
}
