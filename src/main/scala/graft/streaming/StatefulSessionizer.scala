package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming sessionization via `flatMapGroupsWithState`: per-user
 * gap-based sessions maintained as explicit state across micro-batches —
 * the custom-state streaming capability (SURVEY.md §2.2 streaming row).
 * The batch shape of this operator is the oracle-backed
 * `events_sessionize` query.
 */
object StatefulSessionizer {

  final case class Event(user_id: Long, ts_us: Long)
  final case class OpenSession(start_us: Long, last_us: Long, n: Int)
  final case class ClosedSession(user_id: Long, start_us: Long,
      n_events: Int, duration_us: Long)

  /** Fold one batch of a user's events into the open-session state; emit
    * every session closed by a gap larger than `gapUs`. */
  def step(gapUs: Long)(userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.last_us <= gapUs =>
          open = Some(s.copy(last_us = e.ts_us, n = s.n + 1))
        case Some(s) =>
          closed += ClosedSession(userId, s.start_us, s.n, s.last_us - s.start_us)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Closed sessions per user with a 30-minute inactivity gap. */
  def sessions(events: Dataset[Event],
      gapUs: Long = 30L * 60 * 1000000): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(step(gapUs))
  }
}
