package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `flatMapGroupsWithState`: event-time
  * sessionization with explicit state + timeout management — the general
  * pattern for stateful operators Spark's built-ins can't express
  * (session_window covers plain gap sessions; this operator also carries
  * arbitrary per-session aggregates and emits exactly at close).
  *
  * State is bounded: one `SessionState` per active key, closed either by a
  * gap-exceeding event or by event-time timeout once the watermark passes
  * `last + gap` — so memory is O(active keys) regardless of stream length,
  * the property that matters at 100 TB/day.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)

  final case class SessionState(start: Long, last: Long, n: Int, sum: Double)

  final case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, sum_value: Double)

  /** Close sessions per user with the given gap (ms). Input must carry a
    * watermark on `ts` for the event-time timeout to fire.
    */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          def close(s: SessionState): ClosedSession =
            ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.last + gapMs),
              s.n, s.sum)

          if (state.hasTimedOut) {
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last < gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= close(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the watermark proves no event can extend the session
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
