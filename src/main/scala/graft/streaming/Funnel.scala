package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming conversion funnel — the batch `window_funnel` recurrence
  * (view → click → purchase, chain span ≤ the window) as per-user keyed
  * state, so a live event stream reports funnel depth continuously
  * instead of on re-scan.
  *
  * The state IS the batch query's two running maxima, O(1) per user
  * regardless of stream length: `bestV` (latest view so far) and `bestCv`
  * (best view reachable through any earlier click), plus the depth
  * reached. Each event folds in exactly the batch recurrence:
  *
  *   view     → level ≥ 1, bestV = max(bestV, t)
  *   click    → level ≥ 2 iff bestV ≥ t − W; bestCv = max(bestCv, bestV)
  *   purchase → level ≥ 3 iff bestCv ≥ t − W
  *
  * Events are folded in event-time order within each micro-batch;
  * ACROSS batches the recurrence assumes per-user event-time order (the
  * same contract the reference's ordered binlog tail provides — a CDC
  * stream is per-key ordered by construction). `FunnelSpec` proves
  * batch/stream equivalence: the final streamed depths equal the batch
  * window-function query's on the same events, under any batch split.
  */
object Funnel {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)

  final case class FunnelState(bestV: Long, bestCv: Long, level: Int)

  final case class Depth(user_id: Long, level: Int)

  private val Unset = Long.MinValue

  /** Fold one event into the recurrence (micros; `w` = window span). */
  private[streaming] def step(s: FunnelState, t: Long, tpe: String,
      w: Long): FunnelState = tpe match {
    case "view" =>
      s.copy(bestV = math.max(s.bestV, t), level = math.max(s.level, 1))
    case "click" =>
      val reached = s.bestV != Unset && s.bestV >= t - w
      s.copy(
        bestCv = math.max(s.bestCv, s.bestV),
        level = if (reached) math.max(s.level, 2) else s.level)
    case "purchase" =>
      val reached = s.bestCv != Unset && s.bestCv >= t - w
      s.copy(level = if (reached) math.max(s.level, 3) else s.level)
    case _ => s
  }

  /** Per-user funnel depth, updated every micro-batch (update mode —
    * each batch emits the keys it touched with their current depth).
    */
  def depths(events: Dataset[Event], windowMicros: Long): Dataset[Depth] = {
    implicit val depthEnc = Encoders.product[Depth]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, Depth](GroupStateTimeout.NoTimeout()) {
        case (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(Unset, Unset, 0))
          rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
            st = step(st, micros(e.ts), e.event_type, windowMicros)
          }
          state.update(st)
          Depth(userId, st.level)
      }
  }

  /** Full-precision epoch micros — `getTime` alone truncates to ms, and
    * the batch query compares in `unix_micros`, so equivalence needs the
    * sub-millisecond digits.
    */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
}
