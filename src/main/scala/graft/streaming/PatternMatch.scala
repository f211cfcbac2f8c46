package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming event-sequence pattern matching — the batch
  * `window_pattern_match` regexes as per-user keyed state, so a live
  * stream reports behavioral-pattern membership continuously instead of
  * re-folding every user's history per scan.
  *
  * The batch query builds each user's time-ordered event-initial string
  * and runs regexes over it; state that grows with history is the wrong
  * shape for an unbounded stream. Every regular pattern instead compiles
  * to a DFA, and the per-user state is ONE INT PER PATTERN (the DFA
  * state), folded forward per event by a table lookup — O(patterns)
  * state regardless of stream length, the automata-theory answer to
  * "regex over an unbounded sequence". The four shipped patterns mirror
  * the batch query:
  *
  *   `^s`        anchor:    first event decides, then absorbs
  *   `vc`        adjacency: progress resets unless the next char chains
  *   `v[^p]*p`   exclusion: an open view survives anything but a purchase
  *   `v.*c.*p`   order:     three-step subsequence progress
  *
  * Events fold in event-time order within each micro-batch (ties broken
  * on event_id — the batch query's total order); ACROSS batches the fold
  * assumes per-user event-time order, the same contract the reference's
  * ordered binlog tail provides. That contract is now ENFORCED as
  * observable state, not silently assumed: the per-user state carries the
  * last folded (micros, event_id) frontier, and any event arriving behind
  * it increments an `out_of_order` count surfaced on every output row — a
  * late event still folds (history can't be rewritten without unbounded
  * state), but the corruption risk to adjacency (`vc`) / anchor (`^s`)
  * patterns is flagged instead of invisible. The production hardening
  * path is a watermark-based reorder buffer upstream; the counter tells
  * you when you need it. `PatternMatchSpec` proves the streamed match
  * sets equal the batch regexes under uneven micro-batch splits and that
  * in-order feeds report zero violations.
  */
object PatternMatch {

  final case class Event(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String)

  /** DFA over the event-initial alphabet: `step(state)(symbol)` with -1 =
    * dead (non-accepting absorb); `accept` states absorb by construction
    * in the shipped patterns (membership is monotone for `contains`-style
    * patterns; the anchor pattern dead-ends instead).
    */
  final case class Dfa(pattern: String, step: Array[Map[Char, Int]],
      accept: Set[Int], elseTo: Array[Int]) {
    def next(st: Int, ch: Char): Int =
      if (st < 0) -1
      else if (accept(st)) st
      else step(st).getOrElse(ch, elseTo(st))
    def matched(st: Int): Boolean = st >= 0 && accept(st)
  }

  /** The batch query's pattern set, hand-compiled (a general
    * Thompson/subset construction would land on exactly these tables).
    */
  val Dfas: Seq[Dfa] = Seq(
    // '^s': state 0 start; 's' -> accept, anything else -> dead
    Dfa("^s", Array(Map('s' -> 1)), Set(1), Array(-1)),
    // 'v.*c.*p': subsequence progress v(1) c(2) p(3=accept); never resets
    Dfa("v.*c.*p",
      Array(Map('v' -> 1), Map('c' -> 2), Map('p' -> 3)),
      Set(3), Array(0, 1, 2)),
    // 'v[^p]*p': 0 none; 1 open view (any non-p keeps it open); p from 1 accepts
    Dfa("v[^p]*p",
      Array(Map('v' -> 1), Map('p' -> 2)),
      Set(2), Array(0, 1)),
    // 'vc' adjacency: 0 none; 1 last was v ('v' stays, 'c' accepts, else drops)
    Dfa("vc",
      Array(Map('v' -> 1), Map('c' -> 2, 'v' -> 1)),
      Set(2), Array(0, 0)))

  /** Per-user keyed state: one DFA state per pattern, plus the last folded
    * (micros, event_id) frontier and the count of events that arrived
    * behind it — O(patterns + 3 longs) regardless of stream length.
    */
  final case class PatternState(states: Seq[Int], lastMicros: Long,
      lastId: Long, outOfOrder: Long)

  final case class UserMatches(user_id: Long, matched: Seq[String],
      out_of_order: Long)

  private[streaming] def initial: PatternState =
    PatternState(Dfas.map(_ => 0), Long.MinValue, Long.MinValue, 0L)

  /** Fold one event-initial char into every pattern's DFA state. */
  private[streaming] def stepAll(s: PatternState, ch: Char): PatternState =
    s.copy(states = Dfas.zip(s.states).map { case (d, st) => d.next(st, ch) })

  /** Per-user matched-pattern sets, updated every micro-batch (update
    * mode — each batch emits the keys it touched).
    */
  def matches(events: Dataset[Event]): Dataset[UserMatches] = {
    implicit val outEnc = Encoders.product[UserMatches]
    implicit val stateEnc = Encoders.product[PatternState]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[PatternState, UserMatches](GroupStateTimeout.NoTimeout()) {
        case (userId: Long, rows: Iterator[Event], state: GroupState[PatternState]) =>
          var st = state.getOption.getOrElse(initial)
          rows.toSeq
            .sortBy(e => (micros(e.ts), e.event_id))
            .foreach { e =>
              val m = micros(e.ts)
              // An event AT OR BEHIND the folded frontier violates the
              // cross-batch order contract — behind = late arrival, at =
              // exact duplicate redelivery (at-least-once replay), which
              // double-folds the DFA just as corruptingly (a replayed 'c'
              // can newly match 'vc'). Either still folds (rewinding would
              // need the full history), but the violation is counted, not
              // swallowed. (event_id, micros) pairs are unique for
              // distinct events, so `<=` flags exactly late + duplicate.
              if (m < st.lastMicros ||
                  (m == st.lastMicros && e.event_id <= st.lastId))
                st = st.copy(outOfOrder = st.outOfOrder + 1)
              else
                st = st.copy(lastMicros = m, lastId = e.event_id)
              st = stepAll(st, e.event_type.charAt(0))
            }
          state.update(st)
          UserMatches(userId,
            Dfas.zip(st.states).collect { case (d, s) if d.matched(s) => d.pattern },
            st.outOfOrder)
      }
  }

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
}
