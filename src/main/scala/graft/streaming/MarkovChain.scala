package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Markov transition extraction — the incremental face of the
  * batch `events_markov` query (ops/TimeWindowQueries.scala): each arriving
  * event emits one (prev event type → this event type) transition for its
  * user, exactly the batch window's `lag(event_type, 1)` pairing.
  *
  * State per key is the LAST EVENT alone — (ts, event_id, type), O(1)
  * regardless of stream length (the family contract: `AnomalyDetector`
  * keeps a fixed ring, `ScdHistory` one open version, `IvmLedger` one
  * signed ledger). The transition-count matrix itself lives downstream as
  * an ordinary streaming aggregation over the emitted pairs — separating
  * "pairing" (needs order, O(1) state here) from "counting" (orderless,
  * Spark's own update-mode aggregate) is what makes the topology scale.
  *
  * Ordering contract (same as AnomalyDetector/ScdHistory): events arrive
  * in (ts, event_id) order per key across micro-batches; within a batch
  * rows are sorted by (ts, event_id), so any split of an ordered stream
  * yields the identical transition multiset — `StreamingMarkovSpec` pins
  * equality with the batch query under uneven splits.
  */
object MarkovChain {

  final case class Ev(user_id: Long, event_id: Long, ts: Long, event_type: String)

  /** The key's last-seen event (µs timestamp, id for tie-breaks, type). */
  final case class Last(ts: Long, eventId: Long, tpe: String)

  final case class Transition(user_id: Long, src: String, dst: String, at_event: Long)

  /** Fold one ordered run into transitions — the kernel shared with the
    * spec's oracle.
    */
  def fold(key: Long, last: Option[Last], ordered: Seq[Ev]): (Seq[Transition], Option[Last]) = {
    var prev = last
    val out = Seq.newBuilder[Transition]
    ordered.foreach { e =>
      prev.foreach(p => out += Transition(key, p.tpe, e.event_type, e.event_id))
      prev = Some(Last(e.ts, e.event_id, e.event_type))
    }
    (out.result(), prev)
  }

  def transitions(events: Dataset[Ev]): Dataset[Transition] = {
    implicit val outEnc = Encoders.product[Transition]
    implicit val stateEnc = Encoders.product[Last]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Last, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key: Long, rows: Iterator[Ev], state: GroupState[Last]) =>
          val (emitted, last) = fold(key, state.getOption,
            rows.toSeq.sortBy(e => (e.ts, e.event_id)))
          last.foreach(state.update)
          emitted.iterator
      }
  }
}
