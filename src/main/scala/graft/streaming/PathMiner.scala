package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming journey-path extraction — the incremental face of the batch
  * `events_path` query (ops/TimeWindowQueries.scala): each arriving event
  * emits one (s1 → s2 → s3) trigram for its user once two predecessors
  * exist, exactly the batch window's `lag(2)`/`lag(1)` pairing.
  *
  * State per key is the LAST TWO EVENTS alone — O(1) regardless of stream
  * length (the family contract: `MarkovChain` keeps one, `AnomalyDetector`
  * a fixed ring, `IvmLedger` one signed ledger). The path-count table and
  * its ppm shares live downstream as an ordinary streaming aggregation
  * over the emitted trigrams — "pairing" (needs order, O(1) state) stays
  * separate from "counting" (orderless), same split as MarkovChain.
  *
  * Ordering contract (family-wide): events arrive in (ts, event_id) order
  * per key across micro-batches; within a batch rows are sorted by
  * (ts, event_id), so any split of an ordered stream yields the identical
  * trigram multiset — `StreamingPathSpec` pins equality with the batch
  * query's counts under uneven splits.
  */
object PathMiner {

  final case class Ev(user_id: Long, event_id: Long, ts: Long, event_type: String)

  /** The key's last two events; slot 2 is the most recent, `k` how many
    * slots are valid (0, 1 or 2).
    */
  final case class Last2(ts1: Long, id1: Long, t1: String,
      ts2: Long, id2: Long, t2: String, k: Int)

  final case class Step(user_id: Long, s1: String, s2: String, s3: String,
      at_event: Long)

  private val empty = Last2(0L, 0L, "", 0L, 0L, "", 0)

  /** Fold one ordered run into trigram steps — the kernel shared with the
    * spec's oracle.
    */
  def fold(key: Long, last: Last2, ordered: Seq[Ev]): (Seq[Step], Last2) = {
    var st = last
    val out = Seq.newBuilder[Step]
    ordered.foreach { e =>
      if (st.k == 2) out += Step(key, st.t1, st.t2, e.event_type, e.event_id)
      st = Last2(st.ts2, st.id2, st.t2, e.ts, e.event_id, e.event_type,
        math.min(st.k + 1, 2))
    }
    (out.result(), st)
  }

  def steps(events: Dataset[Ev]): Dataset[Step] = {
    implicit val outEnc = Encoders.product[Step]
    implicit val stateEnc = Encoders.product[Last2]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Last2, Step](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key: Long, rows: Iterator[Ev], state: GroupState[Last2]) =>
          val (emitted, st) = fold(key, state.getOption.getOrElse(empty),
            rows.toSeq.sortBy(e => (e.ts, e.event_id)))
          if (st.k > 0) state.update(st)
          emitted.iterator
      }
  }
}
