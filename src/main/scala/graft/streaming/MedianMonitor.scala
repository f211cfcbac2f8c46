package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming moving median — the incremental face of the batch
  * `window_moving_median` query (ops/AdvancedQueries.scala): each arriving
  * event is scored with the exact median of its user's last ≤ 5 values
  * (integer cents), exactly the batch `rowsBetween(-4, 0)` frame — the
  * despiking pre-pass a metrics pipeline runs before drift checks, served
  * event-by-event instead of corpus-at-once.
  *
  * State per key is the 4-VALUE LOOKBACK RING alone (the frame minus the
  * current row) — O(1) regardless of stream length, the `MarkovChain`
  * family contract (pairing needs order and O(frame) state; nothing else
  * is retained). The median of ≤ 5 longs is the middle element (odd n) or
  * the mean of the two middles (even n) — every emission an exact .0/.5
  * double, bit-identical to the batch frame median.
  *
  * Ordering contract (same as MarkovChain/AnomalyDetector/ScdHistory):
  * events arrive in (ts, event_id) order per key across micro-batches;
  * within a batch rows are sorted by (ts, event_id), so any split of an
  * ordered stream yields the identical emission sequence —
  * `StreamingMedianSpec` pins per-event equality with the batch query
  * under uneven splits. The operator is order-DEFINED (a moving frame is
  * a statement about sequence), so reordered/duplicate delivery is out of
  * contract by nature, not by shortcut — the order-free faces of this
  * family are QuantileMonitor (exact histogram percentiles) and
  * RunningDistinctMonitor (min-day ledger).
  */
object MedianMonitor {

  final case class Ev(user_id: Long, event_id: Long, ts: Long, vc: Long)

  /** The key's last ≤ 4 values, oldest first. */
  final case class Ring(vals: Seq[Long])

  final case class Scored(user_id: Long, event_id: Long, mm5: Double,
      n_frame: Int)

  /** Exact median of the ≤ 5-value frame — the kernel shared with the
    * spec's oracle: middle element (odd) or mean of the two middles
    * (even), matching the batch sort_array/element_at expression.
    */
  def frameMedian(frame: Seq[Long]): Double = {
    val s = frame.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2).toDouble
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Fold one ordered run — emissions plus the advanced ring. */
  def fold(key: Long, ring: Seq[Long], ordered: Seq[Ev])
      : (Seq[Scored], Seq[Long]) = {
    var buf = ring
    val out = Seq.newBuilder[Scored]
    ordered.foreach { e =>
      val frame = buf :+ e.vc
      out += Scored(key, e.event_id, frameMedian(frame), frame.length)
      buf = frame.takeRight(4)
    }
    (out.result(), buf)
  }

  def monitor(events: Dataset[Ev]): Dataset[Scored] = {
    implicit val outEnc = Encoders.product[Scored]
    implicit val stateEnc = Encoders.product[Ring]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Ring, Scored](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key: Long, rows: Iterator[Ev], state: GroupState[Ring]) =>
          val (emitted, ring) = fold(key,
            state.getOption.map(_.vals).getOrElse(Seq.empty),
            rows.toSeq.sortBy(e => (e.ts, e.event_id)))
          state.update(Ring(ring))
          emitted.iterator
      }
  }
}
