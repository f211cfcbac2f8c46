package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score anomaly detection — the incremental face of
  * the batch `ts_anomaly_zscore` query (ops/TimeWindowQueries.scala): each
  * arriving point is scored against the mean/stddev of its key's previous
  * ≤20 values and flagged when |z| > 2.5 with ≥10 of history, exactly the
  * batch window's `rowsBetween(-20, -1)` frame.
  *
  * State per key is the 20-value RING alone — a fixed-size buffer
  * regardless of stream length, the O(1)-per-key contract this family
  * maintains (`PatternMatch`: one int per pattern; `ScdHistory`: one open
  * version; `IvmLedger`: one signed ledger). A naive streaming port that
  * kept each key's full history would be O(stream); the ring IS the
  * operator.
  *
  * Ordering contract (same as ScdHistory): points arrive in `event_id`
  * order per key across micro-batches; within a batch rows are sorted by
  * `event_id`, so any split of an ordered stream yields the identical
  * flag set — `AnomalyDetectorSpec` pins equality with the batch query
  * under uneven splits.
  */
object AnomalyDetector {

  final case class Point(user_id: Long, event_id: Long, value: Double)

  /** The key's trailing window, oldest first, ≤ Depth values. */
  final case class Ring(values: Seq[Double])

  final case class Anomaly(user_id: Long, event_id: Long, z: Double, n_hist: Int)

  val Depth = 20
  val MinHist = 10
  val Threshold = 2.5

  /** Score-and-push one ordered run — the kernel shared with the spec's
    * oracle. Uses the same sample-stddev definition as the batch window.
    */
  def fold(key: Long, ring: Ring, ordered: Seq[Point]): (Seq[Anomaly], Ring) = {
    var w = ring.values
    val out = Seq.newBuilder[Anomaly]
    ordered.foreach { p =>
      if (w.length >= MinHist) {
        val n = w.length
        val m = w.sum / n
        val sd = math.sqrt(w.map(x => (x - m) * (x - m)).sum / (n - 1))
        if (sd > 0.001) {
          val z = (p.value - m) / sd
          if (math.abs(z) > Threshold) out += Anomaly(key, p.event_id, z, n)
        }
      }
      w = (w :+ p.value).takeRight(Depth)
    }
    (out.result(), Ring(w))
  }

  def detect(points: Dataset[Point]): Dataset[Anomaly] = {
    implicit val outEnc = Encoders.product[Anomaly]
    implicit val stateEnc = Encoders.product[Ring]
    implicit val longEnc = Encoders.scalaLong

    points
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Ring, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key: Long, rows: Iterator[Point], state: GroupState[Ring]) =>
          val (flagged, ring) = fold(key,
            state.getOption.getOrElse(Ring(Seq.empty)),
            rows.toSeq.sortBy(_.event_id))
          state.update(ring)
          flagged.iterator
      }
  }
}
