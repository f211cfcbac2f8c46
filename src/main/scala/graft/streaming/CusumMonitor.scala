package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift detection — the incremental face of the batch
  * `ts_cusum` query (ops/TimeWindowQueries.scala): each arm folds its
  * daily close into S_t = max(0, S_{t−1} + (x_t − target)) against a
  * FIXED per-arm target (the production topology, like `DriftMonitor`'s
  * fixed reference: the target is last period's mean daily cents, a
  * bounded broadcast artifact) and emits one snapshot per day with the
  * alarm bit.
  *
  * State per arm is TWO LONGS — the deviation prefix sum and its running
  * minimum (the same prefix identity the batch query uses: S_t = P_t −
  * min(0, min_{j≤t} P_j)) — O(1) regardless of stream length, the family
  * contract. Exact integer cents end to end; the Long prefix sums carry
  * the house bound (|Σ deviations| < 2⁶³ — ~9.2·10¹⁶ dollars of
  * cumulative drift per arm; the batch face rides DECIMAL(38,0) and
  * `StreamingCusumSpec` pins equality at fixture scale under any
  * micro-batch split).
  *
  * Ordering contract (family-wide): daily closes arrive in day order per
  * arm across micro-batches; within a batch rows are sorted by day.
  */
object CusumMonitor {

  /** One daily close: an arm's summed cents for an epoch day. */
  final case class DailyClose(arm: String, day: Long, cents: Long)

  /** Deviation prefix sum and its running minimum. */
  final case class PrefixState(p: Long, minP: Long)

  final case class Snapshot(arm: String, day: Long, cusum_cents: Long,
      alarm: Boolean)

  /** Fold one ordered run of daily closes — the kernel shared with the
    * spec's oracle. Returns the snapshots and the updated state.
    */
  def fold(target: Long, st: PrefixState, ordered: Seq[DailyClose])
      : (Seq[Snapshot], PrefixState) = {
    var p = st.p
    var minP = st.minP
    val out = Seq.newBuilder[Snapshot]
    ordered.foreach { d =>
      p += d.cents - target
      if (p < minP) minP = p
      val cusum = p - math.min(0L, minP)
      out += Snapshot(d.arm, d.day, cusum, cusum > target)
    }
    (out.result(), PrefixState(p, minP))
  }

  def monitor(closes: Dataset[DailyClose], targets: Map[String, Long])
      : Dataset[Snapshot] = {
    implicit val outEnc = Encoders.product[Snapshot]
    implicit val stateEnc = Encoders.product[PrefixState]
    implicit val strEnc = Encoders.STRING

    closes
      .groupByKey(_.arm)
      .flatMapGroupsWithState[PrefixState, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (arm: String, rows: Iterator[DailyClose],
            state: GroupState[PrefixState]) =>
          val (emitted, st) = fold(
            targets.getOrElse(arm, 0L),
            state.getOption.getOrElse(PrefixState(0L, 0L)),
            rows.toSeq.sortBy(_.day))
          state.update(st)
          emitted.iterator
      }
  }
}
