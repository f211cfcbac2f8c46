package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Mann-Kendall trend monitoring — the incremental face of the
  * batch `agg_mann_kendall` query (ops/MiningQueries.scala): each arm
  * folds its daily close into the exact pairwise sign statistic
  * S = Σ_{i<j} sign(x_j − x_i) WITHOUT storing the series. The identity:
  * when observations arrive in day order, the new value x pairs exactly
  * with every prior value, so ΔS = #{prior < x} − #{prior > x} — both
  * counts read from the arm's VALUE HISTOGRAM (the `DriftMonitor`
  * sorted-parallel-arrays state, bounded by the value domain, never by
  * stream length). The tie-corrected variance is a pure function of the
  * same histogram (tie groups ARE its counts), so every snapshot carries
  * the batch query's exact (n_days, s_stat, var18, z) — equality pinned
  * by `StreamingTrendSpec` under any micro-batch split.
  *
  * Per micro-batch cost: O(|batch| · domain) for the ΔS walks (daily
  * closes arrive one per day per arm — batches are small by nature) plus
  * one O(domain) histogram merge; state is the histogram + two longs.
  */
object TrendMonitor {

  /** One daily close: an arm's summed cents for an epoch day. */
  final case class DailyClose(arm: String, day: Long, cents: Long)

  /** Value histogram + the running pairwise sign sum. */
  final case class TrendState(hist: DriftMonitor.Hist, s: Long)

  final case class Snapshot(arm: String, n_days: Long, s_stat: Long,
      var18: Long, z: Double)

  /** Tie-corrected Mann-Kendall variance ×18, straight off the histogram:
    * d(d−1)(2d+5) − Σ t(t−1)(2t+5).
    */
  def var18(hist: DriftMonitor.Hist): Long = {
    val d = hist.n
    var tsum = 0L
    var i = 0
    while (i < hist.counts.length) {
      val t = hist.counts(i)
      tsum += t * (t - 1) * (2 * t + 5)
      i += 1
    }
    d * (d - 1) * (2 * d + 5) - tsum
  }

  /** z with the standard ±1 continuity correction (the batch formula). */
  def zOf(s: Long, v18: Long): Double =
    if (s == 0 || v18 <= 0) 0.0
    else (s - math.signum(s.toDouble)) / math.sqrt(v18 / 18.0)

  /** Fold one ordered run of daily closes — the kernel shared with the
    * spec's oracle. Values already in the state histogram count as
    * "prior"; arrivals see earlier arrivals of the same batch through the
    * accumulating delta.
    */
  def fold(st: TrendState, ordered: Seq[DailyClose])
      : (Seq[Snapshot], TrendState) = {
    val delta = new scala.collection.mutable.LongMap[Long]()
    var s = st.s
    var n = st.hist.n
    val out = Seq.newBuilder[Snapshot]
    val keys = st.hist.keys
    val counts = st.hist.counts
    ordered.foreach { d =>
      var less = 0L
      var greater = 0L
      var i = 0
      while (i < keys.length) {
        if (keys(i) < d.cents) less += counts(i)
        else if (keys(i) > d.cents) greater += counts(i)
        i += 1
      }
      delta.foreach { case (k, c) =>
        if (k < d.cents) less += c else if (k > d.cents) greater += c
      }
      s += less - greater
      n += 1
      delta(d.cents) = delta.getOrElse(d.cents, 0L) + 1L
      // snapshot AFTER folding this day — needs the up-to-date histogram
      // for the variance; build it lazily only at emission points
      out += Snapshot(d.arm, n, s, 0L, 0.0) // var/z filled below
    }
    val merged = DriftMonitor.merge(st.hist, delta, ordered.size.toLong)
    val newState = TrendState(merged, s)
    // Only the LAST snapshot of the batch is emitted with the live
    // variance (intermediate per-day variances would need per-day
    // histogram rebuilds; the monitor's contract is one snapshot per
    // touching micro-batch, like DriftMonitor).
    val v = var18(merged)
    val finalSnap = out.result().lastOption.map(snap =>
      snap.copy(var18 = v, z = zOf(snap.s_stat, v))).toSeq
    (finalSnap, newState)
  }

  def monitor(closes: Dataset[DailyClose]): Dataset[Snapshot] = {
    implicit val outEnc = Encoders.product[Snapshot]
    implicit val stateEnc = Encoders.product[TrendState]
    implicit val strEnc = Encoders.STRING

    closes
      .groupByKey(_.arm)
      .flatMapGroupsWithState[TrendState, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (arm: String, rows: Iterator[DailyClose],
            state: GroupState[TrendState]) =>
          val (emitted, st) = fold(
            state.getOption.getOrElse(
              TrendState(DriftMonitor.Hist(Array.empty, Array.empty, 0L), 0L)),
            rows.toSeq.sortBy(_.day))
          state.update(st)
          emitted.iterator
      }
  }
}
