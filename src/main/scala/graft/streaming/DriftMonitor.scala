package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitoring — the incremental face of the
  * batch `agg_ks_drift` query (ops/MiningQueries.scala): each arm of a
  * metric stream maintains its value histogram in state and emits, once
  * per touching micro-batch, the exact-integer two-sample KS statistic of
  * everything seen so far against a FIXED reference snapshot (the
  * production topology: the reference is last week's corpus histogram, a
  * bounded broadcast artifact, and the monitor pages when drift crosses a
  * threshold).
  *
  * State per key is the cents→count histogram — BOUNDED BY THE VALUE
  * DOMAIN (≤ ~49 k distinct cents by construction), not by stream length:
  * the family contract (`AnomalyDetector`: fixed ring; `MarkovChain`: one
  * last event; `IvmLedger`: one signed ledger) holds because a histogram
  * over a bounded domain is O(domain) no matter how many points fold in.
  * The KS arithmetic is the batch query's exactly — max |cum₁·n₂ −
  * cum₂·n₁| in exact integers, ppm by floor division — so
  * `StreamingDriftSpec` can pin the final click-arm snapshot EQUAL to the
  * batch `agg_ks_drift` answer when the reference is the purchase
  * histogram.
  *
  * Emission per (arm, micro-batch) is append-safe: a snapshot is an
  * immutable fact about the arm's state at that batch.
  */
object DriftMonitor {

  final case class Obs(arm: String, cents: Long)

  final case class Hist(counts: Map[Long, Long])

  final case class Snapshot(arm: String, n: Long, ks_ppm: Long)

  /** The batch query's exact-integer KS in kernel form — max over the
    * merged value domain of |cum_sample·n_ref − cum_ref·n_sample|, ppm by
    * floor division. Shared with the spec's oracle. The cross products and
    * the ppm scaling ride BigInt (r12, ADVICE — the batch query's
    * DECIMAL(38,0) discipline): in Long, cum·n wraps once n1·n2 > 2⁶³ and
    * best·10⁶ at n1·n2 > 9.2·10¹² (~3 M points per side), silently. The
    * domain loop is ≤ ~49 k iterations, so the boxed arithmetic is noise.
    */
  def ksPpm(sample: Map[Long, Long], reference: Map[Long, Long]): Long = {
    val n1 = BigInt(sample.values.sum)
    val n2 = BigInt(reference.values.sum)
    if (n1 == 0 || n2 == 0) return 0L
    var c1 = BigInt(0); var c2 = BigInt(0); var best = BigInt(0)
    (sample.keySet ++ reference.keySet).toSeq.sorted.foreach { v =>
      c1 += BigInt(sample.getOrElse(v, 0L))
      c2 += BigInt(reference.getOrElse(v, 0L))
      val d = (c1 * n2 - c2 * n1).abs
      if (d > best) best = d
    }
    (best * 1000000 / (n1 * n2)).toLong
  }

  def monitor(obs: Dataset[Obs], reference: Map[Long, Long]): Dataset[Snapshot] = {
    implicit val outEnc = Encoders.product[Snapshot]
    implicit val stateEnc = Encoders.product[Hist]
    implicit val strEnc = Encoders.STRING

    obs
      .groupByKey(_.arm)
      .flatMapGroupsWithState[Hist, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (arm: String, rows: Iterator[Obs], state: GroupState[Hist]) =>
          val merged = rows.foldLeft(
            state.getOption.getOrElse(Hist(Map.empty)).counts) { (m, o) =>
            m.updated(o.cents, m.getOrElse(o.cents, 0L) + 1L)
          }
          state.update(Hist(merged))
          Iterator(Snapshot(arm, merged.values.sum, ksPpm(merged, reference)))
      }
  }
}
