package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EXACT percentiles over a bounded value domain — the
  * incremental face of the batch `agg_percentile` query
  * (ops/AdvancedQueries.scala): each group maintains its value histogram
  * in state (the `DriftMonitor` sorted-parallel-arrays representation and
  * its two-pointer merge, shared) and emits, once per touching
  * micro-batch, percentiles computed with Spark's own `percentile`
  * interpolation contract — pos = 1 + (n−1)·p, linear between the two
  * bracketing order statistics — so the final streamed snapshot is
  * EQUAL (not approximate) to the batch answer.
  *
  * This is the honest counterpoint to sketch-based streaming quantiles
  * (t-digest/KLL): when the value domain is bounded (integer quantities,
  * cents, bucketed scores — the common case in metric pipelines), the
  * exact histogram IS the right state: O(domain) per key no matter how
  * many points fold in, no error budget to explain. The rank walk per
  * emission is one O(domain) pass over the sorted arrays.
  */
object QuantileMonitor {

  final case class Obs(grp: String, v: Long)

  final case class Snapshot(grp: String, n: Long, p50: Double, p90: Double)

  /** Spark-`percentile`-identical interpolation over the sorted histogram:
    * value at fractional rank 1 + (n−1)·p. Shared with the spec's oracle.
    */
  def percentile(keys: Array[Long], counts: Array[Long], n: Long,
      p: Double): Double = {
    require(n > 0)
    val pos = 1.0 + (n - 1) * p
    val lo = math.floor(pos).toLong
    val hi = math.ceil(pos).toLong
    var i = 0
    var cum = 0L
    var vLo = 0L
    var vHi = 0L
    var needLo = true
    var needHi = true
    while (i < keys.length && (needLo || needHi)) {
      cum += counts(i)
      if (needLo && cum >= lo) { vLo = keys(i); needLo = false }
      if (needHi && cum >= hi) { vHi = keys(i); needHi = false }
      i += 1
    }
    vLo + (pos - lo) * (vHi - vLo)
  }

  def monitor(obs: Dataset[Obs]): Dataset[Snapshot] = {
    implicit val outEnc = Encoders.product[Snapshot]
    implicit val stateEnc = Encoders.product[DriftMonitor.Hist]
    implicit val strEnc = Encoders.STRING

    obs
      .groupByKey(_.grp)
      .flatMapGroupsWithState[DriftMonitor.Hist, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (grp: String, rows: Iterator[Obs],
            state: GroupState[DriftMonitor.Hist]) =>
          val delta = new scala.collection.mutable.LongMap[Long]()
          var added = 0L
          rows.foreach { o =>
            delta(o.v) = delta.getOrElse(o.v, 0L) + 1L
            added += 1L
          }
          val merged = DriftMonitor.merge(
            state.getOption.getOrElse(
              DriftMonitor.Hist(Array.empty, Array.empty, 0L)),
            delta, added)
          state.update(merged)
          Iterator(Snapshot(grp, merged.n,
            percentile(merged.keys, merged.counts, merged.n, 0.5),
            percentile(merged.keys, merged.counts, merged.n, 0.9)))
      }
  }
}
