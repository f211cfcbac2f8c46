package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming APPROXIMATE percentile — the incremental face of the batch
  * `agg_approx_percentile` sketch query (ops/VectorQueries.scala; the r18
  * verdict's ask #7, the last sketch family with no streaming row) — and
  * the module's canonical ORDER-SENSITIVE sketch: the Greenwald–Khanna
  * summary Spark's own `approx_percentile` aggregate builds
  * (`QuantileSummaries`, the identical catalyst class, at the identical
  * relative error 1/accuracy) is NOT insertion-idempotent. Folding a
  * re-delivered value twice genuinely moves the summary — unlike
  * [[HllMonitor]]'s register max, there is no algebra to hide behind —
  * so an honest at-least-once design needs an upstream EXACT-DEDUP leg.
  *
  * The topology is therefore a composition, not a single fold:
  *
  *   1. [[dedup]] — the [[StreamingDedup]] pattern on the observation's
  *      IDENTITY (`grp`, `event_id`) via `dropDuplicatesWithinWatermark`:
  *      state O(active window) per key, pruned by the watermark; a
  *      re-delivered observation never reaches the sketch.
  *   2. the keyed sketch fold — per group, the `QuantileSummaries` state
  *      absorbs the batch's (deduplicated) values SORTED by `event_id`
  *      (the summary is insertion-order-sensitive; a deterministic
  *      within-batch order makes the streamed state a pure function of
  *      the delivered set and its micro-batch layout), compresses, and
  *      snapshots `(n, p50_approx)` per trigger.
  *
  * What CAN be pinned honestly (and `StreamingSketchQuantileSpec` does):
  * re-delivering any prefix under a FIXED batch layout leaves every
  * snapshot bit-identical (the dedup leg absorbs it); and for EVERY
  * batch layout, the final estimate obeys the GK rank contract — the
  * returned value's rank in the exact sorted multiset lies within
  * ε·n of the 0.5 target, the same bound the batch `ApproxSpec` holds
  * `approx_percentile` itself to. What CANNOT be pinned — exact
  * estimate equality across different micro-batch splits — is exactly
  * the order-sensitivity this monitor exists to demonstrate; the spec
  * documents it by construction rather than pretending otherwise.
  *
  * Scale: sketch state per group is O(1/ε · log(εn)) tuples (~KBs),
  * dedup state O(active window); at 100 TB the dedup leg keys on the
  * upstream log's (partition, offset) identity and the snapshots land in
  * a metrics store — mergeable downstream via `QuantileSummaries.merge`.
  */
object SketchQuantileMonitor {

  /** One observation: `event_id` is the delivery identity the dedup leg
    * collapses on (a log offset in production); `v` the measured value.
    */
  final case class Obs(grp: String, event_id: Long, ts: Timestamp, v: Double)

  /** Serialized GK summary: the parallel (value, g, delta) arrays of the
    * COMPRESSED `QuantileSummaries.sampled` plus its total count.
    */
  final case class SketchState(
      values: Array[Double], gs: Array[Long], deltas: Array[Long], count: Long)

  final case class Snapshot(grp: String, n: Long, p50_approx: Double)

  /** Matches the batch face's `approx_percentile(…, 0.5, 1000)`:
    * ApproximatePercentile builds `QuantileSummaries` at relativeError
    * = 1/accuracy.
    */
  val RelativeError: Double = 1.0 / 1000

  private def restore(st: SketchState): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, RelativeError,
      Array.tabulate(st.values.length)(i =>
        QuantileSummaries.Stats(st.values(i), st.gs(i), st.deltas(i))),
      st.count, true)

  private def snapshotOf(s: QuantileSummaries): SketchState =
    SketchState(s.sampled.map(_.value), s.sampled.map(_.g),
      s.sampled.map(_.delta), s.count)

  /** The at-least-once guard: exact dedup on the observation identity
    * within the watermark — the [[StreamingDedup]] pattern. Everything
    * downstream sees each identity at most once.
    */
  def dedup(obs: Dataset[Obs], delay: String): Dataset[Obs] = {
    implicit val enc = Encoders.product[Obs]
    obs.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("grp", "event_id")
      .as[Obs]
  }

  /** The keyed sketch fold over the deduplicated stream. */
  def monitor(obs: Dataset[Obs], delay: String): Dataset[Snapshot] = {
    implicit val outEnc = Encoders.product[Snapshot]
    implicit val stateEnc = Encoders.product[SketchState]
    implicit val strEnc = Encoders.STRING
    dedup(obs, delay)
      .groupByKey(_.grp)
      .flatMapGroupsWithState[SketchState, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (grp: String, rows: Iterator[Obs], state: GroupState[SketchState]) =>
          var s = state.getOption.map(restore).getOrElse(
            new QuantileSummaries(
              QuantileSummaries.defaultCompressThreshold, RelativeError))
          // deterministic within-batch insertion order (the summary is
          // order-sensitive; sorting pins the streamed state to the
          // delivered set + batch layout, nothing else)
          rows.toSeq.sortBy(_.event_id).foreach(o => s = s.insert(o.v))
          s = s.compress()
          state.update(snapshotOf(s))
          Iterator.single(Snapshot(grp, s.count,
            s.query(0.5).getOrElse(Double.NaN)))
      }
  }
}
