package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time temporal (as-of) join for streams — Flink's temporal join /
  * the streaming face of [[graft.plans.AsofJoin]], which Spark's built-in
  * stream-stream joins can't express ("latest value at or before my
  * timestamp" is not an interval predicate).
  *
  * A probe stream is enriched with the LATEST update (per key, at or
  * before the probe's event time) from an update stream — the canonical
  * CDC shape: events joined to a dimension maintained by a change stream.
  * Correctness is event-time, not arrival-time: a probe is held in state
  * until the watermark passes its timestamp, so an update that arrives in
  * a LATER micro-batch (but with an earlier event time) still matches.
  *
  * State is bounded, the 100 TB/day property: per key, only probes newer
  * than the watermark plus the update history that future probes can still
  * reach — with `toleranceMs` set, updates older than `watermark -
  * tolerance` are dropped; without it, one latest-at-watermark update is
  * kept as the standing image (exactly a CDC table snapshot entry) plus
  * any newer ones. Emission happens when the watermark passes a probe
  * (event-time timeout covers batches with no new rows for the key).
  *
  * Rows at or behind the union watermark when they arrive are late data
  * and are dropped by the operator's watermark filter (the standard
  * flatMapGroupsWithState contract, pinned by the spec) — size the two
  * delay knobs for the sides' real disorder.
  *
  * Update stream contracts: exact duplicate (ts, v) redeliveries collapse
  * (at-least-once CDC replay is safe); among conflicting updates sharing
  * one (key, ts) the largest value wins deterministically; null-valued
  * update rows (possible through the untyped `.as[Update]` path) are
  * dropped — model deletes as explicit sentinel values if they must
  * enrich.
  */
object TemporalJoin {

  /** The stream being enriched (fact/event side). */
  final case class Probe(key: String, ts: Timestamp, id: Long)

  /** The dimension-maintaining change stream. */
  final case class Update(key: String, ts: Timestamp, v: Double)

  /** Probe + the update in effect at its event time (None = no update yet
    * or the latest one is out of tolerance).
    */
  final case class Enriched(
      key: String, ts_ms: Long, id: Long, v: Option[Double], update_ts_ms: Option[Long])

  /** Watermark-pending probes and the reachable update history, both
    * event-time sorted.
    */
  final case class Buf(probes: Seq[(Long, Long)], updates: Seq[(Long, Double)])

  /** Internal union envelope (public: encoder codegen must reach it). */
  final case class Tagged(
      key: String, ts: Timestamp, isUpdate: Boolean, v: Option[Double], id: Long)

  /** Enrich `probes` with the latest `updates` value per key as-of each
    * probe's event time (inclusive). `probeDelay`/`updateDelay` are the
    * two sides' watermark delays; the operator's clock is their union
    * watermark (the min). `toleranceMs` bounds the lookback like
    * [[graft.plans.Asof.join]]'s tolerance — and tightens state pruning.
    */
  def join(
      probes: Dataset[Probe],
      updates: Dataset[Update],
      probeDelay: String = "0 seconds",
      updateDelay: String = "0 seconds",
      toleranceMs: Option[Long] = None): Dataset[Enriched] = {
    implicit val taggedEnc = Encoders.product[Tagged]
    implicit val bufEnc = Encoders.product[Buf]
    implicit val outEnc = Encoders.product[Enriched]
    implicit val keyEnc = Encoders.STRING
    val tol = toleranceMs
    tol.foreach(t => require(t >= 0, s"toleranceMs must be non-negative, got $t"))
    val l = probes.toDF().withWatermark("ts", probeDelay)
      .select(col("key"), col("ts"), lit(false).as("isUpdate"),
        lit(null).cast("double").as("v"), col("id"))
    val r = updates.toDF().withWatermark("ts", updateDelay)
      .select(col("key"), col("ts"), lit(true).as("isUpdate"),
        col("v"), lit(-1L).as("id"))
    l.unionAll(r).as[Tagged]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Buf, Enriched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key: String, rows: Iterator[Tagged], state: GroupState[Buf]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(Buf(Nil, Nil))
          val incoming = rows.toSeq
          val probesAll = (prev.probes ++ incoming.collect {
            case t if !t.isUpdate => (t.ts.getTime, t.id)
          }).sorted
          // `.sorted.distinct` on (ts, v): exact redeliveries collapse
          // (at-least-once CDC replay) and same-ts conflicts resolve
          // deterministically (largest value wins) instead of by arrival
          // order, which a task retry could flip.
          var updatesAll = (prev.updates ++ incoming.collect {
            case t if t.isUpdate && t.v.isDefined => (t.ts.getTime, t.v.get)
          }).sorted.distinct.toIndexedSeq
          // Probes at or before the watermark can emit: Spark's
          // flatMapGroupsWithState late filter only admits rows with
          // ts > watermark (ties are dropped as late — verified by
          // TemporalJoinSpec), so every update that can precede or tie an
          // emitted probe has already arrived.
          val (ready, pending) = probesAll.partition(_._1 <= wm)
          // Both sequences are sorted: advance one cursor over the update
          // history instead of rescanning it per probe.
          var ui = 0
          val out = ready.map { case (pt, id) =>
            while (ui < updatesAll.size && updatesAll(ui)._1 <= pt) ui += 1
            val m = (if (ui == 0) None else Some(updatesAll(ui - 1)))
              .filter { case (ut, _) => tol.forall(pt - ut <= _) }
            Enriched(key, pt, id, m.map(_._2), m.map(_._1))
          }
          // Prune updates no future probe (ts > wm after the late filter)
          // can match: with a tolerance, anything older than
          // wm - tolerance; without, keep the single latest at-or-before
          // wm (the standing image) plus everything newer.
          updatesAll = (tol match {
            case Some(t) => updatesAll.dropWhile(_._1 < wm - t)
            case None =>
              val (past, future) = updatesAll.partition(_._1 <= wm)
              past.takeRight(1) ++ future
          }).toIndexedSeq
          if (pending.isEmpty && updatesAll.isEmpty) state.remove()
          else {
            state.update(Buf(pending, updatesAll))
            // Wake when the watermark passes the oldest held probe — or,
            // with a tolerance and no pending probes, once the whole
            // update history ages out, so the drained key's state is
            // removed instead of leaking under key churn.
            val wake = pending.headOption.map(_._1)
              .orElse(tol.flatMap(t => updatesAll.lastOption.map(_._1 + t)))
            wake.foreach(w => state.setTimeoutTimestamp(math.max(w, wm + 1)))
          }
          out.iterator
      }
  }
}
