package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming INTER-ARRIVAL PROFILE — the incremental face of the batch
  * `events_interarrival` query (ops/TimeWindowQueries.scala): the
  * distribution of per-user gaps between consecutive same-type events,
  * kept exact under streaming by emitting SIGNED GAP DELTAS.
  *
  * Per (user, event_type), state is the sorted event timeline ((t µs,
  * event_id) pairs — the id carries the batch query's deterministic
  * tie-break for equal timestamps). An arriving event splices into the
  * timeline and touches exactly the local gap algebra:
  *
  *   - its two new flanking gaps emit (+1);
  *   - the gap it SPLITS — between its new predecessor and successor —
  *     retracts (−1), the same late-data pattern as
  *     [[GrowthAccounting]]'s churn retraction.
  *
  * Summing deltas per (event_type, gap) reconstructs the exact gap
  * multiset under any micro-batch split and any arrival order, so the
  * batch query's per-(type, digit-magnitude) histogram (n / min / max) is
  * an ordinary downstream aggregation. `StreamingInterarrivalSpec` pins
  * the converged histogram EQUAL to the batch query's.
  *
  * Scale: state per (user, type) is that key's own event count (the
  * per-user history bound every sessionization operator already
  * carries); emissions are ≤ 3 per event; the downstream sum shards by
  * (type, gap) like any keyed aggregate.
  */
object InterarrivalMonitor {

  /** One observation: an event of `event_type` for `user_id` at `t` µs
    * (`event_id` = the batch query's tie-break for equal timestamps).
    */
  final case class Obs(user_id: Long, event_type: String, t: Long, event_id: Long)

  /** Per-(user, type) state: the sorted timeline, both columns aligned. */
  final case class Timeline(ts: Array[Long], ids: Array[Long])

  /** A signed gap fact: summing `delta` per (event_type, gap_us)
    * reconstructs the exact gap multiset.
    */
  final case class GapDelta(event_type: String, gap_us: Long, delta: Int)

  /** Splice arriving (t, id) pairs into the timeline, emitting the local
    * gap deltas — the kernel shared with the spec's oracle.
    */
  def fold(tl: Timeline, typ: String, arriving: Seq[(Long, Long)])
      : (Seq[GapDelta], Timeline) = {
    var ts = tl.ts
    var ids = tl.ids
    val out = Seq.newBuilder[GapDelta]
    arriving.sorted.foreach { case (t, id) =>
      // insertion point in (t, id) order
      var lo = 0
      var hi = ts.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ts(mid) < t || (ts(mid) == t && ids(mid) < id)) lo = mid + 1
        else hi = mid
      }
      val ins = lo
      // at-least-once re-delivery of an already-spliced (t, id) is a
      // NO-OP (r16 review) — splicing a duplicate would emit a phantom
      // 0-gap and a wrong split/retract pair the batch recompute never
      // shows, and grow state without bound
      val duplicate = ins < ts.length && ts(ins) == t && ids(ins) == id
      if (!duplicate) {
        val hasPrev = ins > 0
        val hasNext = ins < ts.length
        if (hasPrev && hasNext) out += GapDelta(typ, ts(ins) - ts(ins - 1), -1)
        if (hasPrev) out += GapDelta(typ, t - ts(ins - 1), 1)
        if (hasNext) out += GapDelta(typ, ts(ins) - t, 1)
        val nts = new Array[Long](ts.length + 1)
        val nids = new Array[Long](ids.length + 1)
        System.arraycopy(ts, 0, nts, 0, ins)
        System.arraycopy(ids, 0, nids, 0, ins)
        nts(ins) = t
        nids(ins) = id
        System.arraycopy(ts, ins, nts, ins + 1, ts.length - ins)
        System.arraycopy(ids, ins, nids, ins + 1, ids.length - ins)
        ts = nts
        ids = nids
      }
    }
    (out.result(), Timeline(ts, ids))
  }

  /** The append-mode signed gap-delta stream, keyed by (user, type). */
  def deltas(obs: Dataset[Obs]): Dataset[GapDelta] = {
    implicit val outEnc = Encoders.product[GapDelta]
    implicit val stateEnc = Encoders.product[Timeline]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    obs.groupByKey(o => (o.user_id, o.event_type))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: (Long, String), it: Iterator[Obs], st: GroupState[Timeline]) => {
          val cur = st.getOption.getOrElse(
            Timeline(Array.empty[Long], Array.empty[Long]))
          val (out, next) = fold(cur, key._2, it.map(o => (o.t, o.event_id)).toSeq)
          st.update(next)
          out.iterator
        })
  }
}
