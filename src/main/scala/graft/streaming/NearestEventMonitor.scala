package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAREST-EVENT enrichment — the incremental face of the batch
  * `join_nearest_event` query (ops/RelationalQueries.scala): every
  * purchase carries its nearest click in time, either direction, ties to
  * the earlier one — kept correct under ARBITRARY arrival order by
  * re-verdicting exactly the purchases a late click can affect.
  *
  * Per user, state is two sorted timelines (clicks with values,
  * purchases), both in the batch query's (t, event_id) lexicographic
  * order so equal-timestamp semantics match the as-of operator exactly.
  * Arrivals fold locally:
  *
  *   - a PURCHASE verdicts itself against the current click timeline
  *     (backward candidate = last click strictly before it in (t, id)
  *     order; forward = first strictly after; tie on distance → prev);
  *   - a CLICK can only steal purchases lying strictly between its OWN
  *     neighboring clicks — a purchase outside that span is strictly
  *     closer to the boundary click than to the newcomer — so the fold
  *     re-verdicts just that slice and re-emits the WHOLE slice (update
  *     semantics, not change notifications: the state keeps no prior
  *     verdicts to diff against, so a slice purchase whose verdict is
  *     unchanged is re-emitted too — r16 ADVICE. A consumer keeps the
  *     last verdict per purchase, exactly [[SpanMonitor]]'s contract;
  *     counting emissions does NOT count changes).
  *
  * `StreamingNearestSpec` pins the converged verdict table EQUAL to the
  * batch query under any micro-batch split and any arrival order
  * (clicks-after-purchases drives every verdict through the steal path).
  *
  * Scale: state per user is that user's own event history (the
  * sessionization bound); a click's re-verdict slice is bounded by the
  * purchases between two consecutive clicks; emissions are per affected
  * slice, never per-state.
  */
object NearestEventMonitor {

  /** One observation: kind ∈ click | purchase (clicks carry `value`). */
  final case class Obs(user_id: Long, kind: String, t: Long, event_id: Long,
    value: Double)

  /** Per-user state: both timelines sorted by (t, event_id). */
  final case class Timelines(
    ct: Array[Long], cid: Array[Long], cv: Array[Double],
    pt: Array[Long], pid: Array[Long])

  /** A (re-)verdict for one purchase: `direction` ∈ prev | next | none;
    * `nearest` is NaN when none (Encoders dislike Option[Double] nulls in
    * flat case classes less than NaN here, and the spec compares through
    * the direction column).
    */
  final case class Verdict(user_id: Long, event_id: Long, nearest: Double,
    direction: String)

  private def lowerBound(ts: Array[Long], ids: Array[Long], t: Long, id: Long): Int = {
    var lo = 0
    var hi = ts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ts(mid) < t || (ts(mid) == t && ids(mid) < id)) lo = mid + 1
      else hi = mid
    }
    lo
  }

  /** The batch CASE, verbatim: backward = last click with (t,id) <
    * (tp,pid), forward = first with (t,id) > (tp,pid), tie → prev.
    */
  private def verdictOf(st: Timelines, tp: Long, pid: Long, user: Long): Verdict = {
    val ins = lowerBound(st.ct, st.cid, tp, pid)
    val hasB = ins > 0
    val hasF = ins < st.ct.length
    if (!hasB && !hasF) Verdict(user, pid, Double.NaN, "none")
    else if (!hasF) Verdict(user, pid, st.cv(ins - 1), "prev")
    else if (!hasB) Verdict(user, pid, st.cv(ins), "next")
    else {
      val db = tp - st.ct(ins - 1)
      val df = st.ct(ins) - tp
      if (db <= df) Verdict(user, pid, st.cv(ins - 1), "prev")
      else Verdict(user, pid, st.cv(ins), "next")
    }
  }

  /** Fold arriving observations for one user, emitting changed verdicts —
    * the kernel shared with the spec's oracle.
    */
  def fold(st0: Timelines, user: Long, arriving: Seq[Obs])
      : (Seq[Verdict], Timelines) = {
    var st = st0
    // last emitted verdict per purchase id this fold may supersede
    val out = scala.collection.mutable.LinkedHashMap[Long, Verdict]()
    def insert(ts: Array[Long], ids: Array[Long], t: Long, id: Long)
        : (Array[Long], Array[Long], Int) = {
      val ins = lowerBound(ts, ids, t, id)
      val nts = new Array[Long](ts.length + 1)
      val nids = new Array[Long](ids.length + 1)
      System.arraycopy(ts, 0, nts, 0, ins)
      System.arraycopy(ids, 0, nids, 0, ins)
      nts(ins) = t
      nids(ins) = id
      System.arraycopy(ts, ins, nts, ins + 1, ts.length - ins)
      System.arraycopy(ids, ins, nids, ins + 1, ids.length - ins)
      (nts, nids, ins)
    }
    def spliced(ts: Array[Long], ids: Array[Long], t: Long, id: Long): Boolean = {
      val i = lowerBound(ts, ids, t, id)
      i < ts.length && ts(i) == t && ids(i) == id
    }
    arriving.sortBy(o => (o.t, o.event_id)).foreach { o =>
      if (o.kind == "purchase") {
        // at-least-once re-delivery is a NO-OP (r16 review): re-splicing
        // grows state without bound
        if (!spliced(st.pt, st.pid, o.t, o.event_id)) {
          val (nts, nids, _) = insert(st.pt, st.pid, o.t, o.event_id)
          st = st.copy(pt = nts, pid = nids)
          out += o.event_id -> verdictOf(st, o.t, o.event_id, user)
        }
      } else if (!spliced(st.ct, st.cid, o.t, o.event_id)) { // fresh click
        val ins = lowerBound(st.ct, st.cid, o.t, o.event_id)
        val ncv = new Array[Double](st.cv.length + 1)
        System.arraycopy(st.cv, 0, ncv, 0, ins)
        ncv(ins) = o.value
        System.arraycopy(st.cv, ins, ncv, ins + 1, st.cv.length - ins)
        val (nct, ncid, _) = insert(st.ct, st.cid, o.t, o.event_id)
        // affected purchase slice: strictly between the new click's
        // neighboring clicks (±∞ where absent)
        val loK: Option[(Long, Long)] =
          if (ins > 0) Some((st.ct(ins - 1), st.cid(ins - 1))) else None
        val hiK: Option[(Long, Long)] =
          if (ins < st.ct.length) Some((st.ct(ins), st.cid(ins))) else None
        st = Timelines(nct, ncid, ncv, st.pt, st.pid)
        val pLo = loK.map { case (t, id) => lowerBound(st.pt, st.pid, t, id) }
          .getOrElse(0)
        val pHi = hiK.map { case (t, id) => lowerBound(st.pt, st.pid, t, id) }
          .getOrElse(st.pt.length)
        var i = pLo
        while (i < pHi) {
          out += st.pid(i) -> verdictOf(st, st.pt(i), st.pid(i), user)
          i += 1
        }
      }
    }
    (out.values.toSeq, st)
  }

  /** The append-mode changed-verdict stream, keyed by user (update
    * semantics downstream: last verdict per purchase wins).
    */
  def verdicts(obs: Dataset[Obs]): Dataset[Verdict] = {
    implicit val outEnc = Encoders.product[Verdict]
    implicit val stateEnc = Encoders.product[Timelines]
    implicit val keyEnc = Encoders.scalaLong
    obs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, it: Iterator[Obs], st: GroupState[Timelines]) => {
          val cur = st.getOption.getOrElse(Timelines(
            Array.empty, Array.empty, Array.empty, Array.empty, Array.empty))
          val (out, next) = fold(cur, user, it.toSeq)
          st.update(next)
          out.iterator
        })
  }
}
