package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming GROWTH ACCOUNTING — the incremental face of the batch
  * `events_growth_accounting` query (ops/TimeWindowQueries.scala): the
  * weekly new / retained / resurrected / churned user ledger, kept exact
  * under streaming by emitting SIGNED DELTAS that an ordinary downstream
  * sum collapses to the batch counts.
  *
  * Per user, state is the sorted array of the user's distinct ACTIVE
  * WEEKS (epoch-day of the ISO Monday) — bounded by the calendar-week
  * domain, never O(events). A user's week classifies off its PREDECESSOR
  * alone (none → `new`; gap = 7 days → `retained`; else `resurrected`),
  * and emits a churn candidate at week+7 when its SUCCESSOR is absent or
  * more than 7 days away — so inserting one week touches at most three
  * ledger facts, all locally decidable:
  *
  *   - the arriving week's own state (+1);
  *   - the successor's state, whose predecessor just changed (retract the
  *     old classification, emit the new — the [[NoveltyMonitor]]
  *     retraction pattern for out-of-order arrivals);
  *   - churn candidates: the arriving week's own (when its successor gap
  *     is open), and a retraction of the predecessor's candidate when the
  *     arrival lands inside the predecessor's 7-day window (the reverse
  *     transition is impossible: a new week strictly between p and its
  *     old successor can only SHRINK p's gap).
  *
  * The batch query's data-horizon guard (no churn verdict past the last
  * observed week corpus-wide) is a GLOBAL fact no per-user state can own;
  * it is a readout-side filter (`churned` rows with week > max observed
  * active week are still pending), exactly like the batch plan's
  * broadcast 1-row max. `StreamingGrowthSpec` pins the summed deltas —
  * horizon filter applied — EQUAL to the batch query per (week, state)
  * under any micro-batch split and any arrival order.
  *
  * Scale: per-user state is the user's distinct weeks (calendar-bounded);
  * emissions are O(1) per arrival; the downstream aggregate is a plain
  * keyed sum over (week, state) — the standard append-mode
  * flatMapGroupsWithState → aggregation topology, sharded by user key.
  */
object GrowthAccounting {

  /** One observation: a user active in an ISO week (epoch-day of its
    * Monday — the distinct (user, week) grain of the batch query).
    */
  final case class Seen(user_id: Long, week: Long)

  /** Per-user state: distinct active weeks, sorted ascending. */
  final case class WeekSet(weeks: Array[Long])

  /** A signed ledger fact: state ∈ new | retained | resurrected |
    * churned, delta ∈ {+1, −1}. Summing deltas per (week, state) yields
    * the batch `n_users`.
    */
  final case class Delta(week: Long, state: String, delta: Int)

  /** Classification off the predecessor alone — the batch CASE. */
  def classify(prev: Option[Long], w: Long): String = prev match {
    case None => "new"
    case Some(p) if w - p == 7 => "retained"
    case _ => "resurrected"
  }

  /** Fold arriving weeks for one user into signed deltas — the kernel
    * shared with the spec's driver-side oracle. `cur` sorted ascending;
    * duplicates are no-ops.
    */
  def fold(cur: Array[Long], arriving: Seq[Long]): (Seq[Delta], Array[Long]) = {
    var weeks = cur
    val out = Seq.newBuilder[Delta]
    arriving.sorted.foreach { d =>
      val pos = java.util.Arrays.binarySearch(weeks, d)
      if (pos < 0) { // genuinely new active week
        val ins = -pos - 1
        val p = if (ins > 0) Some(weeks(ins - 1)) else None
        val nx = if (ins < weeks.length) Some(weeks(ins)) else None
        out += Delta(d, classify(p, d), 1)
        // successor reclassification: its predecessor changed p -> d
        nx.foreach { n =>
          val oldSt = classify(p, n)
          val newSt = classify(Some(d), n)
          if (oldSt != newSt) {
            out += Delta(n, oldSt, -1)
            out += Delta(n, newSt, 1)
          }
        }
        // own churn candidate: successor absent or beyond the window
        if (nx.forall(_ - d > 7)) out += Delta(d + 7, "churned", 1)
        // predecessor's candidate retracts when d lands inside its window
        p.foreach { pp =>
          val oldChurn = nx.forall(_ - pp > 7)
          val newChurn = d - pp > 7
          if (oldChurn && !newChurn) out += Delta(pp + 7, "churned", -1)
        }
        val next = new Array[Long](weeks.length + 1)
        System.arraycopy(weeks, 0, next, 0, ins)
        next(ins) = d
        System.arraycopy(weeks, ins, next, ins + 1, weeks.length - ins)
        weeks = next
      }
    }
    (out.result(), weeks)
  }

  /** The append-mode signed-delta stream, keyed by user. */
  def deltas(seen: Dataset[Seen]): Dataset[Delta] = {
    implicit val outEnc = Encoders.product[Delta]
    implicit val stateEnc = Encoders.product[WeekSet]
    implicit val keyEnc = Encoders.scalaLong
    seen.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: Long, it: Iterator[Seen], st: GroupState[WeekSet]) => {
          val cur = st.getOption.map(_.weeks).getOrElse(Array.empty[Long])
          val (out, next) = fold(cur, it.map(_.week).toSeq)
          st.update(WeekSet(next))
          out.iterator
        })
  }
}
