package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming running-distinct — the incremental face of the batch
  * `window_running_distinct` query (ops/TimeWindowQueries.scala): per
  * user, the cumulative number of DISTINCT event types as of each active
  * day.
  *
  * The batch query's insight carries over unchanged: a type contributes
  * exactly at its FIRST day, and "first" is a min — order-independent
  * and monotone non-increasing under new evidence. So the state per user
  * is the min-day ledger (event type → earliest day seen) plus the set
  * of active days, both bounded by types × days — never the event count
  * — and splits, reversed arrivals, and duplicate re-delivery cannot
  * move the fixpoint (a re-delivered observation can only re-propose a
  * min it already lost, and set insertion is idempotent). Each touching
  * micro-batch re-emits the user's full (day, cum_types) curve from the
  * tiny ledger; the LAST emission per (user, day) is pinned EQUAL to the
  * batch rows by `StreamingRunningDistinctSpec`.
  *
  * The batch face's per-day event COUNT is deliberately not mirrored
  * here: counts are not idempotent under at-least-once re-delivery (the
  * same honesty boundary HllMonitor draws around `n_seen`), while the
  * distinct curve is exact under it.
  */
object RunningDistinctMonitor {

  final case class Obs(user: Long, eventType: String, day: Long)

  /** Parallel-array min-day ledger (`types(i)` first seen `firstDay(i)`)
    * plus the sorted distinct active days.
    */
  final case class Ledger(types: Seq[String], firstDay: Seq[Long],
      days: Seq[Long])

  final case class CurvePoint(user: Long, day: Long, cumTypes: Int)

  def monitor(obs: Dataset[Obs]): Dataset[CurvePoint] = {
    implicit val outEnc = Encoders.product[CurvePoint]
    implicit val stateEnc = Encoders.product[Ledger]
    implicit val longEnc = Encoders.scalaLong

    obs
      .groupByKey(_.user)
      .flatMapGroupsWithState[Ledger, CurvePoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, rows: Iterator[Obs], state: GroupState[Ledger]) =>
          val prev = state.getOption.getOrElse(
            Ledger(Seq.empty, Seq.empty, Seq.empty))
          val first = scala.collection.mutable.HashMap.empty[String, Long]
          prev.types.iterator.zip(prev.firstDay.iterator).foreach {
            case (t, d) => first(t) = d
          }
          val days = scala.collection.mutable.SortedSet.empty[Long]
          days ++= prev.days
          rows.foreach { o =>
            val cur = first.get(o.eventType)
            if (cur.isEmpty || o.day < cur.get) first(o.eventType) = o.day
            days += o.day
          }
          val sortedTypes = first.toSeq.sortBy(_._1)
          state.update(Ledger(sortedTypes.map(_._1), sortedTypes.map(_._2),
            days.toSeq))
          // replay the curve from the ledger: cum at day d = number of
          // types whose min day is <= d (the batch prefix sum, re-derived;
          // the ledger is types x days — a linear count is already free)
          val firstDays = sortedTypes.map(_._2)
          days.iterator.map(d =>
            CurvePoint(user, d, firstDays.count(_ <= d)))
      }
  }
}
