package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DAU / trailing-28-day MAU — the incremental face of the batch
  * `events_dau_mau` query (ops/TimeWindowQueries.scala): the engagement
  * staple, kept exact under streaming by turning both distinct-counts into
  * APPEND-ONLY UNIQUE EMISSIONS that an ordinary downstream aggregation
  * counts.
  *
  * Per user, state is the sorted array of the user's distinct ACTIVE DAYS
  * — bounded by the calendar-day domain (the `DriftMonitor` bound: O(days
  * observed), never O(events)). Each arriving event folds in as:
  *
  *   - a new distinct (user, day)   → emit one `active` contribution (the
  *     DAU face — the batch query's `distinct (user_id, day)` row);
  *   - the days [d, d+27] the new active day keeps the user monthly-active
  *     for, MINUS what the user's neighboring active days already cover
  *     (prev covers [prev, prev+27], next covers [next, …]), → one
  *     `covered` contribution per newly covered day (the MAU face — the
  *     batch query's exploded 28-day sequence AFTER countDistinct
  *     collapses a user's overlapping windows).
  *
  * Both emission kinds are GLOBALLY UNIQUE by construction — (user, day)
  * for `active`, (user, covered-day) for `covered` — so DAU(day) and
  * MAU(day) are plain streaming `count(*)` aggregations over the emitted
  * stream: no streaming countDistinct (unsupported), no 28-day band
  * self-join (the scale-killer the batch comment rules out), and the
  * chain is the supported append-mode flatMapGroupsWithState → aggregation
  * topology. Out-of-order day arrivals are handled by the insert-anywhere
  * neighbor formula, so the equivalence holds under ANY micro-batch split
  * — `StreamingDauMauSpec` pins the final counts EQUAL to the batch
  * query's (dau, mau, stickiness_ppm) per day.
  */
object DauMau {

  /** One observation: a user seen on an epoch day. */
  final case class Seen(user_id: Long, day: Long)

  /** Per-user state: the user's distinct active days, sorted ascending. */
  final case class ActiveDays(days: Array[Long])

  /** A unique contribution: kind = "active" (DAU face) | "covered" (MAU
    * face). Unique on (user_id, kind, day) — the downstream count is
    * therefore a distinct-count.
    */
  final case class Contrib(user_id: Long, kind: String, day: Long)

  /** Window length in days of the "monthly" trailing window (28 keeps
    * weekday composition constant — the batch query's choice).
    */
  val WindowDays = 28L

  /** Fold one batch of days for a user into unique contributions — the
    * kernel shared with the spec's oracle. `days` sorted ascending;
    * returns the emissions and the updated sorted array.
    */
  def fold(days: Array[Long], arriving: Seq[Long]): (Seq[Contrib], Array[Long]) = {
    var cur = days
    val out = Seq.newBuilder[Contrib]
    arriving.sorted.foreach { d =>
      val pos = java.util.Arrays.binarySearch(cur, d)
      if (pos < 0) { // genuinely new active day
        out += Contrib(0L, "active", d)
        val ins = -pos - 1
        // newly covered days: [d, d+27] minus prev's [prev, prev+27] and
        // next's [next, next+27] (next > d, so it owns [next, …])
        var lo = d
        var hi = d + WindowDays - 1
        if (ins > 0) lo = math.max(lo, cur(ins - 1) + WindowDays)
        if (ins < cur.length) hi = math.min(hi, cur(ins) - 1)
        var c = lo
        while (c <= hi) { out += Contrib(0L, "covered", c); c += 1 }
        val next = new Array[Long](cur.length + 1)
        System.arraycopy(cur, 0, next, 0, ins)
        next(ins) = d
        System.arraycopy(cur, ins, next, ins + 1, cur.length - ins)
        cur = next
      }
    }
    (out.result(), cur)
  }

  /** The append-mode contribution stream: one `active` per distinct
    * (user, day), one `covered` per distinct (user, monthly-active day).
    */
  def contributions(seen: Dataset[Seen]): Dataset[Contrib] = {
    implicit val outEnc = Encoders.product[Contrib]
    implicit val stateEnc = Encoders.product[ActiveDays]
    implicit val longEnc = Encoders.scalaLong

    seen
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ActiveDays, Contrib](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, rows: Iterator[Seen], state: GroupState[ActiveDays]) =>
          val (emitted, updated) = fold(
            state.getOption.getOrElse(ActiveDays(Array.empty)).days,
            rows.map(_.day).toSeq)
          state.update(ActiveDays(updated))
          emitted.iterator.map(_.copy(user_id = user))
      }
  }

  /** DAU/MAU per day as an ordinary streaming count over the unique
    * contributions (update-mode downstream aggregation).
    */
  def counts(contribs: Dataset[Contrib]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    contribs.groupBy(col("kind"), col("day")).agg(count(lit(1)).as("n"))
  }
}
