package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming POWER-USER HISTOGRAM — the incremental face of the batch
  * `events_power_users` query (ops/TimeWindowQueries.scala): users
  * bucketed by lifetime distinct active days, with per-bucket user counts
  * and money mass (the r13 verdict's ask #5).
  *
  * The hard part under streaming is that a user MIGRATES between buckets
  * as new active days arrive — a plain append-only emission per user would
  * leave stale rows in every bucket the user passed through. The topology
  * therefore emits DELTA rows: when a batch moves a user from bucket `a`
  * (with accumulated money `m`) to bucket `b` (money `m'`), the state fold
  * emits `(a, −1 user, −m)` and `(b, +1 user, +m')`. The downstream
  * aggregation is then an ordinary streaming SUM per bucket — retractions
  * cancel the user's previous contribution exactly, in ANY micro-batch
  * split and any arrival order, because each emission pair is a pure
  * function of the user's cumulative state before/after the fold.
  * `StreamingPowerUsersSpec` pins the final histogram (and the ppm shares
  * recomputed from it) EQUAL to the batch query's rows.
  *
  * State per user rides [[DauMau.fold]]'s sorted distinct-day array — the
  * same calendar-bounded O(days observed) state the DAU/MAU face carries
  * (never O(events)) — plus one Long of money cents. At 100 TB the state
  * store shards by user like every keyed stage; the histogram is ≤ |days|
  * rows.
  */
object PowerUsers {

  /** One observation: user active on an epoch day spending `cents`. */
  final case class Ev(user_id: Long, day: Long, cents: Long)

  /** Per-user state: distinct active days (sorted) + lifetime cents. */
  final case class UserMoney(days: Array[Long], money: Long)

  /** Histogram delta: `d_users`/`d_money` signed contributions to the
    * `days_active` bucket.
    */
  final case class Delta(days_active: Long, d_users: Long, d_money: Long)

  /** Append-mode delta stream: one retract + one assert pair per user per
    * batch that changes the user's (bucket, money) state.
    */
  def deltas(ev: Dataset[Ev]): Dataset[Delta] = {
    implicit val outEnc = Encoders.product[Delta]
    implicit val stateEnc = Encoders.product[UserMoney]
    implicit val longEnc = Encoders.scalaLong

    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserMoney, Delta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_: Long, rows: Iterator[Ev], state: GroupState[UserMoney]) =>
          val st = state.getOption.getOrElse(UserMoney(Array.empty, 0L))
          val batch = rows.toSeq
          val addMoney = batch.iterator.map(_.cents).sum
          val (_, newDays) = DauMau.fold(st.days, batch.map(_.day))
          val newSt = UserMoney(newDays, st.money + addMoney)
          state.update(newSt)
          val oldA = st.days.length.toLong
          val newA = newDays.length.toLong
          if (oldA == newA && addMoney == 0L) Iterator.empty
          else {
            val out = Seq.newBuilder[Delta]
            if (oldA > 0L) out += Delta(oldA, -1L, -st.money)
            out += Delta(newA, 1L, newSt.money)
            out.result().iterator
          }
      }
  }

  /** The power-user histogram as an ordinary streaming sum over the
    * deltas (update-mode downstream aggregation). Buckets a user has
    * merely passed through sum to zero users — the consumer filters
    * `n_users > 0` like the spec does. Money sums ride DECIMAL(38,0):
    * a bucket's cents mass at corpus scale exceeds what per-user Longs
    * individually bound.
    */
  def histogram(d: Dataset[Delta]): DataFrame = {
    import org.apache.spark.sql.functions._
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    d.groupBy(col("days_active"))
      .agg(sum(col("d_users")).as("n_users"),
        sum(col("d_money").cast(d38)).as("money_cents"))
  }
}
