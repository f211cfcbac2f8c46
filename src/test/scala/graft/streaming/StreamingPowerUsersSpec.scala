package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The streamed delta histogram must reproduce the batch
  * `events_power_users` rows exactly under any micro-batch split: the
  * retract/assert pairs cancel each user's stale bucket contribution, so
  * summing deltas per bucket equals the batch per-user
  * countDistinct(day) → histogram chain, including the ppm shares
  * recomputed from the histogram totals.
  */
class StreamingPowerUsersSpec extends SparkSuite {

  private def events(): Seq[PowerUsers.Ev] = {
    Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"),
        col("ts"), col("event_id"))
      .collect()
      .sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[Long]("event_id")))
      .map(r => PowerUsers.Ev(r.getAs[Long]("user_id"),
        r.getAs[Long]("day"), r.getAs[Long]("cents")))
      .toSeq
  }

  private def runStream(items: Seq[PowerUsers.Ev], nSplits: Int)
      : Seq[PowerUsers.Delta] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[PowerUsers.Ev]
    val out = mutable.ArrayBuffer.empty[PowerUsers.Delta]
    val q = PowerUsers.deltas(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[PowerUsers.Delta], _: Long) =>
        out.synchronized { out ++= batch.collect() }
        ()
      }
      .start()
    try {
      val step = math.max(1, items.length / nSplits)
      items.grouped(step).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    out.synchronized(out.toSeq)
  }

  test("streamed histogram equals the batch events_power_users rows under any split") {
    val items = events()
    val want = graft.ops.TimeWindowQueries
      .queries("events_power_users")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("days_active") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("money_cents"),
          r.getAs[Long]("users_ppm"), r.getAs[Long]("money_ppm")))
      .toMap
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 4, 9)) {
      val got = runStream(items, nSplits)
      val hist = got.groupBy(_.days_active).view.mapValues(ds =>
        (ds.map(_.d_users).sum, ds.map(d => BigInt(d.d_money)).sum))
        .toMap.filter(_._2._1 > 0)
      val nu = hist.values.map(v => BigInt(v._1)).sum
      val tm = hist.values.map(_._2).sum
      val gotRows = hist.map { case (da, (n, m)) =>
        da -> (n, m.toLong,
          (BigInt(n) * 1000000 / nu).toLong, (m * 1000000 / tm).toLong)
      }
      assert(gotRows == want,
        s"nSplits=$nSplits: streamed power-user histogram != batch\n" +
          s"only-streamed=${(gotRows.keySet -- want.keySet).take(5)} " +
          s"only-batch=${(want.keySet -- gotRows.keySet).take(5)} " +
          s"diff=${gotRows.collect { case (k, v) if want.get(k).exists(_ != v) =>
            (k, v, want(k)) }.take(3)}")
    }
  }

  test("retract/assert pairs conserve user count across any batch") {
    // Sum of d_users over ALL emissions = number of distinct users —
    // each user asserts exactly one live row at any time.
    val items = events()
    val got = runStream(items, 7)
    assert(got.map(_.d_users).sum == items.map(_.user_id).distinct.size.toLong)
    // money conservation: the signed money deltas telescope to each
    // user's final lifetime total
    val perUser = items.groupBy(_.user_id).view.mapValues(_.map(e => BigInt(e.cents)).sum)
    assert(got.map(d => BigInt(d.d_money)).sum == perUser.values.sum)
  }
}
