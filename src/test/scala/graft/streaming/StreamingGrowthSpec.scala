package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSuite

/** The streamed growth-accounting deltas must reproduce the batch
  * `events_growth_accounting` ledger exactly: summed per (week, state) —
  * with the data-horizon filter on churn applied at readout, mirroring
  * the batch plan's broadcast 1-row max — under any micro-batch split and
  * any arrival order (out-of-order weeks exercise the successor
  * reclassification and churn-retraction paths).
  */
class StreamingGrowthSpec extends SparkSuite {

  /** The distinct (user, ISO-week) grain of the batch query, week as the
    * Monday's epoch day.
    */
  private def seen(): Seq[GrowthAccounting.Seen] =
    graft.Tables.events(spark, sfDir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
      .collect()
      .map(r => GrowthAccounting.Seen(r.getLong(0),
        r.getDate(1).toLocalDate.toEpochDay))
      .toSeq

  private def batchRows(): Map[(Long, String), Long] =
    graft.ops.TimeWindowQueries.queries("events_growth_accounting")(spark, sfDir)
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getString(1)) ->
        r.getLong(2))
      .toMap

  /** Set by [[runStream]]: whether the last run emitted any retraction
    * (delta = −1) — the reverse-arrival test asserts the path is LIVE,
    * not just harmless.
    */
  private var sawRetraction = false

  private def runStream(xs: Seq[GrowthAccounting.Seen], nSplits: Int)
      : Map[(Long, String), Long] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[GrowthAccounting.Seen]
    val out = mutable.ArrayBuffer.empty[GrowthAccounting.Delta]
    val q = GrowthAccounting.deltas(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[GrowthAccounting.Delta], _: Long) =>
          out.synchronized { out ++= batch.collect() }
          ()
      }
      .start()
    try {
      val step = math.max(1, xs.length / nSplits)
      xs.grouped(step).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      q.processAllAvailable()
    } finally q.stop()
    val horizon = xs.map(_.week).max
    sawRetraction = out.synchronized(out.exists(_.delta < 0))
    out.synchronized(out.toSeq)
      .groupBy(d => (d.week, d.state))
      .view.mapValues(_.map(_.delta.toLong).sum).toMap
      .filter { case ((w, st), n) =>
        n != 0 && (st != "churned" || w <= horizon)
      }
  }

  test("streamed deltas equal the batch ledger under any split") {
    val xs = seen().sortBy(x => (x.user_id, x.week))
    val want = batchRows()
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 7)) {
      val got = runStream(xs, nSplits)
      assert(got == want,
        s"nSplits=$nSplits diff=${got.collect { case (k, v) if want.get(k) != Some(v) =>
          (k, v, want.get(k)) }.take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    }
  }

  test("reverse arrival order converges identically (retraction path live)") {
    // Weeks arrive NEWEST-FIRST per user: every earlier week's arrival
    // reclassifies its successor (new -> retained/resurrected) and
    // retracts previously-emitted churn candidates — the ledger must
    // still sum to the batch counts, AND the retraction path must have
    // actually fired (a reverse-order fixture with multi-week users
    // cannot converge without negative deltas).
    val xs = seen().sortBy(x => (x.user_id, -x.week))
    assert(runStream(xs, 5) == batchRows())
    assert(sawRetraction, "reverse arrival emitted no retraction — the " +
      "out-of-order path never exercised")
  }

  test("the fold kernel retracts exactly what out-of-order insertion invalidates") {
    import GrowthAccounting._
    // user active weeks 0 and 14 (gap > 7): week 14 first
    val (d1, w1) = fold(Array.empty[Long], Seq(14L))
    assert(d1 == Seq(Delta(14, "new", 1), Delta(21, "churned", 1)))
    // week 0 arrives: 14 reclassifies new -> resurrected; 0 emits its own
    // churn candidate at 7 (gap to 14 is open); 14's candidate stands
    val (d2, w2) = fold(w1, Seq(0L))
    assert(w2.toSeq == Seq(0L, 14L))
    assert(d2.toSet == Set(
      Delta(0, "new", 1),
      Delta(14, "new", -1), Delta(14, "resurrected", 1),
      Delta(7, "churned", 1)))
    // week 7 arrives: fills 0's gap (retract churn@7), 14 reclassifies
    // resurrected -> retained, 7 itself is retained, 7's own churn
    // candidate does NOT emit (14 is exactly 7 away)
    val (d3, w3) = fold(w2, Seq(7L))
    assert(w3.toSeq == Seq(0L, 7L, 14L))
    assert(d3.toSet == Set(
      Delta(7, "retained", 1),
      Delta(14, "resurrected", -1), Delta(14, "retained", 1),
      Delta(7, "churned", -1)))
  }
}
