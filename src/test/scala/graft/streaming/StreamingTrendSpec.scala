package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The final streamed Mann-Kendall snapshot per arm must equal the batch
  * `agg_mann_kendall` row under any micro-batch split — the histogram
  * state carries exactly the information the pairwise statistic needs
  * (ΔS for a day-ordered arrival is #{prior<x} − #{prior>x}, and the tie
  * correction is a pure function of the histogram).
  */
class StreamingTrendSpec extends SparkSuite {

  private def closes(): Seq[TrendMonitor.DailyClose] = {
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("sc"))
      .collect()
      .map(r => TrendMonitor.DailyClose(r.getString(0),
        r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .sortBy(d => (d.day, d.arm))
      .toSeq
  }

  private def runStream(items: Seq[TrendMonitor.DailyClose], nSplits: Int)
      : Seq[TrendMonitor.Snapshot] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[TrendMonitor.DailyClose]
    val out = mutable.ArrayBuffer.empty[TrendMonitor.Snapshot]
    val q = TrendMonitor.monitor(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[TrendMonitor.Snapshot], _: Long) =>
        out.synchronized { out ++= b.collect() }
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

  test("final streamed Mann-Kendall equals the batch row under any split") {
    val items = closes()
    val want = graft.ops.MiningQueries.queries("agg_mann_kendall")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 4, 9)) {
      val got = runStream(items, nSplits)
      val last = got.groupBy(_.arm).map { case (a, ss) => a -> ss.maxBy(_.n_days) }
      assert(last.keySet == want.keySet, s"nSplits=$nSplits")
      last.foreach { case (arm, s) =>
        val (wn, ws, wv, wz) = want(arm)
        assert((s.n_days, s.s_stat, s.var18) == ((wn, ws, wv)),
          s"nSplits=$nSplits arm $arm")
        val zr = BigDecimal(s.z).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble + 0.0
        assert(zr == wz, s"nSplits=$nSplits arm $arm z $zr vs $wz")
      }
      // s_stat snapshots form a valid prefix sequence: n_days increases
      got.groupBy(_.arm).values.foreach { ss =>
        val ns = ss.map(_.n_days)
        assert(ns == ns.sorted, "snapshots out of order")
      }
    }
  }

  test("fold kernel: ΔS counts priors through both state and in-batch delta") {
    def d(day: Long, c: Long) = TrendMonitor.DailyClose("a", day, c)
    val empty = TrendMonitor.TrendState(
      DriftMonitor.Hist(Array.empty, Array.empty, 0L), 0L)
    // series 1, 3, 2, 2: pairs (1,3)+1 (1,2)+1 (1,2)+1 (3,2)-1 (3,2)-1
    // (2,2)0 -> S = 1
    val (snap1, st1) = TrendMonitor.fold(empty, Seq(d(1, 1), d(2, 3)))
    val (snap2, st2) = TrendMonitor.fold(st1, Seq(d(3, 2), d(4, 2)))
    assert(st2.s == 1L && st2.hist.n == 4L)
    assert(snap1.last.s_stat == 1L) // (1,3)
    assert(snap2.last.s_stat == 1L)
    // var18 with tie group t=2 at value 2: 4*3*13 - 2*1*9 = 138
    assert(snap2.last.var18 == 138L)
    // one-shot fold gives the identical terminal state
    val (_, stW) = TrendMonitor.fold(empty,
      Seq(d(1, 1), d(2, 3), d(3, 2), d(4, 2)))
    assert(stW.s == st2.s && stW.hist.n == st2.hist.n)
  }
}
