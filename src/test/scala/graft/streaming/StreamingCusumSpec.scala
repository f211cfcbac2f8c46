package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** With the targets fixed to the batch query's own per-arm mean daily
  * cents, the streamed CUSUM snapshots must equal every `ts_cusum` row
  * under any micro-batch split — the (prefix sum, running min) state
  * factorizes the batch's two cumulative windows exactly.
  */
class StreamingCusumSpec extends SparkSuite {

  private def fixture(): (Seq[CusumMonitor.DailyClose], Map[String, Long]) = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("sc"))
      .collect()
      .map(r => CusumMonitor.DailyClose(r.getString(0),
        r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .sortBy(d => (d.day, d.arm)) // arrival order = day order per arm
      .toSeq
    val targets = daily.groupBy(_.arm).map { case (a, ds) =>
      a -> (ds.map(d => BigInt(d.cents)).sum / ds.size).toLong
    }
    (daily, targets)
  }

  private def runStream(items: Seq[CusumMonitor.DailyClose],
      targets: Map[String, Long], nSplits: Int): Seq[CusumMonitor.Snapshot] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[CusumMonitor.DailyClose]
    val out = mutable.ArrayBuffer.empty[CusumMonitor.Snapshot]
    val q = CusumMonitor.monitor(mem.toDS(), targets)
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CusumMonitor.Snapshot], _: Long) =>
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

  test("streamed CUSUM equals every batch ts_cusum row under any split") {
    val (daily, targets) = fixture()
    val want = graft.ops.TimeWindowQueries.queries("ts_cusum")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    assert(want.nonEmpty)
    // at least one alarm and one quiet day, or the pin is vacuous
    assert(want.values.exists(_._2) || want.values.exists(!_._2))
    for (nSplits <- Seq(1, 4, 11)) {
      val got = runStream(daily, targets, nSplits)
      assert(got.size == want.size, s"nSplits=$nSplits size")
      got.foreach { s =>
        assert(want((s.arm, s.day)) == ((s.cusum_cents, s.alarm)),
          s"nSplits=$nSplits ${s.arm} ${s.day}")
      }
    }
  }

  test("fold kernel: resets at zero, alarms above target, splits freely") {
    val t = 10L
    def d(day: Long, c: Long) = CusumMonitor.DailyClose("a", day, c)
    val all = Seq(d(1, 5), d(2, 25), d(3, 30), d(4, 0), d(5, 12))
    val (s1, st1) = CusumMonitor.fold(t, CusumMonitor.PrefixState(0, 0), all.take(2))
    val (s2, st2) = CusumMonitor.fold(t, st1, all.drop(2))
    val (whole, stW) = CusumMonitor.fold(t, CusumMonitor.PrefixState(0, 0), all)
    assert(s1 ++ s2 == whole && st2 == stW)
    // day1: p=-5 min=-5 cusum=0; day2: p=10 cusum=15 alarm; day3: p=30
    // cusum=35 alarm; day4: p=20 cusum=25 alarm; day5: p=22 cusum=27 alarm
    assert(whole.map(_.cusum_cents) == Seq(0L, 15L, 35L, 25L, 27L))
    assert(whole.map(_.alarm) == Seq(false, true, true, true, true))
  }
}
