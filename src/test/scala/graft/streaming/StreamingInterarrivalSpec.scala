package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSuite

/** The streamed gap deltas must reconstruct the batch
  * `events_interarrival` histogram exactly: summed per (type, gap) they
  * are the exact gap multiset, so the per-(type, digit-magnitude)
  * (n, min, max) readout equals the batch query under any micro-batch
  * split and any arrival order — reverse order drives every splice
  * through the gap-split retraction path.
  */
class StreamingInterarrivalSpec extends SparkSuite {

  private def obs(): Seq[InterarrivalMonitor.Obs] =
    graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("t"), col("event_id"))
      .collect()
      .map(r => InterarrivalMonitor.Obs(r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
      .toSeq

  private def batchRows(): Map[(String, Int), (Long, Long, Long)] =
    graft.ops.TimeWindowQueries.queries("events_interarrival")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  private def runStream(xs: Seq[InterarrivalMonitor.Obs], nSplits: Int)
      : Map[(String, Int), (Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[InterarrivalMonitor.Obs]
    val out = mutable.ArrayBuffer.empty[InterarrivalMonitor.GapDelta]
    val q = InterarrivalMonitor.deltas(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[InterarrivalMonitor.GapDelta], _: Long) =>
          out.synchronized { out ++= batch.collect() }
          ()
      }
      .start()
    try {
      val step = math.max(1, xs.length / nSplits)
      xs.grouped(step).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      q.processAllAvailable()
    } finally q.stop()
    // reconstruct the exact gap multiset, then the digit-bucket readout
    val multiset = out.synchronized(out.toSeq)
      .groupBy(d => (d.event_type, d.gap_us))
      .view.mapValues(_.map(_.delta).sum).filter(_._2 != 0).toMap
    multiset.foreach { case (k, n) => assert(n > 0, s"negative multiplicity at $k") }
    multiset.toSeq
      .map { case ((typ, gap), n) => (typ, gap.toString.length, gap, n) }
      .groupBy { case (typ, digits, _, _) => (typ, digits) }
      .view.mapValues { rows =>
        (rows.map(_._4.toLong).sum, rows.map(_._3).min, rows.map(_._3).max)
      }.toMap
  }

  test("streamed gap multiset reproduces the batch histogram under any split") {
    val xs = obs().sortBy(x => (x.user_id, x.t, x.event_id))
    val want = batchRows()
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 7)) {
      val got = runStream(xs, nSplits)
      assert(got == want,
        s"nSplits=$nSplits diff=${got.collect { case (k, v) if want.get(k) != Some(v) =>
          (k, v, want.get(k)) }.take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    }
  }

  test("reverse arrival exercises the gap-split retraction and still converges") {
    val xs = obs().sortBy(x => (x.user_id, -x.t, -x.event_id))
    assert(runStream(xs, 5) == batchRows())
  }

  test("the fold kernel splits gaps exactly") {
    import InterarrivalMonitor._
    val empty = Timeline(Array.empty, Array.empty)
    val (d1, t1) = fold(empty, "click", Seq((100L, 1L), (400L, 2L)))
    assert(d1 == Seq(GapDelta("click", 300, 1)))
    // 250 arrives between: retract 300, add 150 + 150
    val (d2, t2) = fold(t1, "click", Seq((250L, 3L)))
    assert(d2 == Seq(GapDelta("click", 300, -1),
      GapDelta("click", 150, 1), GapDelta("click", 150, 1)))
    assert(t2.ts.toSeq == Seq(100L, 250L, 400L))
    // equal timestamp, higher id: splices AFTER by the id tie-break
    val (d3, t3) = fold(t2, "click", Seq((250L, 9L)))
    assert(d3 == Seq(GapDelta("click", 150, -1),
      GapDelta("click", 0, 1), GapDelta("click", 150, 1)))
    assert(t3.ids.toSeq == Seq(1L, 3L, 9L, 2L))
  }
}
