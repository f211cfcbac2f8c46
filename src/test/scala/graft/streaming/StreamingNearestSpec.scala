package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSuite

/** The streamed nearest-event verdicts must converge to the batch
  * `join_nearest_event` table exactly — last verdict per purchase wins —
  * under any micro-batch split and any arrival order. Clicks arriving
  * AFTER all purchases drive every verdict through the steal/re-verdict
  * path; interleaved order exercises both.
  */
class StreamingNearestSpec extends SparkSuite {

  private def obs(): Seq[NearestEventMonitor.Obs] =
    graft.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .filter(col("event_type") === "purchase" || col("value").isNotNull)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("t"), col("event_id"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .collect()
      .map(r => NearestEventMonitor.Obs(r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq

  /** Spark `round(x, 2)` semantics (BigDecimal HALF_UP), for value parity
    * with the batch query's rounded output.
    */
  private def r2(v: Double): Double =
    if (v.isNaN) Double.NaN
    else new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue

  private def batchRows(): Map[Long, (Double, String)] =
    graft.ops.RelationalQueries.queries("join_nearest_event")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) Double.NaN else r.getDouble(2)), r.getString(3)))
      .toMap

  private def runStream(xs: Seq[NearestEventMonitor.Obs], nSplits: Int)
      : Map[Long, (Double, String)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[NearestEventMonitor.Obs]
    val out = mutable.ArrayBuffer.empty[NearestEventMonitor.Verdict]
    val q = NearestEventMonitor.verdicts(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[NearestEventMonitor.Verdict], _: Long) =>
          out.synchronized { out ++= batch.collect() }
          ()
      }
      .start()
    try {
      val step = math.max(1, xs.length / nSplits)
      xs.grouped(step).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      q.processAllAvailable()
    } finally q.stop()
    // update semantics: last verdict per purchase wins
    out.synchronized(out.toSeq).foldLeft(Map.empty[Long, (Double, String)]) {
      (m, v) => m + (v.event_id -> ((r2(v.nearest), v.direction)))
    }
  }

  private def diff(got: Map[Long, (Double, String)],
      want: Map[Long, (Double, String)]): String = {
    def eq(a: (Double, String), b: (Double, String)) =
      a._2 == b._2 && (a._1.isNaN && b._1.isNaN || a._1 == b._1)
    val missing = (want.keySet -- got.keySet).take(3)
    val extra = (got.keySet -- want.keySet).take(3)
    val ne = want.keys.filter(k => got.contains(k) && !eq(got(k), want(k))).take(3)
      .map(k => (k, got(k), want(k)))
    s"missing=$missing extra=$extra ne=$ne"
  }

  private def assertEqualMaps(got: Map[Long, (Double, String)],
      want: Map[Long, (Double, String)], label: String): Unit = {
    def eq(a: (Double, String), b: (Double, String)) =
      a._2 == b._2 && (a._1.isNaN && b._1.isNaN || a._1 == b._1)
    assert(got.keySet == want.keySet &&
      want.keys.forall(k => eq(got(k), want(k))),
      s"$label: ${diff(got, want)}")
  }

  test("streamed verdicts converge to the batch join under any split") {
    val xs = obs().sortBy(x => (x.user_id, x.t, x.event_id))
    val want = batchRows()
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 7))
      assertEqualMaps(runStream(xs, nSplits), want, s"nSplits=$nSplits")
  }

  test("clicks racing in AFTER their purchases still converge (steal path live)") {
    // all purchases first, then all clicks newest-first: every purchase
    // verdicts as 'none' initially and is re-verdicted — possibly several
    // times — purely through the click-arrival steal slice.
    val xs = obs().sortBy(x =>
      (x.user_id, if (x.kind == "purchase") 0 else 1, -x.t, -x.event_id))
    assertEqualMaps(runStream(xs, 5), batchRows(), "clicks-last")
  }

  test("the fold kernel re-verdicts exactly the slice a new click can steal") {
    import NearestEventMonitor._
    val empty = Timelines(Array.empty, Array.empty, Array.empty,
      Array.empty, Array.empty)
    // purchases at t=10 and t=100, then a click at t=60: both re-verdict
    // (no neighboring clicks — the slice is everything)
    val (v1, st1) = fold(empty, 7L, Seq(
      Obs(7, "purchase", 10, 1, 0.0), Obs(7, "purchase", 100, 2, 0.0)))
    assert(v1.map(_.direction) == Seq("none", "none"))
    val (v2, st2) = fold(st1, 7L, Seq(Obs(7, "click", 60, 3, 1.5)))
    assert(v2.toSet == Set(Verdict(7, 1, 1.5, "next"), Verdict(7, 2, 1.5, "prev")))
    // a second click at t=90 can only steal purchases in (60, +inf):
    // purchase 1 (t=10) must NOT be re-verdicted
    val (v3, st3) = fold(st2, 7L, Seq(Obs(7, "click", 90, 4, 2.5)))
    assert(v3 == Seq(Verdict(7, 2, 2.5, "prev")),
      s"expected only the t=100 purchase re-verdicted, got $v3")
    // at-least-once re-delivery of a spliced click OR purchase is a
    // no-op: no emissions, no state growth (r16 review)
    val (v4, st4) = fold(st3, 7L,
      Seq(Obs(7, "click", 90, 4, 2.5), Obs(7, "purchase", 10, 1, 0.0)))
    assert(v4.isEmpty, s"duplicate delivery emitted $v4")
    assert(st4.ct.length == st3.ct.length && st4.pt.length == st3.pt.length,
      "duplicate delivery grew state")
  }
}
