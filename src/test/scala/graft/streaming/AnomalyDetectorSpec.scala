package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The streamed flag set must equal the batch `ts_anomaly_zscore` query's
  * under any micro-batch split — the ring factorizes the batch window's
  * frame, so neither the split boundaries nor the batch/stream divide may
  * change which events are anomalous.
  */
class AnomalyDetectorSpec extends SparkSuite {

  private def points(): Seq[AnomalyDetector.Point] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
      .as[AnomalyDetector.Point]
      .collect().toSeq
      .sortBy(p => (p.user_id, p.event_id))
  }

  private def runStream(items: Seq[AnomalyDetector.Point], nSplits: Int)
      : Seq[AnomalyDetector.Anomaly] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[AnomalyDetector.Point]
    val out = mutable.ArrayBuffer.empty[AnomalyDetector.Anomaly]
    val q = AnomalyDetector.detect(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[AnomalyDetector.Anomaly], _: Long) =>
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

  test("streamed flags equal the batch query's under any micro-batch split") {
    val items = points()
    val want = graft.ops.TimeWindowQueries
      .queries("ts_anomaly_zscore")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("z_r")).toMap
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 4, 9)) {
      val got = runStream(items, nSplits)
      // The fold's sequential mean/stddev and Spark's window aggregates
      // agree to float noise, so an event whose true |z| sits within an
      // ulp of the 2.5 threshold could legitimately flag on one side
      // only. No such event exists in this fixture — the sets must match
      // exactly — but if the symmetric difference is ever non-empty, it
      // must consist ONLY of such boundary cases; anything else is a bug.
      val gotIds = got.map(_.event_id).toSet
      val diff = (gotIds -- want.keySet) ++ (want.keySet -- gotIds)
      diff.foreach { eid =>
        val z = got.find(_.event_id == eid).map(_.z)
          .orElse(want.get(eid)).get
        assert(math.abs(math.abs(z) - AnomalyDetector.Threshold) < 1e-6,
          s"event $eid flagged on one side only with non-boundary |z|=$z " +
            s"at $nSplits splits")
      }
      got.foreach { a =>
        want.get(a.event_id).foreach { wz =>
          assert(math.abs(a.z - wz) < 2e-3, s"event ${a.event_id}: ${a.z} vs $wz")
        }
        assert(a.n_hist >= AnomalyDetector.MinHist && a.n_hist <= AnomalyDetector.Depth)
      }
    }
  }

  test("ring state is bounded at Depth regardless of history length") {
    // fold a long synthetic run through one key and watch the ring
    val long = (1L to 500L).map(i =>
      AnomalyDetector.Point(1L, i, math.sin(i.toDouble) * 100))
    val (_, ring) = AnomalyDetector.fold(1L, AnomalyDetector.Ring(Seq.empty), long)
    assert(ring.values.length == AnomalyDetector.Depth)
    // and it holds exactly the last Depth values in order
    assert(ring.values == long.takeRight(AnomalyDetector.Depth).map(_.value))
  }
}
