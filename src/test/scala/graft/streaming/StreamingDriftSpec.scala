package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** With the reference set to the purchase-arm histogram, the click arm's
  * FINAL streamed KS snapshot must equal the batch `agg_ks_drift` answer
  * under any micro-batch split — the bounded-domain histogram state
  * factorizes the batch cumulative fold exactly.
  */
class StreamingDriftSpec extends SparkSuite {

  private def arms(): (Seq[DriftMonitor.Obs], Map[Long, Long]) = {
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"),
        col("event_id"))
      .collect()
      .sortBy(_.getAs[Long]("event_id")) // deterministic arrival order
    val clicks = rows.filter(_.getAs[String]("event_type") == "click")
      .map(r => DriftMonitor.Obs("click", r.getAs[Long]("cents"))).toSeq
    val ref = rows.filter(_.getAs[String]("event_type") == "purchase")
      .groupBy(_.getAs[Long]("cents")).view
      .mapValues(_.length.toLong).toMap
    (clicks, ref)
  }

  private def runStream(items: Seq[DriftMonitor.Obs], ref: Map[Long, Long],
      nSplits: Int): Seq[DriftMonitor.Snapshot] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DriftMonitor.Obs]
    val out = mutable.ArrayBuffer.empty[DriftMonitor.Snapshot]
    val q = DriftMonitor.monitor(mem.toDS(), ref)
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[DriftMonitor.Snapshot], _: Long) =>
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

  test("final streamed KS equals the batch agg_ks_drift answer under any split") {
    val (clicks, ref) = arms()
    // r12: the batch query reports every arm pair — pin against its
    // (click, purchase) row
    val want = graft.ops.MiningQueries
      .queries("agg_ks_drift")(spark, sfDir)
      .filter(col("arm_a") === "click" && col("arm_b") === "purchase")
      .collect().head
    for (nSplits <- Seq(1, 3, 6)) {
      val got = runStream(clicks, ref, nSplits)
      val last = got.maxBy(_.n)
      assert(last.n == want.getAs[Long]("n_a"), s"nSplits=$nSplits n")
      assert(last.ks_ppm == want.getAs[Long]("ks_ppm"),
        s"nSplits=$nSplits: streamed ks=${last.ks_ppm} batch=${want.getAs[Long]("ks_ppm")}")
      // the arm's sample size is non-decreasing across snapshots
      assert(got.map(_.n) == got.map(_.n).sorted, "snapshots out of order")
    }
  }

  test("ksPpm kernel: identical distributions score 0; disjoint score 1e6") {
    val a = Map(1L -> 3L, 5L -> 2L)
    assert(DriftMonitor.ksPpm(a, a) == 0L)
    assert(DriftMonitor.ksPpm(Map(1L -> 4L), Map(9L -> 7L)) == 1000000L)
    assert(DriftMonitor.ksPpm(Map.empty, a) == 0L)
  }
}
