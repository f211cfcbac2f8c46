package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The final streamed p50/p90 per line status must equal the batch
  * `agg_percentile` answer under any micro-batch split — the bounded-
  * domain histogram state plus Spark's own percentile interpolation
  * reproduce the batch order statistics exactly, not approximately.
  */
class StreamingQuantileSpec extends SparkSuite {

  private def obs(): Seq[QuantileMonitor.Obs] = {
    Tables.lineitem(spark, sfDir)
      .select(col("l_linestatus"), col("l_quantity").cast("long").as("q"),
        col("l_orderkey"))
      .collect()
      .sortBy(_.getAs[Long]("l_orderkey")) // deterministic arrival order
      .map(r => QuantileMonitor.Obs(r.getString(0), r.getAs[Long]("q")))
      .toSeq
  }

  private def runStream(items: Seq[QuantileMonitor.Obs], nSplits: Int)
      : Seq[QuantileMonitor.Snapshot] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[QuantileMonitor.Obs]
    val out = mutable.ArrayBuffer.empty[QuantileMonitor.Snapshot]
    val q = QuantileMonitor.monitor(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[QuantileMonitor.Snapshot], _: Long) =>
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

  test("final streamed p50/p90 equals batch agg_percentile under any split") {
    // the batch query reads l_quantity — values are integral doubles, so
    // the long-domain histogram loses nothing
    val want = graft.ops.AdvancedQueries.queries("agg_percentile")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val items = obs()
    for (nSplits <- Seq(1, 3, 8)) {
      val got = runStream(items, nSplits)
      val last = got.groupBy(_.grp).map { case (g, ss) => g -> ss.maxBy(_.n) }
      assert(last.keySet == want.keySet, s"nSplits=$nSplits")
      last.foreach { case (g, s) =>
        def r4(x: Double) =
          BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert((r4(s.p50), r4(s.p90)) == want(g), s"nSplits=$nSplits group $g")
      }
      // per-group sample counts are non-decreasing across snapshots
      got.groupBy(_.grp).values.foreach { ss =>
        val ns = ss.map(_.n)
        assert(ns == ns.sorted, "snapshots out of order")
      }
    }
  }

  test("percentile kernel matches Spark's interpolation contract on a known set") {
    // values {1,2,3,4} each once: p50 pos = 2.5 -> 2.5; p90 pos = 3.7 -> 3.7
    val keys = Array(1L, 2L, 3L, 4L)
    val counts = Array(1L, 1L, 1L, 1L)
    assert(QuantileMonitor.percentile(keys, counts, 4, 0.5) == 2.5)
    assert(math.abs(QuantileMonitor.percentile(keys, counts, 4, 0.9) - 3.7) < 1e-12)
    // repeated mass: {1:3, 10:1} p50 pos = 2.5 sits inside the 1-run
    assert(QuantileMonitor.percentile(Array(1L, 10L), Array(3L, 1L), 4, 0.5) == 1.0)
  }
}
