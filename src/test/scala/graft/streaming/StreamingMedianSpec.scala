package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The streamed per-event moving medians must reproduce the batch
  * `window_moving_median` rows EXACTLY — same ≤ 5-value frame, same
  * middle-element/mean-of-middles order statistic — under any uneven
  * micro-batch split of the ordered stream (the MarkovChain ordering
  * contract: a frame is a statement about sequence).
  */
class StreamingMedianSpec extends SparkSuite {

  private lazy val batchRows: Map[(Long, Long), (Double, Long)] =
    graft.ops.AdvancedQueries.queries("window_moving_median")(spark, sfDir)
      .collect()
      .map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
          ((r.getAs[Double]("mm5"), r.getAs[Long]("n_frame")))
      }
      .toMap

  private def obs(): Seq[MedianMonitor.Ev] = {
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"),
        floor(col("value") * 100 + 0.5).cast("long").as("vc"))
      .collect()
      .sortBy(r => (r.getAs[Long]("t"), r.getAs[Long]("event_id")))
      .map(r => MedianMonitor.Ev(r.getAs[Long]("user_id"),
        r.getAs[Long]("event_id"), r.getAs[Long]("t"), r.getAs[Long]("vc")))
      .toSeq
  }

  private def runStream(items: Seq[MedianMonitor.Ev], nSplits: Int)
      : Map[(Long, Long), (Double, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[MedianMonitor.Ev]
    val out = mutable.ArrayBuffer.empty[MedianMonitor.Scored]
    val q = MedianMonitor.monitor(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[MedianMonitor.Scored], _: Long) =>
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
    out.synchronized {
      out.map(s => (s.user_id, s.event_id) ->
        ((s.mm5, s.n_frame.toLong))).toMap
    }
  }

  test("streamed medians equal the batch query under any split") {
    val items = obs()
    for (nSplits <- Seq(1, 3, 7)) {
      val got = runStream(items, nSplits)
      assert(got.size == batchRows.size, s"nSplits=$nSplits row count")
      assert(got == batchRows, s"nSplits=$nSplits")
    }
  }

  test("every emission is exactly a .0 or .5 double (integer-cents frame)") {
    val got = runStream(obs(), 4)
    got.values.foreach { case (mm5, _) =>
      assert(mm5 * 2 == math.rint(mm5 * 2), s"non half-integer median $mm5")
    }
  }
}
