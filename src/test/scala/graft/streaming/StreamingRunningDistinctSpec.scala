package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The streamed per-user distinct-type curve must land on the batch
  * `window_running_distinct` rows exactly — the min-day ledger is
  * order-independent and set insertion idempotent, so ANY micro-batch
  * split, reversed arrival, and duplicate re-delivery reach the same
  * fixpoint. The pin compares the LAST emission per (user, day) against
  * the batch query's (user_id, day, cum_types).
  */
class StreamingRunningDistinctSpec extends SparkSuite {

  private lazy val batchCurve: Map[(Long, Long), Int] =
    graft.ops.TimeWindowQueries.queries("window_running_distinct")(spark, sfDir)
      .collect()
      .map { r =>
        (r.getAs[Long]("user_id"),
          r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay) ->
          r.getAs[Long]("cum_types").toInt
      }
      .toMap

  private def obs(): Seq[RunningDistinctMonitor.Obs] = {
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("d"),
        col("event_id"))
      .collect()
      .sortBy(_.getAs[Long]("event_id"))
      .map(r => RunningDistinctMonitor.Obs(r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("d")))
      .toSeq
  }

  private def runStream(items: Seq[RunningDistinctMonitor.Obs], nSplits: Int)
      : Map[(Long, Long), Int] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[RunningDistinctMonitor.Obs]
    val out = mutable.ArrayBuffer.empty[RunningDistinctMonitor.CurvePoint]
    val q = RunningDistinctMonitor.monitor(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[RunningDistinctMonitor.CurvePoint],
            _: Long) =>
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
    // last emission per (user, day): later micro-batches re-emit the full
    // curve, so indexed insertion order resolves "last"
    val last = mutable.LinkedHashMap.empty[(Long, Long), Int]
    out.synchronized {
      out.foreach(p => last((p.user, p.day)) = p.cumTypes)
    }
    last.toMap
  }

  test("streamed curve equals the batch query under any split") {
    val items = obs()
    for (nSplits <- Seq(1, 3, 7)) {
      val got = runStream(items, nSplits)
      assert(got == batchCurve, s"nSplits=$nSplits")
    }
  }

  test("reversed arrivals and duplicate re-delivery change nothing") {
    val items = obs()
    val withDupes = items.reverse ++ items.take(items.length / 2)
    val got = runStream(withDupes, 4)
    assert(got == batchCurve)
  }

  test("curve is monotone non-decreasing per user (no retractions exist)") {
    val got = runStream(obs(), 3).toSeq.sortBy { case ((u, d), _) => (u, d) }
    got.groupBy(_._1._1).values.foreach { pts =>
      val cums = pts.sortBy(_._1._2).map(_._2)
      assert(cums == cums.sorted, "cumulative distinct regressed")
    }
  }
}
