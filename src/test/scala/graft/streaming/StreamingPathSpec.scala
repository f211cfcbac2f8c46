package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The streamed trigram multiset must equal the batch `events_path`
  * query's counts under any micro-batch split — the two-event state
  * factorizes the batch window's lag(2)/lag(1), so neither the split
  * boundaries nor the batch/stream divide may change a single
  * (s1, s2, s3) path.
  */
class StreamingPathSpec extends SparkSuite {

  private def events(): Seq[PathMiner.Ev] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts"), col("event_type"))
      .as[PathMiner.Ev]
      .collect().toSeq
      .sortBy(e => (e.ts, e.event_id)) // arrival order = event-time order
  }

  private def runStream(items: Seq[PathMiner.Ev], nSplits: Int)
      : Seq[PathMiner.Step] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[PathMiner.Ev]
    val out = mutable.ArrayBuffer.empty[PathMiner.Step]
    val q = PathMiner.steps(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[PathMiner.Step], _: Long) =>
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

  test("streamed path counts equal the batch query's under any split") {
    val items = events()
    val want = graft.ops.TimeWindowQueries
      .queries("events_path")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"),
        r.getAs[String]("s3")) -> r.getAs[Long]("n")).toMap
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 3, 7)) {
      val got = runStream(items, nSplits)
        .groupBy(t => (t.s1, t.s2, t.s3)).view.mapValues(_.size.toLong).toMap
      assert(got == want, s"nSplits=$nSplits: streamed counts != batch counts\n" +
        s"only-streamed=${(got.keySet -- want.keySet).take(5)} " +
        s"only-batch=${(want.keySet -- got.keySet).take(5)}")
    }
  }

  test("fold emits exactly one trigram per event after the key's second") {
    val evs = (1L to 6L).map(i =>
      PathMiner.Ev(7L, i, i * 1000L, if (i % 2 == 0) "a" else "b"))
    val (t1, s1) = PathMiner.fold(7L, PathMiner.Last2(0, 0, "", 0, 0, "", 0),
      evs.take(3))
    val (t2, s2) = PathMiner.fold(7L, s1, evs.drop(3))
    assert((t1 ++ t2).map(_.at_event) == (3L to 6L))
    assert((t1 ++ t2).map(t => (t.s1, t.s2, t.s3)) ==
      Seq(("b", "a", "b"), ("a", "b", "a"), ("b", "a", "b"), ("a", "b", "a")))
    assert(s2 == PathMiner.Last2(5000L, 5L, "b", 6000L, 6L, "a", 2))
  }
}
