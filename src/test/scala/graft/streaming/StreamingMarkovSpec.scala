package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The streamed transition multiset must equal the batch `events_markov`
  * query's counts under any micro-batch split — the one-event state
  * factorizes the batch window's lag(1), so neither the split boundaries
  * nor the batch/stream divide may change a single (src, dst) pair.
  */
class StreamingMarkovSpec extends SparkSuite {

  private def events(): Seq[MarkovChain.Ev] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts"), col("event_type"))
      .as[MarkovChain.Ev]
      .collect().toSeq
      .sortBy(e => (e.ts, e.event_id)) // arrival order = event-time order
  }

  private def runStream(items: Seq[MarkovChain.Ev], nSplits: Int)
      : Seq[MarkovChain.Transition] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[MarkovChain.Ev]
    val out = mutable.ArrayBuffer.empty[MarkovChain.Transition]
    val q = MarkovChain.transitions(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[MarkovChain.Transition], _: Long) =>
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

  test("streamed transition counts equal the batch query's under any split") {
    val items = events()
    val want = graft.ops.TimeWindowQueries
      .queries("events_markov")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        r.getAs[Long]("n")).toMap
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 3, 7)) {
      val got = runStream(items, nSplits)
        .groupBy(t => (t.src, t.dst)).view.mapValues(_.size.toLong).toMap
      assert(got == want, s"nSplits=$nSplits: streamed counts != batch counts\n" +
        s"only-streamed=${(got.keySet -- want.keySet).take(5)} " +
        s"only-batch=${(want.keySet -- got.keySet).take(5)}")
    }
  }

  test("fold emits exactly one transition per event after the key's first") {
    val evs = (1L to 6L).map(i =>
      MarkovChain.Ev(7L, i, i * 1000L, if (i % 2 == 0) "a" else "b"))
    val (t1, s1) = MarkovChain.fold(7L, None, evs.take(3))
    val (t2, s2) = MarkovChain.fold(7L, s1, evs.drop(3))
    assert((t1 ++ t2).map(_.at_event) == (2L to 6L))
    assert((t1 ++ t2).map(t => (t.src, t.dst)) ==
      Seq(("b", "a"), ("a", "b"), ("b", "a"), ("a", "b"), ("b", "a")))
    assert(s2.contains(MarkovChain.Last(6000L, 6L, "a")))
  }
}
