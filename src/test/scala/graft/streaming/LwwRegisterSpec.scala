package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** Every key's FINAL streamed register must equal the batch
  * `cdc_lww_register` row — and because the LWW merge is a CRDT
  * (commutative max-merge + OR + count), that must hold for ANY arrival
  * order, not just the event-time order the order-contracted operators
  * require: the spec drives ordered, reversed and deterministically
  * shuffled streams through 1/3/6-way splits and pins all of them to the
  * one batch answer.
  */
class LwwRegisterSpec extends SparkSuite {

  private def writes(): Seq[LwwRegister.Write] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("user_id").as("pk"), col("event_id"),
        unix_micros(col("ts")).as("ts"), col("value"))
      .as[LwwRegister.Write]
      .collect().toSeq
      .sortBy(w => (w.ts, w.event_id))
  }

  private def runStream(items: Seq[LwwRegister.Write], nSplits: Int)
      : Seq[LwwRegister.Snapshot] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[LwwRegister.Write]
    val out = mutable.ArrayBuffer.empty[LwwRegister.Snapshot]
    val q = LwwRegister.registers(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[LwwRegister.Snapshot], _: Long) =>
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

  private def batchRows(): Map[Long, (Long, Long, Double, Long, Long)] =
    graft.ops.CdcQueries.queries("cdc_lww_register")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("pk") ->
        ((r.getAs[Long]("winner_event"), r.getAs[Long]("winner_site"),
          r.getAs[Double]("value_r"), r.getAs[Long]("n_writes"),
          r.getAs[Long]("n_sites"))))
      .toMap

  test("final streamed registers equal the batch query under any order and split") {
    val ordered = writes()
    val want = batchRows()
    assert(want.nonEmpty)
    val shuffled = new scala.util.Random(17).shuffle(ordered.toVector)
    for {
      (label, items) <- Seq("ordered" -> ordered, "reversed" -> ordered.reverse,
        "shuffled" -> shuffled)
      nSplits <- Seq(1, 3, 6)
    } {
      val got = runStream(items, nSplits)
        // last snapshot per key = the one with the full write count
        .groupBy(_.pk).view.mapValues(_.maxBy(_.n_writes)).toMap
      assert(got.keySet == want.keySet, s"$label/$nSplits key sets differ")
      got.foreach { case (pk, s) =>
        val w = want(pk)
        assert((s.winner_event, s.winner_site, s.value_r, s.n_writes, s.n_sites) == w,
          s"$label nSplits=$nSplits pk=$pk: streamed $s != batch $w")
      }
    }
  }

  test("merge kernel is order-independent and counts every write once") {
    val ws = Seq(
      LwwRegister.Write(1L, 10L, 500L, 1.0),  // site 1
      LwwRegister.Write(1L, 12L, 500L, 2.0),  // site 0 — ts tie, lower site loses to 10? site(12)=0 < site(10)=1
      LwwRegister.Write(1L, 11L, 400L, 3.0))  // site 2, older ts
    val all = ws.permutations.map(p => LwwRegister.merge(None, p.iterator)).toSeq
    assert(all.distinct.size == 1, "merge is order-dependent")
    val r = all.head.get
    assert(r.eventId == 10L && r.nWrites == 3L, r.toString)
    assert(java.lang.Long.bitCount(r.siteBits) == 3, r.toString)
    // snapshots of incremental folds equal the one-shot fold (associativity)
    val inc = LwwRegister.merge(LwwRegister.merge(None, ws.take(1).iterator),
      ws.drop(1).iterator)
    assert(inc == all.head)
  }
}
