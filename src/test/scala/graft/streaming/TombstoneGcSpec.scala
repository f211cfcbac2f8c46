package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** Every key's FINAL streamed tombstone ledger, pushed through the shared
  * verdict function at the batch watermark, must equal the batch
  * `cdc_tombstone_gc` row — and because the ledger merge is
  * commutative-associative (max, max, +), that must hold for ANY arrival
  * order: ordered, reversed and deterministically shuffled streams
  * through 1/3/6-way splits all pin to the one batch answer.
  */
class TombstoneGcSpec extends SparkSuite {

  private def changes(): Seq[TombstoneGc.Change] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("user_id").as("pk"), col("event_id").as("pos"),
        col("event_type").as("op"))
      .as[TombstoneGc.Change]
      .collect().toSeq
      .sortBy(_.pos)
  }

  private def runStream(items: Seq[TombstoneGc.Change], nSplits: Int)
      : Seq[TombstoneGc.Snapshot] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[TombstoneGc.Change]
    val out = mutable.ArrayBuffer.empty[TombstoneGc.Snapshot]
    val q = TombstoneGc.tombstones(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[TombstoneGc.Snapshot], _: Long) =>
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

  private def batchRows(): Map[Long, (Long, Long, Boolean, String, Long)] =
    graft.ops.CdcQueries.queries("cdc_tombstone_gc")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("pk") ->
        ((r.getAs[Long]("last_delete"), r.getAs[Long]("n_deletes"),
          r.getAs[Boolean]("revived"), r.getAs[String]("gc_action"),
          r.getAs[Long]("wm"))))
      .toMap

  test("final streamed verdicts equal the batch query under any order and split") {
    val ordered = changes()
    val want = batchRows()
    assert(want.nonEmpty)
    val wm = ordered.map(_.pos).max * 3 / 4
    val shuffled = new scala.util.Random(23).shuffle(ordered.toVector)
    for {
      (label, items) <- Seq("ordered" -> ordered, "reversed" -> ordered.reverse,
        "shuffled" -> shuffled)
      nSplits <- Seq(1, 3, 6)
    } {
      // last snapshot per key = the one with the full delete count, with
      // revived latched by the largest lastAny seen — i.e. highest
      // (n_deletes, revived) pair
      val got = runStream(items, nSplits)
        .groupBy(_.pk).view
        .mapValues(_.maxBy(s => (s.n_deletes, s.revived)))
        .toMap
      assert(got.keySet == want.keySet, s"$label/$nSplits key sets differ")
      got.foreach { case (pk, s) =>
        val v = TombstoneGc.verdict(s, wm)
        val w = want(pk)
        assert((v.last_delete, v.n_deletes, v.revived, v.gc_action, v.wm) == w,
          s"$label nSplits=$nSplits pk=$pk: streamed $v != batch $w")
      }
    }
  }

  test("merge kernel is order-independent and the verdict CASE is total") {
    val cs = Seq(
      TombstoneGc.Change(1L, 10L, "error"),
      TombstoneGc.Change(1L, 12L, "click"),
      TombstoneGc.Change(1L, 11L, "error"))
    val all = cs.permutations.map(p => TombstoneGc.merge(None, p.iterator)).toSeq
    assert(all.distinct.size == 1, "merge is order-dependent")
    val t = all.head.get
    assert(t == TombstoneGc.Tomb(11L, 12L, 2L), t.toString)
    // incremental folds equal the one-shot fold (associativity)
    val inc = TombstoneGc.merge(TombstoneGc.merge(None, cs.take(2).iterator),
      cs.drop(2).iterator)
    assert(inc == all.head)
    // all three verdicts reachable
    assert(TombstoneGc.verdict(1L, t, 20L).gc_action == "keep_revived")
    val dead = TombstoneGc.Tomb(11L, 11L, 2L)
    assert(TombstoneGc.verdict(1L, dead, 20L).gc_action == "purge")
    assert(TombstoneGc.verdict(1L, dead, 5L).gc_action == "retain")
  }
}
