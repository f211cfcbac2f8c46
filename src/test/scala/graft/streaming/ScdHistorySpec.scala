package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}
import graft.ops.CdcQueries

/** Streaming SCD2 must equal the batch `cdc_scd2` query's CLOSED rows
  * (valid_to set) under any micro-batch split of the per-key-ordered
  * change stream; open rows stay in state and are exactly the batch
  * query's `valid_to IS NULL` remainder.
  */
class ScdHistorySpec extends SparkSuite {

  private def changes(): Seq[ScdHistory.Change] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("user_id").as("pk"), col("event_id"),
        col("event_type").as("op"), col("value"))
      .as[ScdHistory.Change]
      .collect().toSeq
      .sortBy(c => (c.pk, c.event_id)) // per-key log order (binlog contract)
  }

  private def runStream(items: Seq[ScdHistory.Change], nSplits: Int)
      : Seq[ScdHistory.ClosedVersion] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[ScdHistory.Change]
    val out = mutable.ArrayBuffer.empty[ScdHistory.ClosedVersion]
    val q = ScdHistory.history(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ScdHistory.ClosedVersion], _: Long) =>
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

  private def batchClosed(): Map[(Long, Long), Row] =
    CdcQueries.queries("cdc_scd2")(spark, sfDir)
      .filter(col("valid_to").isNotNull)
      .collect()
      .map(r => (r.getAs[Long]("pk"), r.getAs[Long]("version")) -> r)
      .toMap

  test("closed intervals equal the batch query's under any micro-batch split") {
    import spark.implicits._
    val items = changes()
    val want = batchClosed()
    for (nSplits <- Seq(1, 4)) {
      val got = runStream(items, nSplits)
      assert(got.size == want.size, s"closed-row count at $nSplits splits")
      // compare through the batch query's own rounding (round(value, 2))
      // so double formatting never crosses the comparison
      val gotRounded = got.toDS()
        .select(col("pk"), col("version"), col("valid_from"), col("valid_to"),
          col("op"), round(col("value"), 2).as("val_r"))
        .collect()
      gotRounded.foreach { r =>
        val key = (r.getAs[Long]("pk"), r.getAs[Long]("version"))
        val w = want.getOrElse(key, fail(s"unexpected closed version $key"))
        assert(r.getAs[Long]("valid_from") == w.getAs[Long]("valid_from"), s"$key valid_from")
        assert(r.getAs[Long]("valid_to") == w.getAs[Long]("valid_to"), s"$key valid_to")
        assert(r.getAs[String]("op") == w.getAs[String]("op"), s"$key op")
        assert(Option(r.get(5)) == Option(w.getAs[Any]("val_r")), s"$key val_r")
      }
    }
  }

  test("kernel: a delete closes its predecessor, carries no value, and can be re-opened") {
    val cs = Seq(
      ScdHistory.Change(7L, 10L, "click", 1.5),
      ScdHistory.Change(7L, 20L, "error", 9.9),
      ScdHistory.Change(7L, 30L, "view", 2.5))
    val (closed, open) = ScdHistory.fold(7L, None, cs)
    assert(closed == Seq(
      ScdHistory.ClosedVersion(7L, 1L, 10L, 20L, "click", Some(1.5)),
      ScdHistory.ClosedVersion(7L, 2L, 20L, 30L, "error", None)))
    assert(open.contains(ScdHistory.OpenVersion(3L, 30L, "view", 2.5)))
  }

  test("kernel: folding a split equals folding whole (state carries across)") {
    val items = changes().filter(_.pk % 17 == 3)
    val byKey = items.groupBy(_.pk)
    byKey.foreach { case (pk, cs) =>
      val ordered = cs.sortBy(_.event_id)
      val (wholeClosed, wholeOpen) = ScdHistory.fold(pk, None, ordered)
      val (h, t) = ordered.splitAt(ordered.size / 2)
      val (c1, o1) = ScdHistory.fold(pk, None, h)
      val (c2, o2) = ScdHistory.fold(pk, o1, t)
      assert(c1 ++ c2 == wholeClosed, s"pk $pk closed rows")
      assert(o2 == wholeOpen, s"pk $pk open state")
    }
  }
}
