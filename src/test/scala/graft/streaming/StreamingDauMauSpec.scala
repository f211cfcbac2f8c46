package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The streamed contribution counts must reproduce the batch
  * `events_dau_mau` rows exactly under any micro-batch split: `active`
  * contributions count to DAU, `covered` contributions count to MAU, and
  * stickiness recomputed from them matches the batch ppm — the per-user
  * sorted-active-days state factorizes the batch distinct + 28-day explode
  * + countDistinct chain into globally unique emissions.
  */
class StreamingDauMauSpec extends SparkSuite {

  private def seen(): Seq[DauMau.Seen] = {
    Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long").as("day"),
        col("ts"), col("event_id"))
      .collect()
      .sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[Long]("event_id"))) // arrival order = event-time order
      .map(r => DauMau.Seen(r.getAs[Long]("user_id"), r.getAs[Long]("day")))
      .toSeq
  }

  private def runStream(items: Seq[DauMau.Seen], nSplits: Int)
      : Seq[DauMau.Contrib] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[DauMau.Seen]
    val out = mutable.ArrayBuffer.empty[DauMau.Contrib]
    val q = DauMau.contributions(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[DauMau.Contrib], _: Long) =>
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

  test("streamed DAU/MAU equals the batch events_dau_mau rows under any split") {
    val items = seen()
    val want = graft.ops.TimeWindowQueries
      .queries("events_dau_mau")(spark, sfDir).collect()
      .map { r =>
        val day = r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay
        day -> (r.getAs[Long]("dau"), r.getAs[Long]("mau"),
          r.getAs[Long]("stickiness_ppm"))
      }.toMap
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 4, 9)) {
      val got = runStream(items, nSplits)
      // every emission is globally unique — the count IS a distinct-count
      assert(got.size == got.distinct.size, s"nSplits=$nSplits: duplicate emission")
      val dau = got.filter(_.kind == "active").groupBy(_.day).view
        .mapValues(_.size.toLong).toMap
      val mau = got.filter(_.kind == "covered").groupBy(_.day).view
        .mapValues(_.size.toLong).toMap
      // the batch query reports ACTIVE days only (inner join dau×mau)
      val gotRows = dau.keySet.map { d =>
        val (nd, nm) = (dau(d), mau(d))
        d -> (nd, nm, (BigInt(nd) * 1000000 / BigInt(nm)).toLong)
      }.toMap
      assert(gotRows == want,
        s"nSplits=$nSplits: streamed DAU/MAU != batch\n" +
          s"only-streamed=${(gotRows.keySet -- want.keySet).take(5)} " +
          s"only-batch=${(want.keySet -- gotRows.keySet).take(5)} " +
          s"diff=${gotRows.collect { case (k, v) if want.get(k).exists(_ != v) =>
            (k, v, want(k)) }.take(3)}")
    }
  }

  test("fold: overlapping windows cover each day once, out-of-order arrivals included") {
    // days 10 and 20 overlap; inserting 15 between them afterwards must
    // add NOTHING new to coverage (10 covers [10,37], 20 covers [20,47])
    val (c1, s1) = DauMau.fold(Array.empty, Seq(10L, 20L))
    val covered1 = c1.filter(_.kind == "covered").map(_.day).sorted
    assert(covered1 == (10L to 47L), covered1)
    val (c2, s2) = DauMau.fold(s1, Seq(15L))
    assert(c2.map(_.kind) == Seq("active"), c2) // new active day, no new coverage
    assert(s2.toSeq == Seq(10L, 15L, 20L))
    // a LATE day before all others covers only up to its successor
    val (c3, _) = DauMau.fold(s2, Seq(1L))
    assert(c3.filter(_.kind == "covered").map(_.day).sorted == (1L to 9L), c3)
    // duplicates emit nothing
    val (c4, _) = DauMau.fold(s2, Seq(10L, 15L, 20L))
    assert(c4.isEmpty)
  }
}
