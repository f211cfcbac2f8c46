package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The batch `ts_ohlc` candle semantics must run UNCHANGED as a streaming
  * windowed aggregate: `min_by`/`max_by` on event time inside a
  * watermarked `window()` groupBy — the declarative-aggregate pair is
  * less-traveled in streaming than sum/count, so this pins that the
  * open/close picks survive incremental accumulation across arbitrary
  * micro-batch splits (partial candles merge: the min_by of two partial
  * states is the min_by of their union, which is exactly what makes OHLC
  * maintainable without keeping the window's rows).
  *
  * Append mode + a generous watermark: every window closes once the
  * stream drains, and closed candles must equal the batch query's rows
  * bit-for-bit after the same rounding.
  */
object StreamingOhlcSpec {
  final case class Pt(t: java.sql.Timestamp, value: Double)
}

class StreamingOhlcSpec extends SparkSuite {
  import StreamingOhlcSpec.Pt

  test("streamed OHLC candles equal the batch query's at any split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val items = Tables.events(spark, sfDir)
      .select(col("ts"), col("value")).collect()
      .map(r => Pt(r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value")))
      .sortBy(_.t.getTime) // event-time order so the watermark never drops
    val want = graft.ops.TimeWindowQueries.queries("ts_ohlc")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap

    for (nSplits <- Seq(1, 5)) {
      val mem = MemoryStream[Pt]
      val out = mutable.ArrayBuffer.empty[Row]
      val candles = mem.toDS()
        .withWatermark("t", "1 hour")
        .groupBy(window(col("t"), "10 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
          round(min_by(col("value"), col("t")), 2).as("open_r"),
          round(max(col("value")), 2).as("high_r"),
          round(min(col("value")), 2).as("low_r"),
          round(max_by(col("value"), col("t")), 2).as("close_r"))
        .select((unix_micros(col("w.start")) / 600000000L).cast("long").as("bucket"),
          col("n"), col("open_r"), col("high_r"), col("low_r"), col("close_r"))
      val q = candles.writeStream.outputMode(OutputMode.Append())
        .trigger(Trigger.ProcessingTime(50))
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          out.synchronized { out ++= batch.collect() }
          ()
        }
        .start()
      try {
        val step = math.max(1, items.length / nSplits)
        items.grouped(step).foreach { chunk =>
          mem.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
        }
        // advance the watermark far past the data so every window closes
        val last = items.last.t.getTime
        mem.addData(Pt(new java.sql.Timestamp(last + 48L * 3600 * 1000), 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = out.synchronized(out.toSeq)
        .map(r => r.getAs[Long]("bucket") -> r).toMap
      // the sentinel's own candle is the only extra row
      val gotData = got.filter { case (b, _) => want.contains(b) }
      assert(gotData.keySet == want.keySet, s"bucket set at $nSplits splits")
      gotData.foreach { case (b, r) =>
        val w = want(b)
        Seq("n", "open_r", "high_r", "low_r", "close_r").foreach { c =>
          assert(r.getAs[Any](c) == w.getAs[Any](c), s"bucket $b col $c at $nSplits")
        }
      }
      // the sentinel's own window never closes (nothing advances the
      // watermark past it), so the closed-candle set must be exactly the
      // batch set — no extras
      assert(got.size == want.size, s"unexpected extra candles at $nSplits splits")
    }
  }
}
