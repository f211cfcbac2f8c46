package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** The reference's two delivery paths (reference `main.go:94-113`,
  * `main.go:383-419`) as Structured Streaming sinks. Both are
  * `foreachBatch`-based so they ride the engine's offset/commit logs for
  * at-least-once delivery — the same guarantee the reference gets from its
  * Redis/file position checkpoint (`main.go:287-306`), with replay collapsed
  * by `CdcPipeline.dedupWithinWatermark` when idempotence is wanted.
  *
  * Scale design: the batch is repartitioned by routing group before the
  * POST loop so one slow group never head-of-line-blocks others (the
  * reference single-threads everything, `main.go:64-114`), and each task
  * reuses one pooled HTTP client per executor instead of a connection per
  * event.
  */
object Sinks {

  /** POST one payload to `postUrl/group` (`main.go:105`) over the pooled
    * keep-alive client (see FastHttp — the JDK client stalls ~40ms per
    * small POST). Faithful mode ignores the response status entirely
    * (hazard H4); fixed mode returns success only for 2xx so callers can
    * retry/dead-letter. Transport failure → false, log-and-continue
    * (`main.go:108-111`).
    */
  def post(postUrl: String, group: String, payload: String, checkStatus: Boolean): Boolean = {
    val status = FastHttp.post(s"$postUrl/$group", payload)
    if (status < 0) false
    else !checkStatus || (status >= 200 && status < 300)
  }

  /** HTTP delivery for one micro-batch: partition by group, POST per row.
    * Returns the rows-attempted count (for tests/metrics).
    */
  def httpDeliverBatch(batch: DataFrame, postUrl: String, checkStatus: Boolean): Unit = {
    val n = math.max(1, batch.sparkSession.sparkContext.defaultParallelism)
    batch.select(col("group"), col("payload"))
      .repartition(n, col("group"))
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach(r => post(postUrl, r.getString(0), r.getString(1), checkStatus))
      }
  }

  /** Sink A analog (`main.go:95`): enqueue payloads to a queue — the
    * stand-in for the reference's Redis list (`cdc_events`,
    * `main.go:36-39`). Pluggable behind [[DurableQueue]]: the in-process
    * impl backs the unit specs; [[FileQueue]] survives process death like
    * the reference's Redis list does. The queue-drain second pipeline (R15)
    * then consumes it via [[drainQueue]].
    */
  val queue: ConcurrentLinkedQueue[(String, String)] = new ConcurrentLinkedQueue()

  /** Executor-side enqueue: one client per partition task, rows never pass
    * through the driver (the r2 driver-side `collect()` made the driver the
    * throughput ceiling of sink A while the HTTP sink was per-partition).
    */
  def queueDeliverBatch(batch: DataFrame, q: DurableQueue = InProcessQueue): Unit =
    batch.select(col("group"), col("payload")).foreachPartition { rows: Iterator[Row] =>
      val c = q.client()
      // Publish only on success: a failed task aborts its half-written
      // segment and lets Spark's retry produce the complete one, so the
      // drain never sees data from an attempt that did not finish.
      try {
        rows.foreach(r => c.enqueue(r.getString(0), r.getString(1)))
        c.close()
      } catch { case e: Throwable => c.abort(); throw e }
    }

  /** Dead-letter queue for fixed-mode delivery: failed POSTs (transport
    * error or non-2xx when `checkStatus`) land here instead of vanishing —
    * the reference's direct path has no retry or dead-lettering at all
    * (hazard H4; `main.go:108-111` just logs).
    */
  val deadLetters: ConcurrentLinkedQueue[(String, String)] = new ConcurrentLinkedQueue()

  /** HTTP delivery with dead-lettering: like `httpDeliverBatch` but failures
    * are captured for redelivery/inspection.
    */
  def httpDeliverBatchDlq(batch: DataFrame, postUrl: String): Unit = {
    val n = math.max(1, batch.sparkSession.sparkContext.defaultParallelism)
    batch.select(col("group"), col("payload"))
      .repartition(n, col("group"))
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach { r =>
          if (!post(postUrl, r.getString(0), r.getString(1), checkStatus = true))
            deadLetters.add((r.getString(0), r.getString(1)))
        }
      }
  }

  /** The queue-drain second pipeline (R15, reference `main.go:383-419`):
    * pop everything currently queued and POST each payload again —
    * re-resolving the group from the payload itself like the reference's
    * worker (`extractTableNameFromPayload`, `main.go:421-430`), so a table
    * unmapped between enqueue and drain is dropped, not crashed (H7 fixed:
    * unparsable payloads are skipped).
    */
  def drainQueue(postUrl: String, tableToGroup: Map[String, String],
      checkStatus: Boolean = false, q: DurableQueue = InProcessQueue): Int = {
    val tableRe = """"source":\{"table":"([^"]+)"\}""".r
    var n = 0
    q.drain { (_, payload) =>
      tableRe.findFirstMatchIn(payload).map(_.group(1))
        .flatMap(tableToGroup.get)
        .foreach { group => if (post(postUrl, group, payload, checkStatus)) n += 1 }
    }
    n
  }

  /** The queue-drain pipeline as a STREAMING query (R15 the Spark-native
    * way): a [[FileQueue]] directory is just files, so Spark's file-stream
    * source tails it natively — new segments published by the enqueue side
    * become micro-batches here, with the engine checkpoint tracking which
    * segments were already drained (exactly-once segment accounting, vs the
    * reference worker's destructive BLPOP that loses an event popped right
    * before a crash, `main.go:383-419`). Returns `(group, payload)` rows;
    * wire to [[httpDeliverBatch]] via `foreachBatch` for the POST leg.
    */
  def queueStream(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val lines = spark.readStream
      .format("text")
      .option("pathGlobFilter", "q-*.seg")
      .load(dir)
    val tab = instr(col("value"), "\t")
    lines.filter(tab > 0).select(
      substring_index(col("value"), "\t", 1).as("group"),
      expr("substring(value, instr(value, '\t') + 1)").as("payload"))
  }

  /** Wire the dual-sink topology (H3: every event delivered on BOTH paths)
    * onto a streaming envelope DataFrame. One streaming query, one
    * `foreachBatch` writing to both sinks — at-least-once ×2 like the
    * reference, minus its crash-replay window.
    */
  def dualSink(
      envelopes: DataFrame,
      postUrl: String,
      checkpointDir: String,
      checkStatus: Boolean = false,
      q: DurableQueue = InProcessQueue): DataStreamWriter[Row] =
    envelopes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.persist()
        try {
          httpDeliverBatch(cached, postUrl, checkStatus)
          queueDeliverBatch(cached, q)
        } finally { cached.unpersist(); () }
      }

  def runToCompletion(w: DataStreamWriter[Row]): StreamingQuery = {
    val q = w.start()
    q.awaitTermination()
    q
  }
}
