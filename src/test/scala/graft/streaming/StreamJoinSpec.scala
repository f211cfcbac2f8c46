package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Tier C joins: stream-stream inner join with event-time range constraint
  * (watermark-bounded state on both sides), and stream-static broadcast
  * enrichment.
  */
class StreamJoinSpec extends SparkSuite {

  case class Click(user: Long, click_ts: Timestamp)
  case class Purchase(user: Long, buy_ts: Timestamp, amount: Double)

  private val base = 1700000000000L
  private def ts(s: Long) = new Timestamp(base + s * 1000)

  test("stream-stream join: purchases within 10 min after a click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Purchase]
    clicks.addData(Click(1, ts(0)), Click(2, ts(0)), Click(1, ts(1200)))
    buys.addData(
      Purchase(1, ts(300), 10.0), // 5 min after click → joins
      Purchase(1, ts(900), 20.0), // 15 min after first click → out of range
      Purchase(2, ts(30), 5.0), // 30s after click → joins
      Purchase(3, ts(60), 9.0)) // no click → dropped (inner)
    val joined = clicks.toDF()
      .withColumnRenamed("user", "c_user")
      .withWatermark("click_ts", "1 hour")
      .join(
        buys.toDF()
          .withColumnRenamed("user", "b_user")
          .withWatermark("buy_ts", "1 hour"),
        expr(
          """c_user = b_user AND
            |buy_ts >= click_ts AND
            |buy_ts <= click_ts + INTERVAL 10 MINUTES""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select(col("c_user"), col("amount")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted
      assert(rows.toSeq == Seq((1L, 10.0), (2L, 5.0)), rows.mkString(","))
    } finally q.stop()
  }

  test("stream-static join: streaming events enriched from a static dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Click]
    mem.addData(Click(1, ts(0)), Click(2, ts(5)), Click(99, ts(9)))
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val joined = mem.toDF().join(broadcast(dim), Seq("user")) // inner: 99 drops
    val q = joined.writeStream.format("memory").queryName("st_join")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("st_join").select("user", "tier").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(rows.toSeq == Seq((1L, "gold"), (2L, "silver")))
    } finally q.stop()
  }

  test("fixed-mode delivery dead-letters failed POSTs") {
    import spark.implicits._
    val server = new DebugSink
    try {
      Sinks.deadLetters.clear()
      server.respondStatus = 500 // every POST fails the 2xx check
      val batch = Seq(("g1", """{"a":1}"""), ("g2", """{"a":2}"""))
        .toDF("group", "payload")
      Sinks.httpDeliverBatchDlq(batch, server.url)
      assert(Sinks.deadLetters.size == 2)
      // recover: flip the sink healthy and redrive the dead letters
      server.respondStatus = 200
      val redriven = Sinks.deadLetters.toArray(Array.empty[(String, String)])
      Sinks.deadLetters.clear()
      redriven.foreach { case (g, p) =>
        assert(Sinks.post(server.url, g, p, checkStatus = true))
      }
      assert(server.captured.size == 4) // 2 failed + 2 redriven
    } finally server.stop()
  }
}
