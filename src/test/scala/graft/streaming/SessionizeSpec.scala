package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import Sessionize.{ClosedSession, Event}

/** flatMapGroupsWithState sessionization: gap-close within a batch, and
  * event-time-timeout close across batches once the watermark passes.
  */
class SessionizeSpec extends SparkSuite {

  private val base = 1700000000000L
  private def ev(u: Long, offsetS: Long, v: Double) =
    Event(u, new Timestamp(base + offsetS * 1000), v)

  test("sessions close on gap and on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      mem.toDS().withWatermark("ts", "0 seconds").as[Event], gapMs = 60000L)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 — two events 10s apart (one session), then a 5-min
      // jump (gap-close), user 2 — one session. The batch's own watermark
      // (base+310s) already exceeds user 2's last+gap, so its event-time
      // timeout fires in the follow-up batch processAllAvailable runs.
      mem.addData(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(1, 310, 4.0), ev(2, 0, 8.0))
      q.processAllAvailable()
      val afterB1 = spark.table("sessions_out").as[ClosedSession].collect()
        .sortBy(_.user_id)
      assert(afterB1.toSeq == Seq(
        ClosedSession(1, new Timestamp(base), new Timestamp(base + 70000), 2, 3.0),
        ClosedSession(2, new Timestamp(base), new Timestamp(base + 60000), 1, 8.0)))

      // batch 2: far-future event advances the watermark past every open
      // session's (last + gap) → timeouts close them in the following batch.
      mem.addData(ev(3, 4000, 0.5))
      q.processAllAvailable()
      mem.addData(ev(3, 4001, 0.5)) // one more batch so timeouts fire
      q.processAllAvailable()
      val all = spark.table("sessions_out").as[ClosedSession].collect()
        .sortBy(c => (c.user_id, c.session_start.getTime))
      assert(all.exists(c => c.user_id == 1 && c.n_events == 1 && c.sum_value == 4.0),
        all.mkString(", "))
      assert(all.exists(c => c.user_id == 2 && c.n_events == 1 && c.sum_value == 8.0),
        all.mkString(", "))
    } finally q.stop()
  }
}
