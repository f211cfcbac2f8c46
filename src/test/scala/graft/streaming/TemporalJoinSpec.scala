package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import TemporalJoin.{Enriched, Probe, Update}

/** Event-time temporal join: probes match the latest update at-or-before
  * their event time even when the update ARRIVES in a later micro-batch,
  * and the tolerance bound turns too-old matches into misses.
  */
class TemporalJoinSpec extends SparkSuite {

  private val base = 1700000000000L
  private def t(offsetS: Long) = new Timestamp(base + offsetS * 1000)

  private def run(tol: Option[Long])(
      drive: (MemoryStream[Probe], MemoryStream[Update],
        org.apache.spark.sql.streaming.StreamingQuery) => Unit): Seq[Enriched] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[Probe]
    val updates = MemoryStream[Update]
    val name = s"temporal_out_${System.nanoTime()}"
    val q = TemporalJoin.join(probes.toDS(), updates.toDS(), toleranceMs = tol)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try drive(probes, updates, q) finally q.stop()
    spark.table(name).as[Enriched].collect().toSeq.sortBy(_.id)
  }

  test("a later-arriving earlier-timed update still matches (event-time, not arrival-time)") {
    val out = run(None) { (probes, updates, q) =>
      // b1: the probe and an older update arrive; union watermark is only
      // 5s (min of sides), so the probe holds.
      probes.addData(Probe("k1", t(10), 1))
      updates.addData(Update("k1", t(5), 1.0))
      q.processAllAvailable()
      // b2: an update with EARLIER event time than the held probe arrives
      // in a LATER batch — an arrival-time join would have missed it.
      updates.addData(Update("k1", t(8), 2.0))
      q.processAllAvailable()
      // b3: both sides advance past 10s → probe 1 emits.
      probes.addData(Probe("k1", t(100), 2))
      updates.addData(Update("k1", t(50), 9.0))
      q.processAllAvailable()
      // b4: advance past 100s; also an exact-tie probe (inclusive as-of).
      probes.addData(Probe("k3", t(200), 3))
      updates.addData(Update("k3", t(200), 0.5))
      q.processAllAvailable()
      // b5: one more advance so 200s-timed rows clear the watermark.
      probes.addData(Probe("k9", t(300), 99))
      updates.addData(Update("k9", t(300), 0.0))
      q.processAllAvailable()
      probes.addData(Probe("k9", t(301), 98)) // follow-up batch for timeouts
      q.processAllAvailable()
    }
    val byId = out.map(e => e.id -> e).toMap
    assert(byId(1).v == Some(2.0), byId) // the b2 update won, not b1's
    assert(byId(1).update_ts_ms == Some(base + 8000))
    assert(byId(2).v == Some(9.0), byId) // latest ≤ 100s
    assert(byId(3).v == Some(0.5), byId) // exact tie is inclusive
  }

  test("an update tie-timed WITH the watermark arriving a batch late is late data") {
    // Pins the contract the emit condition relies on: Spark's
    // flatMapGroupsWithState late filter drops rows with ts <= watermark,
    // so once a probe's timestamp is reached no tie-timed update can
    // arrive — emitting probes at the watermark (not just before) is safe.
    val out = run(None) { (probes, updates, q) =>
      probes.addData(Probe("k1", t(10), 1))
      updates.addData(Update("k9", t(10), 0.0)) // union watermark → 10s
      q.processAllAvailable()
      updates.addData(Update("k1", t(10), 7.0)) // ts == watermark: dropped
      q.processAllAvailable()
      probes.addData(Probe("k9", t(50), 99)) // advance both sides past 10s
      updates.addData(Update("k9", t(50), 0.0))
      q.processAllAvailable()
      probes.addData(Probe("k9", t(51), 98))
      q.processAllAvailable()
    }
    assert(out.find(_.id == 1).map(_.v) == Some(None), out)
  }

  test("same-(key, ts) update conflicts resolve deterministically (largest value)") {
    val out = run(None) { (probes, updates, q) =>
      updates.addData(Update("k1", t(5), 1.0), Update("k1", t(5), 2.0))
      updates.addData(Update("k1", t(5), 2.0)) // exact redelivery collapses
      probes.addData(Probe("k1", t(10), 1))
      q.processAllAvailable()
      probes.addData(Probe("k9", t(50), 99))
      updates.addData(Update("k9", t(50), 0.0))
      q.processAllAvailable()
      probes.addData(Probe("k9", t(51), 98))
      q.processAllAvailable()
    }
    assert(out.find(_.id == 1).flatMap(_.v) == Some(2.0), out)
  }

  test("no update yet → None; tolerance turns stale matches into None") {
    val out = run(Some(10000L)) { (probes, updates, q) =>
      probes.addData(Probe("k1", t(10), 1)) // update at 8s: Δ2s, in tolerance
      updates.addData(Update("k1", t(8), 2.0))
      q.processAllAvailable()
      probes.addData(Probe("k1", t(100), 2)) // latest update Δ92s: stale
      probes.addData(Probe("k2", t(50), 4))  // key with no updates at all
      updates.addData(Update("k1", t(8), 2.0))
      q.processAllAvailable()
      probes.addData(Probe("k9", t(300), 99)) // advance both sides
      updates.addData(Update("k9", t(300), 0.0))
      q.processAllAvailable()
      probes.addData(Probe("k9", t(301), 98))
      q.processAllAvailable()
    }
    val byId = out.map(e => e.id -> e).toMap
    assert(byId(1).v == Some(2.0), byId)
    assert(byId(2).v == None, byId) // in history, out of tolerance
    assert(byId(4).v == None, byId) // never any update for the key
  }
}
