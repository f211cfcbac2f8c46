package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** Pins for the order-sensitive sketch composition (dedup leg → GK
  * summary): (1) duplicate re-delivery of any prefix under a FIXED batch
  * layout is absorbed by the dedup leg — every snapshot bit-identical;
  * (2) at EVERY batch layout the final estimate satisfies the GK rank
  * contract against the exact sorted multiset — the same ε-rank bound
  * the batch `ApproxSpec` holds `approx_percentile` to; (3) the fold is
  * deterministic (same input, same layout → same snapshots). Exact
  * estimate equality ACROSS layouts is deliberately not claimed — GK
  * insertion is order-sensitive; that is the point of this monitor.
  */
class StreamingSketchQuantileSpec extends SparkSuite {

  // The batch face's input grain: l_extendedprice by l_linestatus
  // (`agg_approx_percentile`). event_id = the unique per-row key.
  private lazy val items: Seq[SketchQuantileMonitor.Obs] = {
    Tables.lineitem(spark, sfDir)
      .select(col("l_linestatus"), col("l_extendedprice").cast("double"),
        col("l_orderkey"), col("l_linenumber").cast("long"),
        col("l_partkey"), col("l_suppkey"))
      .collect()
      .sortBy(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .zipWithIndex
      .map { case (r, i) =>
        SketchQuantileMonitor.Obs(r.getString(0), i.toLong,
          new Timestamp(86400000L + i), r.getDouble(1))
      }.toSeq
  }

  private def runStream(
      batches: Seq[Seq[SketchQuantileMonitor.Obs]])
      : Seq[SketchQuantileMonitor.Snapshot] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SketchQuantileMonitor.Obs]
    val out = mutable.ArrayBuffer.empty[SketchQuantileMonitor.Snapshot]
    val q = SketchQuantileMonitor.monitor(mem.toDS(), "1 hour")
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[SketchQuantileMonitor.Snapshot], _: Long) =>
          out.synchronized { out ++= b.collect() }
          ()
      }
      .start()
    try batches.foreach { chunk =>
      mem.addData(chunk: _*)
      q.processAllAvailable()
    } finally q.stop()
    out.synchronized(out.toSeq)
  }

  private def split(n: Int): Seq[Seq[SketchQuantileMonitor.Obs]] = {
    val step = math.max(1, items.length / n)
    items.grouped(step).toSeq
  }

  private def finalSnaps(out: Seq[SketchQuantileMonitor.Snapshot])
      : Map[String, SketchQuantileMonitor.Snapshot] =
    out.groupBy(_.grp).map { case (g, ss) => g -> ss.maxBy(_.n) }

  test("GK rank contract holds at every batch layout, and n is exact") {
    val exact = items.groupBy(_.grp).map { case (g, os) =>
      g -> os.map(_.v).sorted
    }
    for (nSplits <- Seq(1, 3, 8)) {
      val fin = finalSnaps(runStream(split(nSplits)))
      assert(fin.keySet == exact.keySet, s"nSplits=$nSplits")
      for ((g, snap) <- fin) {
        val vs = exact(g)
        assert(snap.n == vs.length.toLong, s"$g nSplits=$nSplits")
        // rank of the returned value in the exact multiset must sit
        // within eps*n of the 0.5 target (the GK query contract)
        val lo = vs.count(_ < snap.p50_approx)
        val hi = vs.count(_ <= snap.p50_approx)
        val target = 0.5 * vs.length
        val eps = SketchQuantileMonitor.RelativeError * vs.length + 1
        assert(lo - eps <= target && target <= hi + eps,
          s"$g nSplits=$nSplits p50=${snap.p50_approx} rank=[$lo,$hi] " +
            s"target=$target eps=$eps")
      }
    }
  }

  test("re-delivered prefix under a fixed layout changes NOTHING (dedup leg)") {
    val base = split(4)
    val clean = runStream(base)
    // re-deliver the whole first batch again (at-least-once), then the rest
    val redelivered = base.head +: base.head +: base.tail
    val dup = runStream(redelivered)
    // final state per group bit-identical; the extra empty trigger may add
    // snapshots, so compare the last snapshot per group
    assert(finalSnaps(clean) == finalSnaps(dup))
    // and determinism: the same layout twice gives identical snapshots
    val again = runStream(base)
    assert(clean == again)
  }
}
