package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSuite

/** The streamed min-label component verdicts must converge to the batch
  * `graph_components` table exactly: labels are MONOTONE decreasing under
  * edge arrivals (merges only, never splits — no retractions exist), the
  * hint stream is the batch delta round's changed-label frontier fed back
  * through the loop leg, and convergence (a drain that produces no new
  * hints) is the batch fixpoint. Pinned under several micro-batch splits,
  * arrival orders (sorted, reversed, hint-re-injection deferred to the
  * very end), and deliberate duplicate re-delivery of both edges and
  * hints.
  */
class StreamingComponentsSpec extends SparkSuite {

  /** The batch graph's co-purchase edges (u < v), rebuilt driver-side the
    * same way GraphSpec's yardsticks do — the fixture is test-sized; the
    * MONITOR never sees a collected edge list, only the arrival stream.
    */
  private def fixtureEdges(): Seq[ComponentsMonitor.EdgeArrival] = {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet.toSeq.sorted
      .map { case (u, v) => ComponentsMonitor.EdgeArrival(u, v) }
  }

  private lazy val batchLabels: Map[Long, Long] =
    graft.SparkEntry.queries("graph_components")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  /** Drive the monitor: feed edge chunks, then re-inject drained hints
    * until a drain produces none. `eagerHints` re-injects between edge
    * chunks (the steady-state topology); otherwise hints wait until all
    * edges have arrived (maximum staleness). `dupFactor` > 1 re-delivers
    * every edge chunk and every hint batch that many times.
    */
  private def runStream(es: Seq[ComponentsMonitor.EdgeArrival],
      nSplits: Int, eagerHints: Boolean, dupFactor: Int): Map[Long, Long] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val memE = MemoryStream[ComponentsMonitor.EdgeArrival]
    val memH = MemoryStream[ComponentsMonitor.NodeEvent]
    val out = mutable.ArrayBuffer.empty[ComponentsMonitor.Emit]
    val q = ComponentsMonitor.step(
        ComponentsMonitor.edgeEvents(memE.toDS()).union(memH.toDS()))
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(20))
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[ComponentsMonitor.Emit], _: Long) =>
          out.synchronized { out ++= batch.collect() }
          ()
      }
      .start()
    var cursor = 0
    def drainHints(): Seq[ComponentsMonitor.NodeEvent] = out.synchronized {
      val fresh = out.drop(cursor).filterNot(_.isVerdict)
      cursor = out.size
      fresh.map(h => ComponentsMonitor.NodeEvent(h.node, 0L, h.label,
        isEdge = false)).toSeq
    }
    def injectUntilQuiet(): Unit = {
      var hints = drainHints()
      while (hints.nonEmpty) {
        (1 to dupFactor).foreach(_ => memH.addData(hints: _*))
        q.processAllAvailable()
        hints = drainHints()
      }
    }
    try {
      val step = math.max(1, es.length / nSplits)
      es.grouped(step).foreach { chunk =>
        (1 to dupFactor).foreach(_ => memE.addData(chunk: _*))
        q.processAllAvailable()
        if (eagerHints) injectUntilQuiet()
      }
      injectUntilQuiet()
    } finally q.stop()
    out.synchronized(out.toSeq).filter(_.isVerdict)
      .foldLeft(Map.empty[Long, Long]) { (m, v) => m + (v.node -> v.label) }
  }

  private def check(got: Map[Long, Long]): Unit = {
    assert(got.keySet == batchLabels.keySet,
      s"universe mismatch: missing=${(batchLabels.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- batchLabels.keySet).take(5)}")
    val diff = got.collect {
      case (u, c) if batchLabels(u) != c => (u, c, batchLabels(u))
    }
    assert(diff.isEmpty, s"${diff.size} nodes diverge, e.g. ${diff.take(5)}")
  }

  test("converged verdicts equal graph_components (eager hint loop, 4 splits)") {
    check(runStream(fixtureEdges(), nSplits = 4, eagerHints = true, dupFactor = 1))
  }

  test("hint re-injection deferred to the end still converges (1 split)") {
    check(runStream(fixtureEdges(), nSplits = 1, eagerHints = false, dupFactor = 1))
  }

  test("reversed arrival order, 7 splits") {
    check(runStream(fixtureEdges().reverse, nSplits = 7, eagerHints = true,
      dupFactor = 1))
  }

  test("duplicate re-delivery of every edge chunk and hint batch is a no-op") {
    check(runStream(fixtureEdges(), nSplits = 3, eagerHints = true, dupFactor = 2))
  }
}
