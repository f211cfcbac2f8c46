package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSuite

/** The streamed span-removal verdicts must reproduce the batch
  * `dedup_span_removal` ledger exactly: stage 1's park-then-flush turns
  * corpus-wide gram duplication (`nd ≥ 2`) into addition-only start
  * deltas, stage 2's fold is the batch interval merge verbatim — so the
  * LAST verdict per doc equals the batch row under any micro-batch split
  * and any arrival order (duplication is monotone; no retractions exist
  * to get wrong).
  */
class StreamingSpanSpec extends SparkSuite {

  /** The fixture grams — the SAME artifact grain the batch ledger reads.
    * The artifact nulls `ps` on unique grams (nd = 1, nothing reads
    * them); the stream face maps those to Nil — stage 1 never flushes a
    * gram that only ever sees one document, so the emptiness is inert
    * and duplication detection stays the monitor's own job.
    */
  private def grams(): Seq[SpanMonitor.PosObs] =
    graft.ops.GramIndex.posGrams(spark, sfDir)
      .select(col("doc_id"), col("gram"), col("ps"))
      .collect()
      .map(r => SpanMonitor.PosObs(r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) Nil else r.getSeq[Int](2)))
      .toSeq

  private def docs(): Seq[SpanMonitor.DocMeta] =
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        transform(split(col("text"), " "), t => length(t)).as("lens"))
      .collect()
      .map(r => SpanMonitor.DocMeta(r.getLong(0), r.getString(1),
        r.getSeq[Int](2)))
      .toSeq

  /** Drive both stages over one interleaved (docs + grams) arrival order. */
  private def runStream(ds: Seq[SpanMonitor.DocMeta],
      gs: Seq[SpanMonitor.PosObs], nSplits: Int): Map[Long, SpanMonitor.SpanVerdict] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val memDocs = MemoryStream[SpanMonitor.DocMeta]
    val memGrams = MemoryStream[SpanMonitor.PosObs]
    val events = SpanMonitor.docEvents(memDocs.toDS())
      .union(SpanMonitor.startEvents(SpanMonitor.duplicatedStarts(memGrams.toDS())))
    val out = mutable.ArrayBuffer.empty[SpanMonitor.SpanVerdict]
    val q = SpanMonitor.verdicts(events)
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[SpanMonitor.SpanVerdict], _: Long) =>
          out.synchronized { out ++= batch.collect() }
          ()
      }
      .start()
    try {
      val dStep = math.max(1, ds.length / nSplits)
      val gStep = math.max(1, gs.length / nSplits)
      val dChunks = ds.grouped(dStep).toSeq
      val gChunks = gs.grouped(gStep).toSeq
      (0 until math.max(dChunks.size, gChunks.size)).foreach { i =>
        dChunks.lift(i).foreach(c => memDocs.addData(c: _*))
        gChunks.lift(i).foreach(c => memGrams.addData(c: _*))
        q.processAllAvailable()
      }
      q.processAllAvailable()
    } finally q.stop()
    // update semantics: last emission per doc wins
    out.synchronized(out.toSeq).foldLeft(Map.empty[Long, SpanMonitor.SpanVerdict]) {
      (m, v) => m + (v.doc_id -> v)
    }
  }

  private def batchRows(): Map[Long, (Long, Long, Long, Long)] =
    graft.ops.DedupQueries.queries("dedup_span_removal")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("removed_chars"), r.getAs[Long]("n_kept_spans")))
      .toMap

  private def project(m: Map[Long, SpanMonitor.SpanVerdict])
      : Map[Long, (Long, Long, Long, Long)] =
    m.view.mapValues(v =>
      (v.n_toks, v.n_removed, v.removed_chars, v.n_kept_spans)).toMap

  test("streamed verdicts equal the batch ledger under any split") {
    val ds = docs().sortBy(_.doc_id)
    val gs = grams().sortBy(g => (g.doc_id, g.gram))
    val want = batchRows()
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 7)) {
      val got = project(runStream(ds, gs, nSplits))
      assert(got == want,
        s"nSplits=$nSplits: only-streamed=${(got.keySet -- want.keySet).take(5)} " +
          s"only-batch=${(want.keySet -- got.keySet).take(5)} " +
          s"diff=${got.collect { case (k, v) if want.get(k).exists(_ != v) =>
            (k, v, want(k)) }.take(3)}")
    }
  }

  test("reverse arrival (starts race their documents) converges identically") {
    // Grams stream in REVERSE doc order while documents stream forward:
    // stage 2 constantly buffers starts for documents that have not
    // arrived yet, and stage 1's park-then-flush fires from the younger
    // side of each gram pair. The converged table must not care.
    val ds = docs().sortBy(_.doc_id)
    val gs = grams().sortBy(g => (-g.doc_id, g.gram))
    assert(project(runStream(ds, gs, 5)) == batchRows())
  }

  test("duplication is monotone: start deltas are addition-only, no dup emissions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val memGrams = MemoryStream[SpanMonitor.PosObs]
    val out = mutable.ArrayBuffer.empty[SpanMonitor.StartDelta]
    val q = SpanMonitor.duplicatedStarts(memGrams.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[SpanMonitor.StartDelta], _: Long) =>
          out.synchronized { out ++= batch.collect() }
          ()
      }
      .start()
    try {
      grams().grouped(500).foreach { c => memGrams.addData(c: _*); q.processAllAvailable() }
    } finally q.stop()
    val emitted = out.synchronized(out.toSeq)
    // exactly the batch artifact's nd>=2 start mass, each start once
    val want = graft.ops.GramIndex.posGrams(spark, sfDir)
      .filter(col("nd") >= 2)
      .select(col("doc_id"), explode(col("ps")).as("start"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(emitted.size == want.size, s"${emitted.size} deltas vs ${want.size} expected")
    assert(emitted.map(d => (d.doc_id, d.start)).toSet == want)
  }
}
