package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSuite

/** The streamed novelty deltas must reproduce the batch
  * `text_ngram_novelty` rows exactly: ownership retract/assert pairs
  * cancel stolen first-exposure credit, so summing deltas per doc equals
  * the batch owner-min aggregation over the same (doc, gram, c) grain —
  * under any micro-batch split AND under out-of-doc-order arrival (the
  * backfill case, where a late older doc steals ownership).
  */
class StreamingNoveltySpec extends SparkSuite {

  /** The fixture grams — the SAME artifact grain the batch query reads. */
  private def grams(): Seq[NoveltyMonitor.GramObs] =
    graft.ops.GramIndex.posGrams(spark, sfDir)
      .select(col("doc_id"), col("gram"), col("c"))
      .collect()
      .map(r => NoveltyMonitor.GramObs(r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq

  private def runStream(items: Seq[NoveltyMonitor.GramObs], nSplits: Int)
      : Seq[NoveltyMonitor.Delta] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[NoveltyMonitor.GramObs]
    val out = mutable.ArrayBuffer.empty[NoveltyMonitor.Delta]
    val q = NoveltyMonitor.deltas(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[NoveltyMonitor.Delta], _: Long) =>
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

  private def batchRows(): Map[Long, (Long, Long, Long, Long)] =
    graft.ops.TextQueries.queries("text_ngram_novelty")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel_pos"),
          r.getAs[Long]("n_novel_grams"), r.getAs[Long]("novelty_ppm")))
      .toMap

  private def fold(ds: Seq[NoveltyMonitor.Delta]): Map[Long, (Long, Long, Long, Long)] =
    ds.groupBy(_.doc_id).view.mapValues { d =>
      val ng = d.map(_.d_pos).sum
      val np = d.map(_.d_novel_pos).sum
      val nn = d.map(_.d_novel_grams).sum
      (ng, np, nn, 1000000L * np / ng)
    }.toMap

  test("streamed novelty equals the batch text_ngram_novelty under any split") {
    val items = grams().sortBy(g => (g.doc_id, g.gram)) // arrival = doc order
    val want = batchRows()
    assert(want.nonEmpty)
    for (nSplits <- Seq(1, 5, 11)) {
      val got = fold(runStream(items, nSplits))
      assert(got == want,
        s"nSplits=$nSplits: only-streamed=${(got.keySet -- want.keySet).take(5)} " +
          s"only-batch=${(want.keySet -- got.keySet).take(5)} " +
          s"diff=${got.collect { case (k, v) if want.get(k).exists(_ != v) =>
            (k, v, want(k)) }.take(3)}")
    }
  }

  test("out-of-order arrival converges to the same table (ownership steal)") {
    // Reverse doc order: every gram's ownership is claimed by the YOUNGEST
    // doc first and then stolen by each older arrival — the retraction
    // path runs constantly instead of never. The converged sums must still
    // equal the batch table.
    val items = grams().sortBy(g => (-g.doc_id, g.gram))
    val got = fold(runStream(items, 7))
    assert(got == batchRows())
  }

  test("ownership conservation: one live owner row per gram at any time") {
    val items = grams()
    val ds = runStream(items, 4)
    // Σ d_novel_grams over all emissions = number of distinct grams
    val nGrams = items.map(_.gram).distinct.size.toLong
    assert(ds.map(_.d_novel_grams).sum == nGrams)
    // presence mass equals the input position mass exactly once
    assert(ds.map(_.d_pos).sum == items.map(_.c).sum)
  }
}
