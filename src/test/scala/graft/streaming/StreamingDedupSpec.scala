package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import StreamingDedup.Doc

/** Streaming dedup: cross-batch collapse within the watermark window,
  * re-admission after it, and fingerprint-equal near-dup collapse.
  */
class StreamingDedupSpec extends SparkSuite {

  private val base = 1700000000000L
  private def d(id: Long, offsetS: Long, text: String) =
    Doc(id, new Timestamp(base + offsetS * 1000), text)

  private def run(mk: org.apache.spark.sql.Dataset[Doc] => org.apache.spark.sql.DataFrame)(
      feed: (MemoryStream[Doc], org.apache.spark.sql.streaming.StreamingQuery) => Unit): Seq[Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val name = s"dedup_out_${System.nanoTime()}"
    val q = mk(mem.toDS()).writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try feed(mem, q) finally q.stop()
    spark.table(name).select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
  }

  test("exact dedup collapses across batches in-window, re-admits after it") {
    val survivors = run(StreamingDedup.exact(_, "30 seconds")) { (mem, q) =>
      mem.addData(d(1, 0, "alpha beta"), d(2, 1, "alpha beta"), d(3, 2, "gamma"))
      q.processAllAvailable()
      mem.addData(d(4, 5, "alpha beta")) // later batch, still in-window
      q.processAllAvailable()
      // push the watermark far past 0s+30s, then replay the same text:
      // its key aged out, so the replay is a NEW document
      mem.addData(d(5, 500, "delta"))
      q.processAllAvailable()
      mem.addData(d(6, 501, "alpha beta"))
      q.processAllAvailable()
    }
    assert(survivors == Seq(1L, 3L, 5L, 6L), survivors)
  }

  test("fingerprint dedup collapses whitespace-variant near-duplicates") {
    val survivors = run(StreamingDedup.nearFingerprint(_, "30 seconds")) { (mem, q) =>
      // same token sequence, different whitespace → same SimHash → collapse;
      // different tokens → different fingerprint → survives
      mem.addData(d(1, 0, "the quick brown fox"), d(3, 2, "wholly different text"))
      q.processAllAvailable()
      mem.addData(d(2, 1, "the quick   brown\tfox"))
      q.processAllAvailable()
      mem.addData(d(9, 500, "advance the watermark"))
      q.processAllAvailable()
    }
    assert(survivors == Seq(1L, 3L, 9L), survivors)
  }
}
