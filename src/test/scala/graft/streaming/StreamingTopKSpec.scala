package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}
import graft.functions.SpaceSaving

/** Batch/stream equivalence for the heavy-hitters state: folding the
  * SpaceSaving kernel across any micro-batch split must, in the exact
  * regime (k ≥ per-group vocabulary), land every group on exactly the
  * batch aggregate's summary; in the approximate regime the sketch bounds
  * must hold at the final trigger.
  */
class StreamingTopKSpec extends SparkSuite {

  private def runStream(
      items: Seq[StreamingTopK.Item], nSplits: Int, k: Int)
      : Map[String, Seq[StreamingTopK.Entry]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamingTopK.Item]
    val latest = new ConcurrentHashMap[String, Seq[StreamingTopK.Entry]]()
    val q = StreamingTopK.topK(mem.toDS(), k)
      .writeStream.outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingTopK.TopK], _: Long) =>
        batch.collect().foreach(t => latest.put(t.group, t.summary))
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
    import scala.jdk.CollectionConverters._
    latest.asScala.toMap
  }

  test("exact regime: streamed summaries equal batch counts under any split") {
    import spark.implicits._
    val items = Tables.documents(spark, sfDir)
      .select(col("lang").as("group"),
        explode(split(col("text"), " ")).as("term"))
      .as[StreamingTopK.Item]
      .collect().toSeq

    val expected = items.groupBy(_.group).map { case (g, rows) =>
      g -> rows.groupBy(_.term).map { case (t, hits) => (t, hits.size.toLong, 0L) }
        .toSeq.sortBy { case (t, c, _) => (-c, t) }
        .map { case (t, c, e) => StreamingTopK.Entry(t, c, e) }
    }

    for (nSplits <- Seq(1, 3, 7)) {
      val got = runStream(items, nSplits, k = 64)
      assert(got.keySet == expected.keySet)
      expected.foreach { case (g, want) =>
        assert(got(g) == want, s"group $g at $nSplits splits")
      }
    }
  }

  test("approximate regime: sketch bounds hold at the final trigger") {
    // Zipf-ish synthetic stream over 26 items, k = 6 — far under the
    // vocabulary, so eviction churns. True counts are known exactly.
    val alphabet = ('a' to 'z').map(_.toString)
    val items = for {
      (item, idx) <- alphabet.zipWithIndex
      n = 400 / (idx + 1)
      _ <- 0 until n
    } yield StreamingTopK.Item("g", item)
    val trueCounts = alphabet.zipWithIndex.map { case (it, idx) => it -> 400 / (idx + 1) }.toMap
    val n = items.size

    val got = runStream(items, nSplits = 5, k = 6)("g")
    assert(got.size == 6)
    got.foreach { e =>
      val t = trueCounts(e.item).toLong
      assert(t <= e.cnt, s"${e.item}: cnt ${e.cnt} must overestimate true $t")
      assert(e.cnt - e.err <= t, s"${e.item}: cnt-err must lower-bound true $t")
    }
    // every item with true count > N/k must be present
    val present = got.map(_.item).toSet
    trueCounts.collect { case (it, c) if c > n / 6 => it }
      .foreach(it => assert(present.contains(it), s"$it over N/k missing"))
  }

  test("kernel determinism: eviction picks min count, ties to largest item") {
    val buf: SpaceSaving.Buf = mutable.HashMap()
    Seq("b", "a", "c").foreach(SpaceSaving.insert(buf, _, 3))
    SpaceSaving.insert(buf, "a", 3) // a=2, b=1, c=1
    SpaceSaving.insert(buf, "d", 3) // evicts c (count tie 1, largest item)
    assert(SpaceSaving.sorted(buf) ==
      Seq(("a", 2L, 0L), ("d", 2L, 1L), ("b", 1L, 0L)))
  }
}
