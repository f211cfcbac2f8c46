package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The streamed shard sketches, unioned, must reproduce the batch
  * `agg_hll_union` estimate EXACTLY — same Datasketches constructor, same
  * per-key update, same union — under any micro-batch split, shuffled
  * arrival order, and duplicate re-delivery of a whole prefix (insertion
  * idempotence: a register max cannot move twice for the same coupon).
  */
class StreamingHllSpec extends SparkSuite {

  // The batch face's exact input grain: non-null keys sharded by
  // l_orderkey % 16 (ops/RelationalQueries.scala `agg_hll_union`).
  private def obs(): Seq[HllMonitor.Obs] = {
    Tables.lineitem(spark, sfDir)
      .where(col("l_partkey").isNotNull)
      .select((col("l_orderkey") % 16).as("shard"), col("l_partkey").as("key"),
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"))
      .collect()
      .sortBy(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_linenumber")))
      .map(r => HllMonitor.Obs(r.getAs[Long]("shard"), r.getAs[Long]("key")))
      .toSeq
  }

  private def runStream(items: Seq[HllMonitor.Obs], nSplits: Int)
      : Seq[HllMonitor.ShardSketch] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[HllMonitor.Obs]
    val out = mutable.ArrayBuffer.empty[HllMonitor.ShardSketch]
    val q = HllMonitor.monitor(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[HllMonitor.ShardSketch], _: Long) =>
        out.synchronized { out ++= b.collect() }
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

  /** Union the LAST snapshot per shard through the very SQL functions the
    * batch face uses, so the equivalence covers Spark's union semantics
    * too, not just the per-shard build.
    */
  private def unionEstimate(snaps: Seq[HllMonitor.ShardSketch]): Long = {
    import spark.implicits._
    val last = snaps.groupBy(_.shard).values.map(_.maxBy(_.n_seen)).toSeq
    last.map(s => (s.shard, s.sketch)).toDF("shard", "sk")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx"))
      .head.getLong(0)
  }

  private lazy val batchApprox: Long =
    graft.ops.RelationalQueries.queries("agg_hll_union")(spark, sfDir)
      .head.getAs[Long]("approx_parts")

  test("streamed shard sketches union to the batch estimate under any split") {
    val items = obs()
    for (nSplits <- Seq(1, 3, 8)) {
      val got = runStream(items, nSplits)
      assert(unionEstimate(got) == batchApprox, s"nSplits=$nSplits")
      // per-shard snapshot estimates are monotone non-decreasing — a
      // sketch only absorbs coupons
      got.groupBy(_.shard).values.foreach { ss =>
        val ests = ss.sortBy(_.n_seen).map(s =>
          Math.round(org.apache.datasketches.hll.HllSketch.heapify(s.sketch)
            .getEstimate))
        assert(ests == ests.sorted, "snapshot estimate regressed")
      }
    }
  }

  test("shuffled arrival order and duplicate prefix re-delivery change nothing") {
    val items = obs()
    val rng = new scala.util.Random(7)
    val shuffled = rng.shuffle(items)
    // at-least-once: the first half arrives AGAIN after the full stream
    val withDupes = shuffled ++ shuffled.take(items.length / 2)
    val got = runStream(withDupes, 5)
    assert(unionEstimate(got) == batchApprox)
    // the re-delivered prefix moved n_seen but not the registers: the
    // final per-shard estimate equals the clean run's
    val clean = runStream(items, 1)
    val cleanEst = clean.groupBy(_.shard).view.mapValues(ss =>
      Math.round(org.apache.datasketches.hll.HllSketch
        .heapify(ss.maxBy(_.n_seen).sketch).getEstimate)).toMap
    val dupEst = got.groupBy(_.shard).view.mapValues(ss =>
      Math.round(org.apache.datasketches.hll.HllSketch
        .heapify(ss.maxBy(_.n_seen).sketch).getEstimate)).toMap
    assert(dupEst == cleanEst)
  }
}
