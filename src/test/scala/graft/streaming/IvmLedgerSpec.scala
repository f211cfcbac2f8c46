package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSuite, Tables}

/** The streaming IVM changelog must (1) chain exactly — each emission's
  * `before` is its predecessor's `after`, starting from the empty ledger —
  * and (2) converge to the batch `cdc_ivm_agg` view's merged totals under
  * ANY micro-batch split: the changelog is just a factorization of the
  * same signed sum, so the final `after` cannot depend on how the stream
  * was chopped.
  */
class IvmLedgerSpec extends SparkSuite {

  private def changes(): Seq[IvmLedger.Change] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("user_id").as("pk"), col("event_id"),
        col("event_type").as("op"), col("value"))
      .as[IvmLedger.Change]
      .collect().toSeq
      .sortBy(c => (c.pk, c.event_id))
  }

  private def runStream(items: Seq[IvmLedger.Change], nSplits: Int)
      : Seq[(Long, IvmLedger.ChangelogRow)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[IvmLedger.Change]
    val out = mutable.ArrayBuffer.empty[(Long, IvmLedger.ChangelogRow)]
    val q = IvmLedger.changelog(mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[IvmLedger.ChangelogRow], id: Long) =>
        val rows = batch.collect()
        out.synchronized { out ++= rows.map(id -> _) }
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

  test("changelog chains from empty and converges to the batch view at any split") {
    val items = changes()
    // independent batch truth: the same signed fold over everything
    val want = items.groupBy(_.pk).map { case (pk, cs) =>
      pk -> IvmLedger.fold(IvmLedger.empty, cs)
    }
    for (nSplits <- Seq(1, 3, 7)) {
      val got = runStream(items, nSplits)
      val byKey = got.groupBy(_._2.pk)
      assert(byKey.keySet == want.keySet, s"key set at $nSplits splits")
      byKey.foreach { case (pk, emissions) =>
        val ordered = emissions.sortBy(_._1).map(_._2)
        // chain: before_0 = empty; before_k = after_{k-1} — EXACT in the
        // integer-cents ledger, no float tolerance anywhere
        assert(ordered.head.before_n == 0L && ordered.head.before_c == 0L,
          s"key $pk does not start from the empty ledger")
        ordered.sliding(2).foreach {
          case Seq(a, b) =>
            assert(b.before_n == a.after_n, s"key $pk net_n chain break")
            assert(b.before_c == a.after_c, s"key $pk net_c chain break")
          case _ => ()
        }
        // totals: all changes accounted once
        assert(ordered.map(_.batch_changes).sum == want(pk).n_changes, s"key $pk count")
        assert(ordered.last.total_changes == want(pk).n_changes, s"key $pk total")
        // convergence to the batch ledger
        assert(ordered.last.after_n == want(pk).net_n, s"key $pk final net_n")
        assert(ordered.last.after_c == want(pk).net_c, s"key $pk final net_c")
      }
      // emission volume bounded by touched keys x batches
      assert(got.size <= want.size * (nSplits + 1), s"emissions at $nSplits splits")
    }
  }

  test("final streamed ledger equals the batch cdc_ivm_agg merged view") {
    val items = changes()
    val got = runStream(items, 4)
      .groupBy(_._2.pk).map { case (pk, em) => pk -> em.maxBy(_._1)._2 }
    val batch = graft.ops.CdcQueries.queries("cdc_ivm_agg")(spark, sfDir).collect()
    assert(batch.length == got.size)
    batch.foreach { r =>
      val pk = r.getAs[Long]("pk")
      val s = got(pk)
      assert(r.getAs[Long]("net_n") == s.after_n, s"key $pk net_n")
      // both sides are integer cents, so the comparison is EXACT
      assert(r.getAs[Double]("net_v_r") == s.after_c / 100.0, s"key $pk net_v")
      assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_delta") == s.total_changes,
        s"key $pk change count")
    }
  }
}
