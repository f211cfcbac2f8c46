package graft

import org.apache.spark.sql.functions._

/** The end-to-end curation chain: monotone attrition, agreement with the
  * stand-alone operators it composes, and run-to-run determinism.
  */
class CurationPipelineSpec extends SparkSuite {

  private def collectLedger() =
    CurationPipeline.ledger(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("stage_no"), r.getAs[String]("stage"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_toks")))

  test("attrition is monotone and starts from the full corpus") {
    val led = collectLedger()
    assert(led.map(_._2).toSeq == Seq("ingest", "quality", "exact_dedup",
      "near_dedup", "span_dedup", "decontaminate", "resample", "split_train",
      "pack_256"))
    assert(led.head._3 == Tables.documents(spark, sfDir).count())
    // doc stages only — the pack row counts sequences, not docs
    val docStages = led.init
    docStages.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"stage ${b._2} grew: ${a._3} -> ${b._3}")
      assert(b._4 <= a._4, s"stage ${b._2} token mass grew")
    }
    // every stage keeps SOMETHING at spec SF, or the chain is vacuous
    docStages.foreach { st => assert(st._3 > 0, s"stage ${st._2} kept 0") }
    // the pack row is the split stage's token budget arithmetic
    val split = docStages.last
    assert(led.last._3 == split._4 / 256 && led.last._4 == split._4)
  }

  test("the quality stage equals pipeline_filter_funnel's final survivor count") {
    val led = collectLedger()
    val funnelK4 = SparkEntry.queries("pipeline_filter_funnel")(spark, sfDir)
      .filter(col("stage_no") === 4).collect().head.getAs[Long]("n_kept")
    assert(led.find(_._2 == "quality").get._3 == funnelK4)
  }

  test("the ledger is deterministic across runs (rebuilt, not cache-replayed)") {
    val first = collectLedger().toSeq
    // drop the session stage cache so the second run re-materializes the
    // whole chain — comparing a cache against itself would be vacuous
    CurationPipeline.clearStages(spark)
    assert(first == collectLedger().toSeq)
  }
}
