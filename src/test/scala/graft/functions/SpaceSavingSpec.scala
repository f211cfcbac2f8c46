package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.SpaceSavingTopK.space_saving_topk

/** The SpaceSaving guarantees, in both regimes:
  *   - EXACT (k ≥ distinct): summary equals plain GROUP BY counts, err=0 —
  *     the configuration the text_heavy_hitters oracle relies on;
  *   - APPROXIMATE (k < distinct): every count overestimates by at most
  *     `err` (true ∈ [cnt−err, cnt]) and every item with true count > N/k
  *     appears in the summary — across real distributed partials (the
  *     corpus is read with the suite's parallelism, so partial buffers
  *     merge through the serialize/merge path).
  */
class SpaceSavingSpec extends SparkSuite {

  private def terms = Tables.documents(spark, sfDir)
    .select(explode(split(col("text"), " ")).as("term"))

  private def summary(k: Int): Seq[(String, Long, Long)] =
    terms.agg(space_saving_topk(col("term"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  private def exact: Map[String, Long] =
    terms.groupBy("term").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("exact regime (k >= distinct): summary IS the group-by count table") {
    val truth = exact
    val got = summary(64)
    assert(got.size == truth.size)
    got.foreach { case (item, cnt, err) =>
      assert(err == 0L, s"$item err=$err in the exact regime")
      assert(truth(item) == cnt, s"$item: $cnt != ${truth(item)}")
    }
    // reporting order: count desc, item asc
    assert(got == got.sortBy { case (i, c, _) => (-c, i) })
  }

  test("approximate regime (k < distinct): error bound and N/k guarantee hold") {
    val truth = exact
    val n = truth.values.sum
    val k = 8
    val got = summary(k)
    assert(got.size <= k)
    val inSummary = got.map(_._1).toSet
    got.foreach { case (item, cnt, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(t <= cnt, s"$item: sketch must overestimate ($cnt < true $t)")
      assert(t >= cnt - err, s"$item: true $t below cnt-err ${cnt - err}")
    }
    truth.foreach { case (item, t) =>
      if (t > n / k)
        assert(inSummary.contains(item), s"heavy hitter $item (true $t > N/k ${n / k}) missing")
    }
  }

  test("streaming: windowed heavy hitters over a MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)]
    def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    mem.addData((t(0), "a"), (t(1), "a"), (t(2), "b"),
      (t(70), "c"), (t(71), "c"), (t(72), "c"))
    val q = mem.toDF().toDF("ts", "term")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(space_saving_topk(col("term"), 4).as("hh"))
      .select(col("window.start").as("w"), col("hh"))
      .writeStream.format("memory").queryName("ss_stream")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val byWindow = spark.table("ss_stream").collect()
      .sortBy(_.getTimestamp(0).getTime)
      .map(_.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getString(0), e.getLong(1))))
      .toSeq
    assert(byWindow == Seq(Seq(("a", 2L), ("b", 1L)), Seq(("c", 3L))), byWindow.toString)
  }

  test("SQL surface: space_saving_topk resolves after registration") {
    GraftExtensions.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_ss")
    val rows = spark.sql(
      """SELECT e.item, e.cnt FROM (
        |  SELECT explode(space_saving_topk(term, 64)) AS e FROM (
        |    SELECT explode(split(text, ' ')) AS term FROM docs_ss))
        |ORDER BY e.cnt DESC, e.item LIMIT 3""".stripMargin).collect()
    val truth = exact.toSeq.sortBy { case (i, c) => (-c, i) }.take(3)
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == truth)
  }
}
