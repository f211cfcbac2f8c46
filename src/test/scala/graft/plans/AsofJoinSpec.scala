package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** The native as-of join: known-answer merges, equivalence with the
  * windowed emulation on real data, and the plan shape the operator
  * promises (one exchange per side, no window, no union).
  */
class AsofJoinSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def leftDf: DataFrame =
    Seq(("a", 10L, 100), ("a", 20L, 101), ("b", 5L, 102), ("z", 1L, 103))
      .toDF("k", "t", "lid")

  private def rightDf: DataFrame =
    Seq(("a", 5L, 1.0), ("a", 15L, 2.0), ("b", 5L, 4.0), ("b", 7L, 3.0),
      ("0", 1L, 9.0), ("c", 1L, 8.0))
      .toDF("rk", "rt", "v")

  private def collectMatches(df: DataFrame): Map[Int, Option[Double]] =
    df.collect().map(r => r.getInt(2) -> (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap

  test("strict merge picks the last earlier row per key; no cross-key leaks") {
    val out = Asof.join(leftDf, rightDf,
      by = Seq("k"), on = Seq("t"), exclusive = true,
      rightBy = Seq("rk"), rightOn = Seq("rt"))
    assert(out.columns.toSeq == Seq("k", "t", "lid", "rk", "rt", "v"))
    assert(collectMatches(out) == Map(
      100 -> Some(1.0), // a@10 ← a@5
      101 -> Some(2.0), // a@20 ← a@15
      102 -> None,      // b@5: only b@5 (equal, excluded) and b@7 (later)
      103 -> None))     // z@1: right keys "0"/"c" must not leak across keys
  }

  test("inclusive merge admits equal-on rows") {
    val out = Asof.join(leftDf, rightDf,
      by = Seq("k"), on = Seq("t"), exclusive = false,
      rightBy = Seq("rk"), rightOn = Seq("rt"))
    assert(collectMatches(out)(102) == Some(4.0)) // b@5 ← b@5 inclusively
  }

  test("native operator reproduces the windowed emulation on events") {
    val composed = SparkEntry.queries("join_asof")(spark, sfDir).collect().toSeq
    val native = SparkEntry.queries("join_asof_native")(spark, sfDir).collect().toSeq
    assert(native.nonEmpty && native == composed)
  }

  test("plan: one exchange per side, a single merge, no window/union") {
    val df = SparkEntry.queries("join_asof_native")(spark, sfDir)
    df.collect() // finalize AQE so the executed plan is the real one
    val plan = df.queryExecution.executedPlan
    assert(collect(plan) { case e: AsofJoinExec => e }.size == 1)
    assert(collect(plan) { case w: WindowExec => w }.isEmpty)
    // two inputs → two shuffles into the merge; the final orderBy adds its
    // own range exchange, nothing else may
    val shuffles = collect(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 3, s"unexpected shuffles:\n$plan")
  }

  test("tolerance bounds the lookback; null-timed candidates never match") {
    def joined(tol: Option[Long]): Map[Int, Option[Double]] = collectMatches(
      Asof.join(leftDf, rightDf,
        by = Seq("k"), on = Seq("t"), exclusive = true,
        rightBy = Seq("rk"), rightOn = Seq("rt"), tolerance = tol))
    // a@20's closest earlier click is a@15 (Δ5): in at tol=5, out at tol=4
    // — and an out-of-tolerance closest means NO earlier row can match.
    assert(joined(Some(5L))(101) == Some(2.0))
    assert(joined(Some(4L))(101) == None)
    assert(joined(Some(0L))(100) == None) // a@10 ← a@5 is Δ5
    val nullTimed = Seq(("a", Option.empty[Long], 0.5)).toDF("rk", "rt", "v")
      .union(rightDf.select(col("rk"), col("rt").cast("long"), col("v")))
    val out = collectMatches(Asof.join(leftDf, nullTimed,
      by = Seq("k"), on = Seq("t"), exclusive = true,
      rightBy = Seq("rk"), rightOn = Seq("rt"), tolerance = Some(1000L)))
    assert(out(100) == Some(1.0)) // the null-timed row sorts first, is
    // superseded by a@5, and never wins under tolerance
    intercept[IllegalArgumentException] {
      Asof.join(leftDf, rightDf, by = Seq("k"), on = Seq("t"),
        rightBy = Seq("rk"), rightOn = Seq("rt"), tolerance = Some(-1L))
    }
  }

  test("streaming: micro-batch as-of enrichment against a static right side") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, Long, Int)]
    val collected = scala.collection.mutable.ArrayBuffer[(Int, Option[Double])]()
    val q = stream.toDF().toDF("k", "t", "lid").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val enriched = Asof.join(batch, rightDf,
          by = Seq("k"), on = Seq("t"), exclusive = true,
          rightBy = Seq("rk"), rightOn = Seq("rt"))
        collected.synchronized {
          collected ++= collectMatches(enriched).toSeq
        }
        ()
      }
      .start()
    try {
      stream.addData(("a", 12L, 200), ("b", 9L, 201))
      q.processAllAvailable()
      stream.addData(("a", 30L, 202))
      q.processAllAvailable()
    } finally q.stop()
    assert(collected.toMap == Map(
      200 -> Some(1.0), // a@12 ← a@5
      201 -> Some(3.0), // b@9  ← b@7
      202 -> Some(2.0))) // a@30 ← a@15 in the later batch
  }

  test("helper rejects shared attribute ids and unknown columns") {
    val shared = leftDf
    intercept[IllegalArgumentException] {
      Asof.join(shared, shared, by = Seq("k"), on = Seq("t"))
    }
    intercept[IllegalArgumentException] {
      Asof.join(leftDf, rightDf, by = Seq("nope"), on = Seq("t"),
        rightBy = Seq("rk"), rightOn = Seq("rt"))
    }
    intercept[IllegalArgumentException] { // un-keyed as-of: clear error
      Asof.join(leftDf, rightDf, by = Nil, on = Seq("t"),
        rightOn = Seq("rt"))
    }
  }

  test("column names resolve case-insensitively, like the rest of Spark") {
    val out = Asof.join(leftDf, rightDf,
      by = Seq("K"), on = Seq("T"), exclusive = true,
      rightBy = Seq("RK"), rightOn = Seq("RT"))
    assert(collectMatches(out)(100) == Some(1.0))
  }

  test("right columns come through nullable and typed") {
    val out = Asof.join(leftDf, rightDf,
      by = Seq("k"), on = Seq("t"), exclusive = true,
      rightBy = Seq("rk"), rightOn = Seq("rt"))
    val rightFields = out.schema.fields.drop(3)
    assert(rightFields.forall(_.nullable), out.schema.treeString)
  }
}
