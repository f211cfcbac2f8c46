package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The bucketed two-pass percentile selection must be BIT-IDENTICAL to
  * Spark's exact `percentile(v, p)` — it replaces the value→count-map
  * aggregate in oracle-checked queries, so "close" is not enough. Edge
  * surface: boundary percentiles (0, 1), single-row and two-row groups,
  * duplicate-heavy columns (bucket-boundary ties), negative values, and a
  * degenerate all-equal group (lo == hi bucket grid).
  */
class PercentileSelectionSpec extends SparkSuite {

  private def check(rows: Seq[(String, Double)], ps: Seq[Double]): Unit = {
    import spark.implicits._
    val df = rows.toDF("g", "v").repartition(4) // multi-partition on purpose
    for (p <- ps) {
      val got = VectorQueries.exactPercentileByGroup(df, p)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val want = df.groupBy("g").agg(expr(s"percentile(v, $p)").as("e"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got == want, s"p=$p got=$got want=$want")
    }
  }

  private val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  test("matches percentile() bit-for-bit on mixed group sizes and values") {
    val rng = new scala.util.Random(7)
    val rows =
      (1 to 1001).map(_ => ("big_odd", rng.nextDouble() * 1e5 - 5e4)) ++
        (1 to 1000).map(_ => ("big_even", rng.nextDouble() * 1e5)) ++
        Seq(("one", 42.5)) ++
        Seq(("two", 1.0), ("two", 2.0)) ++
        (1 to 97).map(i => ("dups", (i % 5).toDouble)) ++
        (1 to 50).map(_ => ("equal", 3.25))
    check(rows, ps)
  }

  test("one multi-p call serves every p from the shared histogram, still bit-identical") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows =
      (1 to 777).map(_ => ("a", rng.nextDouble() * 1e4 - 5e3)) ++
        (1 to 400).map(i => ("b", (i % 7).toDouble)) ++
        Seq(("c", -1.5)) ++
        (1 to 30).map(_ => ("d", 9.75))
    val df = rows.toDF("g", "v").repartition(4)
    val got = VectorQueries.exactPercentilesByGroup(df, ps)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    for (p <- ps) {
      val want = df.groupBy("g").agg(expr(s"percentile(v, $p)").as("e"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      want.foreach { case (g, w) =>
        assert(got((g, p)) == w, s"($g, $p): got=${got((g, p))} want=$w")
      }
    }
    assert(got.size == ps.size * 4) // every (group, p) produced exactly once
  }

  test("matches percentile() on the lineitem price column at sf0.001") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_linestatus").as("g"), col("l_extendedprice").cast("double").as("v"))
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val got = VectorQueries.exactPercentileByGroup(li, p)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val want = li.groupBy("g").agg(expr(s"percentile(v, $p)").as("e"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got == want, s"p=$p got=$got want=$want")
    }
  }
}
