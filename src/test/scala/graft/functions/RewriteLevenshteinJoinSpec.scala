package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The blocked edit-distance join rewrite: a naive
  * `crossJoin.filter(levenshtein <= k)` must plan as an EQUI-join on
  * length buckets (no cartesian / nested loop) with bit-identical results,
  * and the rule must stay its hand when the join already has an equi-key
  * or the bound straddles sides.
  */
class RewriteLevenshteinJoinSpec extends SparkSuite {

  private def withRule[A](f: => A): A = {
    val exp = spark.experimental
    val had = exp.extraOptimizations.contains(RewriteLevenshteinJoin)
    if (!had) exp.extraOptimizations =
      exp.extraOptimizations :+ RewriteLevenshteinJoin
    try f
    finally if (!had) exp.extraOptimizations =
      exp.extraOptimizations.filterNot(_ == RewriteLevenshteinJoin)
  }

  private def words(ws: String*): DataFrame = {
    import spark.implicits._
    ws.toDF("w")
  }

  private val left = Seq("scan", "span", "fast", "hash", "sort", "short",
    "a", "ab", "table", "tables", "window", null)
  private val right = Seq("scan", "fasts", "hush", "sorted", "tab",
    "windows", "x", null)

  private def naive: DataFrame =
    words(left: _*).as("a")
      .crossJoin(words(right: _*).withColumnRenamed("w", "w2").as("b"))
      .filter(levenshtein(col("w"), col("w2")) <= 2)
      .select(col("w"), col("w2"))

  test("naive lev-join rewrites to an equi-join, results bit-identical") {
    val want = naive.collect().map(r => (r.getString(0), r.getString(1)))
      .toSeq.sorted
    assert(want.nonEmpty)
    val (got, plan) = withRule {
      val df = naive
      val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
        .toSeq.sorted
      (rows, df.queryExecution.executedPlan.toString)
    }
    assert(got == want, s"rule changed results: got=$got want=$want")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("strict < bound rewrites too (lev < 3 ≡ lev <= 2)") {
    // A Dataset caches its QueryExecution, so the no-rule baseline and the
    // with-rule run must each build a FRESH frame.
    def df = words(left.filter(_ != null): _*).as("a")
      .crossJoin(words(right.filter(_ != null): _*)
        .withColumnRenamed("w", "w2").as("b"))
      .filter(levenshtein(col("w"), col("w2")) < 3)
    val want = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val (got, plan) = withRule {
      val fresh = df
      (fresh.collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted,
        fresh.queryExecution.executedPlan.toString)
    }
    assert(got == want)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("does not fire when the join already has a cross-side equi-key") {
    import spark.implicits._
    val a = Seq(("k1", "scan"), ("k2", "fast")).toDF("k", "w")
    val b = Seq(("k1", "span"), ("k2", "hash")).toDF("k2", "w2")
    withRule {
      val df = a.join(b, col("k") === col("k2") &&
        levenshtein(col("w"), col("w2")) <= 2)
      // The equi-key means the planner never goes cartesian; the rewrite
      // must leave the plan alone (no __lev_bucket explode).
      assert(!df.queryExecution.optimizedPlan.toString.contains("__lev_bucket"))
      // Both keys survive: lev(scan, span) = 1, lev(fast, hash) = 2.
      assert(df.collect().map(_.getString(1)).sorted.toSeq == Seq("fast", "scan"))
    }
  }

  test("extra conjuncts survive the rewrite") {
    withRule {
      val df = words(left.filter(_ != null): _*).as("a")
        .crossJoin(words(right.filter(_ != null): _*)
          .withColumnRenamed("w", "w2").as("b"))
        .filter(levenshtein(col("w"), col("w2")) <= 2 &&
          col("w") < col("w2") && length(col("w")) >= 4)
      val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      // Recompute on the driver.
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for {
        x <- left.filter(_ != null); y <- right.filter(_ != null)
        if lev(x, y) <= 2 && x < y && x.length >= 4
      } yield (x, y)).sorted
      assert(got == want, s"got=$got want=$want")
    }
  }
}
