package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The inline-map HOF beta-reduction rule: map HOFs over `map()` literals
  * fold to plain codegen'd expressions with identical results.
  *
  * All fixtures read the parquet-backed lineitem table — local literal data
  * constant-folds to a LocalRelation before user rules run, which would
  * bypass the rewrite entirely.
  */
class MapHofRewriteSpec extends SparkSuite {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(RewriteInlineMapHof)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  private def li: DataFrame = Tables.lineitem(spark, sfDir)

  private val mapHofNames = Seq("transform_values", "map_filter", "map_zip_with")

  private def measureCols: DataFrame = {
    val m = map(lit("q"), col("l_quantity"), lit("d"), col("l_discount"))
    val doubled = transform_values(m, (_, v) => v * 2)
    val big = map_filter(doubled, (_, v) => v > 10)
    val zipped = map_zip_with(m, doubled, (_, a, b) => b - a)
    li.select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
      round(element_at(doubled, "q"), 2).as("q2"),
      size(big).as("n_big"),
      round(element_at(zipped, "d"), 4).as("d_delta"))
  }

  test("the scalar_map_hof shape folds away every map HOF, results unchanged") {
    val key = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val plain = measureCols.orderBy(key.map(col): _*).collect()
    withRule {
      val df = measureCols
      val opt = df.queryExecution.optimizedPlan.toString
      mapHofNames.foreach(n => assert(!opt.contains(n), s"$n survived:\n$opt"))
      // the element_at chains collapse to bare arithmetic — no map remains
      assert(!opt.contains("element_at"), opt)
      val rewritten = df.orderBy(key.map(col): _*).collect()
      assert(rewritten.toSeq == plain.toSeq)
    }
  }

  test("map_filter drops null-predicate entries identically") {
    // nullif(q, q) is a deterministic NULL value → `v > 10` is NULL → the
    // entry must be dropped by both the HOF and the rewritten If(...).
    def counted: DataFrame = li.select(size(map_filter(
      map(lit("a"), expr("nullif(l_quantity, l_quantity)"),
          lit("b"), col("l_quantity")),
      (_, v) => v > 10)).as("n"))
    val plain = counted.groupBy("n").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rewritten = withRule {
      assert(!counted.queryExecution.optimizedPlan.toString.contains("map_filter"))
      counted.groupBy("n").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    assert(rewritten == plain)
    assert(plain.keySet == Set(0, 1)) // the null entry never counts
  }

  test("element_at on a missing literal key folds to null (non-ANSI)") {
    withRule {
      val df = li.select(
        element_at(map(lit("q"), col("l_quantity")), "nope").as("v")).limit(3)
      assert(!df.queryExecution.optimizedPlan.toString.contains("element_at"))
      assert(df.collect().forall(_.isNullAt(0)))
    }
  }

  test("guards: duplicate keys, non-literal keys, nondeterministic bodies stay put") {
    withRule {
      // duplicate literal keys — constructor policy must stay in charge
      val dup = li.select(transform_values(
        map(lit("k"), col("l_quantity"), lit("k"), col("l_discount")),
        (_, v) => v * 2).as("m")).limit(1)
      assert(dup.queryExecution.optimizedPlan.toString.contains("transform_values"))
      // non-literal key — entry set is not known at plan time
      val dyn = li.select(transform_values(
        map(col("l_returnflag"), col("l_quantity")),
        (_, v) => v * 2).as("m")).limit(1)
      assert(dyn.queryExecution.optimizedPlan.toString.contains("transform_values"))
      // nondeterministic body — evaluation-count contract must not change
      val nd = li.select(transform_values(
        map(lit("q"), col("l_quantity")),
        (_, v) => v + rand()).as("m")).limit(1)
      assert(nd.queryExecution.optimizedPlan.toString.contains("transform_values"))
      // nondeterministic VALUE — beta-reduction would re-draw it per
      // lambda-variable reference (v - v must stay 0)
      val ndv = li.select(transform_values(
        map(lit("q"), rand()),
        (_, v) => v - v).as("m")).limit(1)
      assert(ndv.queryExecution.optimizedPlan.toString.contains("transform_values"))
      // float/binary keys — boxed == diverges from runtime map-key equality
      val fk = li.select(transform_values(
        map(lit(0.0d), col("l_quantity")),
        (_, v) => v * 2).as("m")).limit(1)
      assert(fk.queryExecution.optimizedPlan.toString.contains("transform_values"))
    }
  }

  test("register() appends rules without clobbering pre-existing ones") {
    val marker: org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
      new org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = p
      }
    val exp = spark.experimental
    val (savedRules, savedStrategies) = (exp.extraOptimizations, exp.extraStrategies)
    try {
      exp.extraOptimizations = Seq(marker)
      GraftExtensions.register(spark)
      assert(exp.extraOptimizations.contains(marker))
      assert(GraftExtensions.rules.forall(exp.extraOptimizations.contains))
      GraftExtensions.register(spark) // idempotent — no duplicates
      assert(exp.extraOptimizations.count(_ eq marker) == 1)
      GraftExtensions.rules.foreach(r =>
        assert(exp.extraOptimizations.count(_ == r) == 1))
    } finally {
      exp.extraOptimizations = savedRules
      exp.extraStrategies = savedStrategies
    }
  }
}
