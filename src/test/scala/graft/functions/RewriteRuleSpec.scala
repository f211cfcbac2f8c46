package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The HOF→VectorDot optimizer rule: the idiomatic aggregate(zip_with(...))
  * formulation compiles to the codegen'd kernel automatically, with
  * bit-identical results.
  */
class RewriteRuleSpec extends SparkSuite {

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y),
    lit(0.0), (acc, v) => acc + v)

  test("rewritten local evaluation produces the HOF's values") {
    import spark.implicits._
    // local literal data constant-folds to a LocalRelation before user rules
    // run, so the plan shows no vector_dot here — value equality is the check
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try {
      val df = Seq(
        (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
        (Array(0.5, 0.0, -1.0), Array(2.0, 9.0, 3.0)))
        .toDF("a", "b")
        .select(hofDot.as("d"))
      assert(df.collect().map(_.getDouble(0)).toSeq == Seq(32.0, -2.0))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("null semantics survive the rewrite: length mismatch and null elements") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0)), // length mismatch
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)), // null elem
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0))) // clean
      .toDF("a", "b")
    val hof = df.select(hofDot.as("d")).collect().map(r => Option(r.get(0)))
    val kernel = df.select(VectorOps.dot(col("a"), col("b")).as("d"))
      .collect().map(r => Option(r.get(0)))
    assert(hof.toSeq == kernel.toSeq, s"hof=${hof.toSeq} kernel=${kernel.toSeq}")
    assert(kernel.toSeq == Seq(None, None, Some(11.0)))
  }

  // the double-widened formulation every oracle query uses
  private def hofDotD = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  test("rewrite fires on the real float-embedding table with identical results") {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("a"), col("embedding").as("b"))
    val plain = base.select(col("vec_id"), hofDotD.as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try {
      val df = base.select(col("vec_id"), hofDotD.as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("vector_dot"))
      val rewritten = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rewritten == plain) // bit-identical, not approximately equal
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("float-precision multiply (no casts) is NOT rewritten — numerics preserved") {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("embedding").as("a"), col("embedding").as("b")).limit(5)
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try {
      // bare x*y over float arrays multiplies in FLOAT; the kernel widens —
      // rewriting would silently change results, so the rule must skip it
      val df = base.select(hofDot.as("d"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("vector_dot"))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule leaves non-matching aggregates alone") {
    import spark.implicits._
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try {
      // sum of absolute differences — same shape, different lambda
      val df = Seq((Array(1.0, 2.0), Array(3.0, 1.0))).toDF("a", "b")
        .select(aggregate(
          zip_with(col("a"), col("b"), (x, y) => abs(x - y)),
          lit(0.0), (acc, v) => acc + v).as("d"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("vector_dot"))
      assert(df.collect().head.getDouble(0) == 3.0)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
