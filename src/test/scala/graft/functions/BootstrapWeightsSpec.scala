package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import BootstrapWeights.bootstrap_weights

/** The codegen'd Poisson-bootstrap weight expression must be bit-identical
  * to the portable hex device the DuckDB oracle still evaluates:
  * md5("boot:<id>:0") || md5("boot:<id>:1"), replicate b = hex chars
  * (2b−1, 2b) through the 94/94/47/16/5 inverse-CDF table.
  */
class BootstrapWeightsSpec extends SparkSuite {

  test("weights equal the md5-hex/conv compositional form") {
    import spark.implicits._
    val ids = (1 to 500).map(_.toString).toDF("id")
      .withColumn("h", concat(
        md5(concat_ws(":", lit("boot"), col("id"), lit("0"))),
        md5(concat_ws(":", lit("boot"), col("id"), lit("1")))))
    def w(b: Int) = {
      val u = conv(substring(col("h"), 2 * b - 1, 2), 16, 10).cast("int")
      when(u < 94, 0L).when(u < 188, 1L)
        .when(u < 235, 2L).when(u < 251, 3L).otherwise(4L)
    }
    val both = ids.select(col("id"),
      array((1 to 32).map(w): _*).as("ref"),
      bootstrap_weights(col("id")).as("got"))
    assert(both.where(col("ref") =!= col("got")).count() == 0L)
  }

  test("weight distribution matches the quantized Poisson(1) table") {
    import spark.implicits._
    val n = 2000
    val flat = (1 to n).map(_.toString).toDF("id")
      .select(explode(bootstrap_weights(col("id"))).as("w"))
    val counts = flat.groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = (32 * n).toDouble
    // expected mass per the 256-entry table: 94/94/47/16/5
    assert(math.abs(counts(0L) / total - 94.0 / 256) < 0.01)
    assert(math.abs(counts(1L) / total - 94.0 / 256) < 0.01)
    assert(math.abs(counts(2L) / total - 47.0 / 256) < 0.01)
    // mean ≈ 1.004 — the resample preserves expected sample size
    val mean = counts.map { case (w, c) => w * c }.sum / total
    assert(math.abs(mean - 1.004) < 0.02)
  }

  test("null id yields null weights; SQL surface is registered") {
    import spark.implicits._
    val df = Seq(Some("7"), None).toDF("id")
      .select(bootstrap_weights(col("id")).as("ws"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT bootstrap_weights('7') AS ws").collect().head
    assert(viaSql.getSeq[Long](0).length == 32)
  }
}
