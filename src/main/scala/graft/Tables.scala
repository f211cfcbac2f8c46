package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md).
  * One parquet file per table under `$dir/$name.parquet`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session configs every graft session needs. `nanosAsLong` because the
    * events table carries TIMESTAMP(NANOS) parquet, which Spark has no native
    * type for — `events` below converts it back to a µs timestamp.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // naive (isAdjustedToUTC=false) parquet timestamps read as TimestampType
    // (LTZ) under the UTC session, not TIMESTAMP_NTZ — keeps `unix_micros`
    // et al. applicable and matches DuckDB's naive read wall-clock for the
    // oracle compare, regardless of which annotation the generator emits
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.ansi.enabled" -> "false",
    "spark.sql.adaptive.enabled" -> "true")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet; with `nanosAsLong` Spark
    * reads it as Long ns — convert to a µs TimestampType (truncation; event
    * gaps are ~minutes so no orderings change; oracle queries never emit raw
    * ts per SURVEY §7.3).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      // integer division (`div`) — `/` is double division and epoch-ns
      // exceeds 2^53, which silently rounds the microsecond digit
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
