package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSuite, Tables}

/** Source/sink format coverage beyond parquet: JSON-lines and CSV round
  * trips with explicit schemas (the interchange formats a CDC/analytics
  * engine meets at its edges).
  */
class FormatsSpec extends SparkSuite {

  test("envelope JSONL round trip: write json, read with explicit schema") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/env"
    val env = SparkEntryRef.cdcEnvelope()
    env.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("envelope", StringType)))
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == env.count())
    // payloads survive byte-for-byte (JSON-in-JSON string escaping included)
    val a = env.orderBy("event_id").collect().map(_.getString(1))
    val b = back.orderBy("event_id").collect().map(_.getString(1))
    assert(a.toSeq == b.toSeq)
  }

  test("CSV round trip with header and explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/li"
    val cols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    val src = Tables.lineitem(spark, sfDir).select(cols.map(col): _*)
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema("l_orderkey LONG, l_linenumber INT, l_partkey LONG, l_suppkey LONG, l_quantity DOUBLE")
      .csv(dir)
    assert(back.count() == src.count())
    val key = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    assert(back.orderBy(key.map(col): _*).collect().toSeq ==
      src.orderBy(key.map(col): _*).collect().toSeq)
  }

  private object SparkEntryRef {
    def cdcEnvelope() = graft.SparkEntry.queries("cdc_envelope")(spark, sfDir)
  }
}
