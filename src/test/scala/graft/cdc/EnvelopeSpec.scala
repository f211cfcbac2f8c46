package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSuite

class EnvelopeSpec extends SparkSuite {

  test("insert envelope keeps explicit null before (json.Marshal semantics)") {
    import spark.implicits._
    val df = Seq(("users", Map("id" -> "42", "name" -> "alice"))).toDF("table", "after")
    val json = df.select(
      Envelope.toJsonColumn(
        Envelope.envelope(Envelope.nullBefore, col("after"), col("table"))).as("j"))
      .collect().head.getString(0)
    assert(json.contains(""""before":null"""))
    assert(json.contains(""""source":{"table":"users"}"""))
    assert(json.contains(""""id":"42""""))
  }

  test("update envelope carries both images") {
    import spark.implicits._
    val df = Seq(("users", Map("id" -> "1"), Map("id" -> "2"))).toDF("table", "before", "after")
    val json = df.select(
      Envelope.toJsonColumn(
        Envelope.envelope(col("before"), col("after"), col("table"))).as("j"))
      .collect().head.getString(0)
    assert(json == """{"before":{"id":"1"},"after":{"id":"2"},"source":{"table":"users"}}""")
  }

  test("envelope round-trips through from_json") {
    import spark.implicits._
    val df = Seq(("users", Map("id" -> "1"), Map("id" -> "2"))).toDF("table", "before", "after")
    val back = df.select(
      from_json(
        Envelope.toJsonColumn(
          Envelope.envelope(col("before"), col("after"), col("table"))),
        Envelope.schema).as("env"))
      .select(col("env.before"), col("env.after"), col("env.source.table"))
      .as[(Map[String, String], Map[String, String], String)]
      .collect().head
    assert(back == (Map("id" -> "1"), Map("id" -> "2"), "users"))
  }
}
