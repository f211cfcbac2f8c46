package graft.cdc

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Table-driven truth table for the type-normalization kernel
  * (reference `main.go:125-209`, SURVEY.md §1.2) including hazards H1
  * (speculative base64), H9 (bool else→false).
  */
class NormalizeSpec extends SparkSuite {
  import org.apache.spark.sql.types._

  private def evalText(in: String): String = {
    import spark.implicits._
    Seq(in).toDF("c").select(Normalize.normText(col("c")).as("out"))
      .collect().head.getString(0)
  }

  // --- H1: speculative strict base64 decode -------------------------------

  test("valid canonical base64 decodes (the reference decodes any valid b64)") {
    assert(evalText("aGVsbG8=") == "hello")
    assert(evalText("aGVsbG8gd29ybGQ=") == "hello world")
    assert(evalText("YWJjZA==") == "abcd")
  }

  test("ambiguity class: 4k-length alphabet strings DO decode (garbage in, garbage out)") {
    // "cafe" is valid canonical base64 → decodes to bytes 0x71 0xa7 0x9e.
    // The reference would emit those bytes; invalid UTF-8 → U+FFFD on
    // JSON-marshal, which our REPLACE decode reproduces.
    assert(evalText("cafe") != "cafe")
  }

  test("non-base64 strings pass through untouched") {
    assert(evalText("hello") == "hello") // length 5 % 4 != 0
    assert(evalText("Customer#001") == "Customer#001") // '#' outside alphabet
    assert(evalText("aGVsbG8") == "aGVsbG8") // missing padding → Go rejects
    assert(evalText("aGVs bG8=") == "aGVs bG8=") // inner space (Spark's unbase64 would strip it)
    assert(evalText("a===") == "a===") // bad padding shape
    assert(evalText("") == "")
  }

  // --- booleans (tinyint(1)): H9 else→false --------------------------------

  test("bool coercion: 1→true, 0→false, unknown→false (not null)") {
    import spark.implicits._
    val out = Seq(1, 0, 2, -1, 7).toDF("c")
      .select(Normalize.normBool(col("c")).as("b")).collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, false, false, false, false))
  }

  test("bool coercion of true/false strings") {
    import spark.implicits._
    val out = Seq("true", "false", "yes").toDF("c")
      .select(Normalize.normBool(col("c")).as("b")).collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, false, false))
  }

  // --- bit: first byte non-zero → true ------------------------------------

  test("bit coercion on binary") {
    import spark.implicits._
    val out = Seq(Array[Byte](1, 0), Array[Byte](0, 1), Array[Byte](0)).toDF("c")
      .select(Normalize.normBit(col("c")).as("b")).collect().map(_.getBoolean(0))
    // reference checks only the FIRST byte (`main.go:165-173`)
    assert(out.toSeq == Seq(true, false, false))
  }

  // --- date → RFC3339 midnight ---------------------------------------------

  test("date string reformats to RFC3339 with midnight time part") {
    import spark.implicits._
    val out = Seq("1997-10-31", "not-a-date").toDF("c")
      .select(Normalize.normDate(col("c")).as("d")).collect().map(_.getString(0))
    assert(out(0) == "1997-10-31T00:00:00Z")
    assert(out(1) == "not-a-date") // parse failure passes raw (`main.go:152-154`)
  }

  // --- numeric coercions ----------------------------------------------------

  test("int→long, float/decimal→double") {
    import spark.implicits._
    val row = Seq((42, java.math.BigDecimal.valueOf(1.25))).toDF("i", "d")
      .select(
        Normalize.normInt(col("i")).as("l"),
        Normalize.normFloat(col("d")).as("f"))
    val schema = row.schema
    assert(schema("l").dataType == LongType)
    assert(schema("f").dataType == DoubleType)
    val Row(l: Long, f: Double) = row.collect().head
    assert(l == 42L && f == 1.25)
  }

  // --- full dispatch precedence --------------------------------------------

  test("normalizeRow rewrites only columns with metadata (rowToMap analog)") {
    import Normalize.{ColumnMeta, MySqlType}
    import spark.implicits._
    val df = Seq((1, "aGVsbG8=", "2024-03-01", 2.5, "extra"))
      .toDF("flag", "note", "day", "amt", "untouched")
    val out = Normalize.normalizeRow(df, Seq(
      ColumnMeta("flag", MySqlType.Int, "tinyint(1)"),
      ColumnMeta("note", MySqlType.Text),
      ColumnMeta("day", MySqlType.Date),
      ColumnMeta("amt", MySqlType.Float)))
    val row = out.collect().head
    assert(out.schema("flag").dataType == BooleanType)
    assert(row.getBoolean(0) == true)
    assert(row.getString(1) == "hello") // speculative base64 (H1)
    assert(row.getString(2) == "2024-03-01T00:00:00Z")
    assert(row.getDouble(3) == 2.5)
    assert(row.getString(4) == "extra") // no metadata → passthrough
  }

  test("tinyint(1) wins over generic int (predicate precedence §2.4)") {
    import Normalize.{ColumnMeta, MySqlType}
    import spark.implicits._
    val df = Seq(1, 0, 5).toDF("c")
    val asBool = df.select(
      Normalize.normalize(col("c"), ColumnMeta("c", MySqlType.Int, "tinyint(1)")).as("v"))
    val asInt = df.select(
      Normalize.normalize(col("c"), ColumnMeta("c", MySqlType.Int, "int(11)")).as("v"))
    assert(asBool.schema("v").dataType == BooleanType)
    assert(asInt.schema("v").dataType == LongType)
    assert(asBool.collect().map(_.getBoolean(0)).toSeq == Seq(true, false, false))
  }
}
