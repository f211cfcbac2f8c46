package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.StrictBase64

/** The per-column scalar type-normalization kernel of the reference
  * (reference `main.go:125-209`, SURVEY.md §1.2), re-expressed as pure
  * Spark column expressions so it stays inside whole-stage codegen.
  *
  * Precedence mirrors the reference's if/else chain (`main.go:136-197`):
  * text → date → datetime → boolean → bit → float → int → passthrough.
  * Note boolean (`tinyint(1)`) is checked before int — both match the
  * MySQL "number" class, and tinyint(1) must win (SURVEY.md §2.4).
  */
object Normalize {

  /** MySQL column-type classes, mirroring go-mysql's `schema.TableColumn.Type`
    * tags consulted by the reference's predicates (`main.go:211-247`).
    */
  sealed trait MySqlType
  object MySqlType {
    case object Text extends MySqlType // char/varchar/text/blob classes
    case object Date extends MySqlType
    case object DateTime extends MySqlType // datetime + timestamp
    case object Int extends MySqlType // number / medium int
    case object Float extends MySqlType // float + decimal (collapses to double!)
    case object Bit extends MySqlType
    case object Other extends MySqlType // enum/set/json/geometry → passthrough
  }

  /** Column metadata as the reference sees it: a type tag plus the raw MySQL
    * type string (only consulted to detect `tinyint(1)` → boolean,
    * `main.go:241-243`).
    */
  final case class ColumnMeta(name: String, tpe: MySqlType, rawType: String = "") {
    def isBoolean: Boolean = tpe == MySqlType.Int && rawType == "tinyint(1)"
  }

  /** Text: speculative strict base64 decode, else passthrough
    * (`main.go:136-146`, hazard H1). Faithful mode.
    */
  def normText(c: Column): Column = StrictBase64.strict_base64_decode(c)

  /** Fixed mode for H1: no speculative decode — text passes through. */
  def normTextFixed(c: Column): Column = c

  /** Date: `YYYY-MM-DD` reparsed and reformatted RFC3339 with a midnight
    * time part (`main.go:147-154`); parse failure passes the raw value.
    */
  def normDate(c: Column): Column = {
    val parsed = to_timestamp(c.cast(StringType), "yyyy-MM-dd")
    when(parsed.isNotNull, date_format(parsed, "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .otherwise(c.cast(StringType))
  }

  /** Date normalization for columns already typed date/timestamp (the
    * testdata path — parquet gives us real timestamps, not strings).
    */
  def normDateTyped(c: Column): Column =
    date_format(date_trunc("DAY", c), "yyyy-MM-dd'T'HH:mm:ssXXX")

  /** Datetime/timestamp: passthrough unchanged (`main.go:155-156`). */
  def normDateTime(c: Column): Column = c

  /** tinyint(1) boolean: 1/true → true, 0/false → false, anything else →
    * false — not null (`main.go:157-164`, hazard H9).
    */
  def normBool(c: Column): Column =
    when(c.cast(StringType) === "1" || c.cast(StringType) === "true", lit(true))
      .otherwise(lit(false))

  /** BIT columns: first byte non-zero → true (`main.go:165-181`). */
  def normBit(c: Column): Column = {
    val bin = c.cast(BinaryType)
    when(c.isNull, lit(null).cast(BooleanType))
      .when(length(bin) > 0, substring(bin, 1, 1) =!= lit(Array[Byte](0)))
      .otherwise(lit(false))
  }

  /** int / medium-int: json.Number → Int64 (`main.go:189-194`). */
  def normInt(c: Column): Column = c.cast(LongType)

  /** float / decimal: json.Number → Float64 — DECIMAL loses exactness in the
    * reference and we replicate that (`main.go:183-188`).
    */
  def normFloat(c: Column): Column = c.cast(DoubleType)

  /** Full kernel dispatch for one column, faithful mode. Precedence per
    * `main.go:136-197`.
    */
  def normalize(c: Column, meta: ColumnMeta): Column = {
    import MySqlType._
    meta.tpe match {
      case Text => normText(c)
      case Date => normDate(c)
      case DateTime => normDateTime(c)
      case Int if meta.isBoolean => normBool(c)
      case Bit => normBit(c)
      case Float => normFloat(c)
      case Int => normInt(c)
      case Other => c
    }
  }

  /** Whole-row normalization — the `rowToMap` analog (`main.go:125-209`):
    * every column in `metas` is rewritten through the kernel; columns
    * without metadata pass through untouched (the reference's
    * beyond-schema positional passthrough, `main.go:204-206`).
    */
  def normalizeRow(df: org.apache.spark.sql.DataFrame, metas: Seq[ColumnMeta]): org.apache.spark.sql.DataFrame = {
    val byName = metas.map(m => m.name -> m).toMap
    val cols = df.columns.map { name =>
      byName.get(name) match {
        case Some(meta) => normalize(org.apache.spark.sql.functions.col(name), meta).as(name)
        case None => org.apache.spark.sql.functions.col(name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
