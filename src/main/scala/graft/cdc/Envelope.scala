package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Debezium-style change envelope of the reference
  * (`{before, after, source:{table}}`, reference `main.go:80-86`):
  * `before` is null for inserts (`main.go:75-78`), populated for updates
  * (`main.go:68-74`); deletes never appear (`main.go:57-60`, hazard H2).
  *
  * Canonical generic representation: `map<string,string>` images (the
  * reference is schema-free — SURVEY.md §1.3); a typed per-table projection
  * is available via `from_json` at the consumption edge.
  */
object Envelope {

  /** Canonical generic envelope schema (FIXTURES.md §2). */
  val schema: StructType = StructType(Seq(
    StructField("before", MapType(StringType, StringType), nullable = true),
    StructField("after", MapType(StringType, StringType), nullable = true),
    StructField("source", StructType(Seq(StructField("table", StringType))))))

  /** Build the envelope struct column. `before` may be a null map literal
    * for inserts: `lit(null).cast(MapType(StringType, StringType))`.
    */
  def envelope(before: Column, after: Column, table: Column): Column =
    struct(
      before.as("before"),
      after.as("after"),
      struct(table.as("table")).as("source"))

  /** Alias of [[envelope]] for struct (typed) images — the Column-level
    * construction is type-generic, so map and struct images share one body.
    */
  def envelopeTyped(before: Column, after: Column, table: Column): Column =
    envelope(before, after, table)

  /** Serialize like the reference's `json.Marshal` (`main.go:88`):
    * nulls are kept (`{"before":null,...}`), hence ignoreNullFields=false —
    * Spark's default drops them.
    */
  def toJsonColumn(env: Column): Column =
    to_json(env, Map("ignoreNullFields" -> "false"))

  /** A null `before` image for insert envelopes. */
  def nullBefore: Column =
    lit(null).cast(MapType(StringType, StringType))
}
