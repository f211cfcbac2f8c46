package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic decision rules shared between the stand-alone curation
  * queries (`pipeline_train_val_split`, `pipeline_importance_resample` in
  * [[TextQueries]]) and the composed end-to-end chain
  * ([[graft.CurationPipeline]]). One definition site: the composed pipeline
  * can no longer drift from the operators its ledger claims to reproduce —
  * if either side changes, both change, and the DuckDB oracles on both the
  * stand-alone queries and `pipeline_curation_ledger` hash-pin the result.
  *
  * Everything here is a pure function of (doc_id, text): integer basis
  * points and a salted-md5 byte fold, so assignments are reproducible
  * across runs, engines, and corpus growth — a doc never flips buckets
  * when unrelated data arrives.
  */
private[graft] object CurationRules {

  /** Salted md5 byte fold — position-weighted sum of the 32 hex digits of
    * `md5(prefix || id)`. Engine-portable (md5/ascii/substring exist and
    * agree everywhere), so DuckDB oracles replay it verbatim.
    */
  def saltedFold(prefix: String, id: Column): Column = {
    val h = md5(concat(lit(prefix), id.cast("string")))
    (1 to 32).map(i => ascii(substring(h, i, 1)) * lit(i))
      .reduce(_ + _).cast("long")
  }

  /** The train/val/test bucket in [0, 100): `< 98` = train, `98` = val. */
  def splitBucket(id: Column): Column = pmod(saltedFold("split:", id), lit(100L))

  /** The resample acceptance draw in [0, 10000). */
  def resampleHashBp(id: Column): Column =
    pmod(saltedFold("resample:", id), lit(10000L))

  /** DSIR-ish acceptance threshold in basis points:
    * min(10000, 400 + 3 * stopword-ratio-bp), truncating integer division.
    * Parameterized by column NAME so both call sites evaluate the exact
    * same SQL expression (`div` is the SQL truncating division).
    */
  def resampleAcceptBp(nStopCol: String, nToksCol: String): Column =
    expr(s"least(10000, 400 + 3 * (($nStopCol * 10000) div $nToksCol))")

  /** Stopword count over a token array — the cheap English-likeness proxy
    * the resample stage weights by.
    */
  def stopCount(toks: Column): Column =
    size(filter(toks, t => t === "a" || t === "the" || t === "of")).cast("long")

  /** The SQL rendering of [[saltedFold]] for DuckDB oracles (`h` must be
    * the md5 hex column in scope).
    */
  val foldedSql: String =
    (1 to 32).map(i => s"ascii(substr(h, $i, 1)) * $i").mkString(" + ")
}
