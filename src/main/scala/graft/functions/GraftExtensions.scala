package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's custom Catalyst expressions as SQL functions, so
  * the SQL-text surface can call them like built-ins:
  *
  *   `SELECT strict_base64_decode(c), simhash64(split(text, ' ')) FROM t`
  *
  * Wire up with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or programmatically via `SparkSessionExtensionsProvider`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    GraftExtensions.rules.foreach(r => ext.injectOptimizerRule(_ => r))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {

  /** The custom function surface: name → expression builder. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "strict_base64_decode" -> (children => StrictBase64Decode(children.head)),
    "simhash64" -> (children => SimHash64(children.head)),
    "binlog_header" -> (children => BinlogHeaderDecode(children.head)),
    "binlog_frames" -> (children => BinlogFrames(children.head)),
    "binlog_rotate" -> (children => BinlogRotateDecode(children.head,
      hasCrc = children.lift(1).exists {
        case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _) => b
        case other => throw new IllegalArgumentException(
          s"has_crc must be a boolean literal, got $other")
      })),
    "binlog_payload_events" -> (children => BinlogPayloadEvents(children.head,
      hasCrc = children.lift(1).exists {
        case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _) => b
        case other => throw new IllegalArgumentException(
          s"has_crc must be a boolean literal, got $other")
      })),
    "binlog_gtid" -> (children => BinlogGtidDecode(children.head)),
    "binlog_xid" -> (children => BinlogXidDecode(children.head)),
    "binlog_query" -> (children => BinlogQueryDecode(children.head,
      hasCrc = children.lift(1).exists {
        case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _) => b
        case other => throw new IllegalArgumentException(
          s"has_crc must be a boolean literal, got $other")
      })),
    "binlog_crc32_ok" -> (children => BinlogCrc32Ok(children.head)),
    "binlog_table" -> (children => BinlogTableDecode(children.head)),
    "binlog_table_id" -> (children => BinlogTableIdDecode(children.head)),
    "binlog_rows_json" -> (children => BinlogRowsJson(children(0), children(1),
      hasCrc = children.lift(2).exists {
        case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _) => b
        case other => throw new IllegalArgumentException(
          s"has_crc must be a boolean literal, got $other")
      })),
    "vector_dot" -> (children => VectorDot(children(0), children(1))),
    "bloom_agg" -> (children => BloomFilterAgg(children(0),
      intLit(children(1)), intLit(children(2))).toAggregateExpression()),
    "bloom_might_contain" -> (children => BloomMightContain(children(0), children(1))),
    "space_saving_topk" -> (children =>
      SpaceSavingTopK(children(0), intLit(children(1))).toAggregateExpression()),
    "minhash_sig" -> (children => MinHashSig(children(0), intLit(children(1)))),
    "bootstrap_weights" -> (children => BootstrapWeights(children.head)))

  /** Any integral literal argument: SQL `8` arrives as Int but `8L` / typed
    * literals are just as valid a k. Out-of-range k is an invalid argument
    * (single error surface), not an arithmetic overflow.
    */
  private def intLit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) => k
    case org.apache.spark.sql.catalyst.expressions.Literal(k: Long, _) =>
      if (k < Int.MinValue || k > Int.MaxValue)
        throw new IllegalArgumentException(s"k out of int range: $k")
      else k.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(k: Short, _) => k.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(k: Byte, _) => k.toInt
    case other => throw new IllegalArgumentException(s"k must be an integral literal, got $other")
  }

  /** The engine's optimizer rules (also injected by the extensions path). */
  val rules: Seq[org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    Seq(RewriteHofDotProduct, RewriteInlineMapHof, RewriteLevenshteinJoin)

  /** Register on an already-running session (the config path above only
    * applies at session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, name, builder)
    }
    // Append-if-absent: a live session may already carry its own rules or
    // strategies (or an earlier register() call) — never clobber them.
    val exp = spark.experimental
    exp.extraOptimizations =
      exp.extraOptimizations ++ rules.filterNot(exp.extraOptimizations.contains)
    if (!exp.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.AsofJoinStrategy
  }
}
