package graft.sources

import org.apache.spark.sql.sources._

/** Source-side evaluation of Catalyst-translated data-source filters over
  * the CDC log sources' raw columns (`line STRING`, `pos BIGINT`, and — for
  * the rotating directory source — `file STRING`).
  *
  * Pushdown here is a BANDWIDTH optimization, never a semantics change: the
  * scan builders report every filter back to Spark as residual, so the
  * exact predicates always re-run post-scan; the source merely skips
  * non-matching lines before they are materialized into rows (and before
  * the downstream `from_json` decode — the expensive step the reference
  * pays per event, `main.go:62-74`). A filter that references only `file`
  * additionally prunes whole log files from the scan plan, the rotating
  * source's analog of partition pruning.
  */
private[sources] object LineFilters {

  private val stringCols = Set("line", "file")

  /** Can `f` be evaluated at the source from (line, pos, file) alone?
    * `cols` is the source's raw-column set ({"line","pos"} or +"file").
    */
  def supported(f: Filter, cols: Set[String]): Boolean = f match {
    case And(l, r) => supported(l, cols) && supported(r, cols)
    case Or(l, r)  => supported(l, cols) && supported(r, cols)
    case Not(c)    => supported(c, cols)
    case StringContains(a, _)   => cols(a) && stringCols(a)
    case StringStartsWith(a, _) => cols(a) && stringCols(a)
    case StringEndsWith(a, _)   => cols(a) && stringCols(a)
    case EqualTo(a, _)          => cols(a)
    case In(a, _)               => cols(a)
    case GreaterThan(a, _)        => a == "pos" && cols(a)
    case GreaterThanOrEqual(a, _) => a == "pos" && cols(a)
    case LessThan(a, _)           => a == "pos" && cols(a)
    case LessThanOrEqual(a, _)    => a == "pos" && cols(a)
    case IsNotNull(a) => cols(a) // all three columns are non-nullable
    case _ => false
  }

  /** Evaluate a supported filter against one raw row. Must only be called
    * with filters that passed [[supported]]; anything unexpected evaluates
    * to true (keep the row — Spark's residual filter decides).
    */
  def eval(f: Filter, line: String, pos: Long, file: String): Boolean = {
    def str(a: String): String = if (a == "file") file else line
    def lng(v: Any): Long = v match {
      case n: Number => n.longValue()
      case other     => other.toString.toLong
    }
    f match {
      case And(l, r) => eval(l, line, pos, file) && eval(r, line, pos, file)
      case Or(l, r)  => eval(l, line, pos, file) || eval(r, line, pos, file)
      case Not(c)    => !eval(c, line, pos, file)
      case StringContains(a, v)   => str(a).contains(v)
      case StringStartsWith(a, v) => str(a).startsWith(v)
      case StringEndsWith(a, v)   => str(a).endsWith(v)
      case EqualTo("pos", v) => pos == lng(v)
      case EqualTo(a, v)     => str(a) == String.valueOf(v)
      case In("pos", vs) => vs.exists(v => v != null && lng(v) == pos)
      case In(a, vs)     => vs.exists(v => String.valueOf(v) == str(a))
      case GreaterThan(_, v)        => pos > lng(v)
      case GreaterThanOrEqual(_, v) => pos >= lng(v)
      case LessThan(_, v)           => pos < lng(v)
      case LessThanOrEqual(_, v)    => pos <= lng(v)
      case IsNotNull(_) => true
      case _ => true
    }
  }

  /** Evaluate every pushed filter against one raw row (conjunction). */
  def evalAll(fs: Seq[Filter], line: String, pos: Long, file: String): Boolean =
    fs.forall(eval(_, line, pos, file))

  /** Split pushed conjuncts into (file-only, rest): a file-only conjunct
    * that is false for a given file name excludes EVERY row of that file,
    * so the planner can drop the file's partition — and for sealed logs,
    * skip even line-counting it.
    */
  def fileOnly(fs: Seq[Filter]): (Seq[Filter], Seq[Filter]) =
    fs.partition(f => f.references.toSet == Set("file"))

  /** Would any file-only conjunct exclude this file entirely? (line/pos
    * args are irrelevant for file-only filters.)
    */
  def prunesFile(fileOnlyFilters: Seq[Filter], file: String): Boolean =
    !fileOnlyFilters.forall(eval(_, "", 0L, file))

  /** Route/action guard filters from source options — the STREAMING
    * pushdown surface. Spark's micro-batch planner never invokes DSv2
    * pushFilters (verified on 4.1: MicroBatchScan always reports
    * `PushedFilters: []`), so streams opt in explicitly:
    *
    *   `.option("guardTables", "orders,customers").option("guardOps",
    *    "insert,update")`
    *
    * builds the same And(Or(StringContains…)) conjunction the batch path
    * receives from `CdcPipeline.lineGuard` — sound on the compact-JSON
    * wire format (`"table":"x"` / `"op":"y"`, no spaces), where a line
    * whose parsed (table, op) would be kept must contain the substrings.
    * Unlike Spark-pushed filters these have no residual re-check, so they
    * are opt-in and documented as requiring that wire format.
    */
  def guardFilters(get: String => Option[String]): Seq[Filter] = {
    def split(k: String): Seq[String] =
      get(k).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    def anyContains(pats: Seq[String]): Option[Filter] =
      pats.map(p => StringContains("line", p): Filter).reduceOption(Or(_, _))
    anyContains(split("guardTables").map(v => s""""table":"$v"""")).toSeq ++
      anyContains(split("guardOps").map(v => s""""op":"$v"""")).toSeq
  }
}
