package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator extension path (custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` / `spark.experimental.extraStrategies`).
  *
  * For every left row, emit the LAST right row in the same `by` group whose
  * `on` tuple is `<` (strict) or `<=` (inclusive) the left row's, comparing
  * lexicographically; unmatched left rows keep nulls on the right (left-
  * outer semantics). This is the merge_asof/ASOF JOIN operator of pandas /
  * kdb / QuestDB, which Spark SQL lacks.
  *
  * Why an operator rather than the windowed-union emulation (`join_asof`):
  * the emulation unions both inputs, shuffles the union, and runs a window
  * over every row; the operator shuffles each input once on its `by` keys,
  * sorts in-partition by `(by, on)`, and streams BOTH sorted sides through
  * a single two-pointer merge — no union blow-up, no window state, and the
  * right side's columns (not just one value) come through. At 100 TB both
  * sides partition independently, the merge is O(|L|+|R|) per partition
  * with O(1) state, and AQE still plans each side's shuffle.
  *
  * Scale notes: EnsureRequirements co-partitions the sides (compatible hash
  * partitioning on the `by` keys) and provides the in-partition sort, so
  * the operator composes with every upstream optimization — filters and
  * column pruning happen below it because callers pre-project inputs (the
  * node itself is opaque to ColumnPruning, as custom nodes are).
  *
  * Null semantics: null `by` keys form their own group (NULL-safe, like
  * pandas merge_asof groups — NOT SQL equi-join, which would never match
  * them), and null `on` values sort FIRST (they behave as
  * earlier-than-everything timestamps); filter either out beforehand if
  * those rows should not participate.
  *
  * Ties: when several RIGHT rows share one `(by, on)` tuple exactly, which
  * of them matches is unspecified (sorting is not stable across equal
  * tuples) — append a unique sequence column to `on` if that matters.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[AttributeReference],
    rightBy: Seq[AttributeReference],
    leftOn: Seq[AttributeReference],
    rightOn: Seq[AttributeReference],
    exclusive: Boolean,
    tolerance: Option[Long] = None) extends BinaryNode {

  // Right side is optional per left row — its columns go nullable.
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean =
    childrenResolved &&
      (leftBy ++ leftOn ++ rightBy ++ rightOn).forall(_.resolved) &&
      leftBy.map(_.dataType) == rightBy.map(_.dataType) &&
      leftOn.map(_.dataType) == rightOn.map(_.dataType)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] to [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lb, rb, lo, ro, ex, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lb, rb, lo, ro, ex, tol) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned, co-sorted two-pointer merge.
  *
  * Each side declares `ClusteredDistribution(by)` and an in-partition
  * `(by, on)` ascending sort — EnsureRequirements inserts the (at most one
  * per side) exchange and sort. The merge then advances the right iterator
  * past every row that precedes the current left row in `(by, on)` order,
  * remembering the latest same-key candidate; because both sides arrive
  * sorted, each input row is touched exactly once per partition.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Seq[AttributeReference],
    rightBy: Seq[AttributeReference],
    leftOn: Seq[AttributeReference],
    rightOn: Seq[AttributeReference],
    exclusive: Boolean,
    tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy ++ leftOn).map(SortOrder(_, Ascending)),
    (rightBy ++ rightOn).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    val (lBy, rBy, lOn, rOn, excl) = (leftBy, rightBy, leftOn, rightOn, exclusive)
    // Tolerance compares the FIRST on column as a long in its native unit
    // (µs for timestamps, days for dates) — validated by Asof.join.
    val tol = tolerance
    val onHeadType = leftOn.head.dataType
    val lRdd = left.execute()
    val rRdd = right.execute()
    // EnsureRequirements co-partitions the sides and AQE coalesces their
    // shuffles consistently; if either contract ever breaks, fail with the
    // operator's name rather than zipPartitions' generic error.
    if (lRdd.getNumPartitions != rRdd.getNumPartitions)
      throw new IllegalStateException(
        s"as-of join sides lost co-partitioning: left has " +
          s"${lRdd.getNumPartitions} partitions, right ${rRdd.getNumPartitions}")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lByProj = UnsafeProjection.create(lBy, leftOutput)
      val rByProj = UnsafeProjection.create(rBy, rightOutput)
      val lOnProj = UnsafeProjection.create(lOn, leftOutput)
      val rOnProj = UnsafeProjection.create(rOn, rightOutput)
      val byOrd = RowOrdering.createNaturalAscendingOrdering(lBy.map(_.dataType))
      val onOrd = RowOrdering.createNaturalAscendingOrdering(lOn.map(_.dataType))
      val resultProj = UnsafeProjection.create(allOutput, allOutput)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightOutput.size)
      // Native-unit long view of the first on column, for tolerance checks.
      import org.apache.spark.sql.types.{DateType, IntegerType}
      def onHeadLong(onRow: InternalRow): Option[Long] =
        if (onRow.isNullAt(0)) None
        else onHeadType match {
          case DateType | IntegerType => Some(onRow.getInt(0).toLong)
          case _ => Some(onRow.getLong(0))
        }
      val rBuf = rIter.buffered
      // Latest right row whose (by, on) precedes the current left row, plus
      // a copy of its by-key: a key change on the left invalidates it.
      var candidate: InternalRow = null
      var candidateKey: UnsafeRow = null
      var candidateOnHead: Option[Long] = None
      lIter.map { lRow =>
        val lKey = lByProj(lRow)
        val lTime = lOnProj(lRow)
        var scan = true
        while (scan && rBuf.hasNext) {
          val keyCmp = byOrd.compare(rByProj(rBuf.head), lKey)
          if (keyCmp < 0) {
            rBuf.next() // behind every remaining left key — discard
          } else if (keyCmp == 0) {
            val rTime = rOnProj(rBuf.head)
            val onCmp = onOrd.compare(rTime, lTime)
            if (onCmp < 0 || (onCmp == 0 && !excl)) {
              // Shuffle iterators reuse row objects — buffer a copy.
              candidateOnHead = onHeadLong(rTime)
              candidate = rBuf.next().copy()
              candidateKey = lKey.copy()
            } else scan = false // too late for this left row; keep for later ones
          } else scan = false // right has moved to a later key group
        }
        val matched = candidate != null && candidateKey != null &&
          byOrd.compare(candidateKey, lKey) == 0 &&
          tol.forall(t => (candidateOnHead, onHeadLong(lTime)) match {
            // The buffered candidate is the CLOSEST preceding row, so if it
            // is out of tolerance every earlier one is too — no match.
            case (Some(c), Some(l)) => l - c <= t
            case _ => false // undefined distance (null on value) never matches
          })
        resultProj(joiner(lRow, if (matched) candidate else nullRight))
      }
    }
  }
}

/** DataFrame-level entry point. */
object Asof {

  /** As-of join `left` to `right` on equal `by` columns, matching the last
    * right row whose `on` tuple sorts before (`exclusive`) or at-or-before
    * (inclusive) the left row's. `rightBy`/`rightOn` default to the left
    * names; pass them when the right side carries renamed columns (the
    * usual shape, since the operator emits BOTH sides' columns and
    * duplicate names would be ambiguous downstream). The sides must not
    * share attribute ids — read the right side independently (a fresh
    * `spark.read`) or alias its columns.
    *
    * `tolerance` (pandas merge_asof's knob) bounds how far back a match
    * may reach, as `left.on - right.on <= tolerance` on the FIRST `on`
    * column in its native unit (µs for timestamps, days for dates); a
    * too-distant or null-timed candidate yields the null row instead.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      on: Seq[String],
      exclusive: Boolean = false,
      rightBy: Seq[String] = Nil,
      rightOn: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame = {
    val rBy = if (rightBy.isEmpty) by else rightBy
    val rOn = if (rightOn.isEmpty) on else rightOn
    require(by.nonEmpty,
      "as-of join needs at least one by column (a global as-of would " +
        "funnel everything through one partition — add a key, or broadcast " +
        "the right side and window instead)")
    require(on.nonEmpty, "as-of join needs at least one on column")
    require(rBy.size == by.size && rOn.size == on.size,
      "rightBy/rightOn must pair up with by/on")
    // Self-healing registration: the strategy is consulted lazily at
    // planning time, so appending it here covers sessions that never went
    // through GraftExtensions.
    val exp = left.sparkSession.experimental
    if (!exp.extraStrategies.contains(AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val shared = lp.outputSet.intersect(rp.outputSet)
    require(shared.isEmpty,
      s"as-of join sides share attributes $shared — re-read or alias the right side")
    // Match the session's name-resolution mode (case-insensitive unless
    // spark.sql.caseSensitive is set, like every other column lookup).
    val caseSensitive =
      left.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def resolve(plan: LogicalPlan, side: String)(name: String): AttributeReference = {
      val hits = plan.output.collect {
        case a: AttributeReference
            if a.name == name || (!caseSensitive && a.name.equalsIgnoreCase(name)) => a
      }
      if (hits.size > 1) throw new IllegalArgumentException(
        s"$side side column '$name' is ambiguous (${hits.map(_.name).mkString(", ")})")
      hits.headOption.getOrElse(throw new IllegalArgumentException(
        s"$side side has no column '$name' (has: ${plan.output.map(_.name).mkString(", ")})"))
    }
    val lOnAttrs = on.map(resolve(lp, "left"))
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance must be non-negative, got $t")
      import org.apache.spark.sql.types._
      val dt = lOnAttrs.head.dataType
      require(Seq(LongType, IntegerType, DateType, TimestampType,
        TimestampNTZType).contains(dt),
        s"tolerance needs a long-comparable first on column, got $dt")
    }
    GraftColumnBridge.ofRows(left.sparkSession, AsofJoin(
      lp, rp,
      by.map(resolve(lp, "left")), rBy.map(resolve(rp, "right")),
      lOnAttrs, rOn.map(resolve(rp, "right")),
      exclusive, tolerance))
  }
}
