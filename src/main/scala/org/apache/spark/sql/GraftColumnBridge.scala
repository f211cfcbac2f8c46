package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to construct `Column`s from Catalyst `Expression`s (and
  * back) in Spark 4.x, where the conversion helpers are `private[sql]`.
  * Lives in the `org.apache.spark.sql` package solely for access; contains
  * no logic of its own.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Construct a DataFrame over a (possibly custom) logical plan —
    * `Dataset.ofRows` is `private[sql]` in Spark 4.x.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The persisted RDD backing a `localCheckpoint()`ed DataFrame (its plan
    * is the `LogicalRDD` the checkpoint produced). `localCheckpoint`
    * persists that RDD at MEMORY_AND_DISK, and dropping the DataFrame
    * reference alone frees the blocks only when GC + ContextCleaner get
    * around to it — callers that manage checkpoint lifetimes (session
    * caches) use this handle to `unpersist` eagerly.
    */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** `spark.graft.checkpointStorageLevel`: the storage level for
    * graft-managed localCheckpoints — the fixpoint runner's per-round
    * label tables, the delta rounds' temps, and the graph family's
    * session chain artifacts. Default = MEMORY_AND_DISK (Spark's own
    * localCheckpoint level). Set DISK_ONLY for single-box probe runs
    * whose resident artifacts rival the heap: the 100× decomposition
    * probe pins ~27 GB of chain checkpoints under a 31 g heap, where the
    * unified pool's protected storage fraction starves execution into
    * OOM (three measured r17 kills); on disk the same bytes ride the OS
    * page cache — off-heap, evictable, and on a 128 GiB box effectively
    * still memory-speed. This is exactly the residency trade a real
    * cluster makes by giving each executor its own bounded heap.
    */
  val CheckpointLevelKey = "spark.graft.checkpointStorageLevel"

  /** `localCheckpoint()` honoring [[CheckpointLevelKey]]. */
  def leveledLocalCheckpoint(df: DataFrame): DataFrame =
    df.localCheckpoint(true, org.apache.spark.storage.StorageLevel.fromString(
      df.sparkSession.conf.get(CheckpointLevelKey, "MEMORY_AND_DISK")))

  /** `localCheckpoint()` with the ORIGIN STATISTICS DETACHED. Spark's
    * checkpoint carries the optimized plan's `Statistics` into the
    * resulting `LogicalRDD` (`originStats`), which is normally what you
    * want — but in an ITERATIVE loop whose per-round plan references the
    * previous checkpoint k > 1 times, `SizeInBytesOnlyStatsPlanVisitor`'s
    * join estimate MULTIPLIES the checkpoint's size into the next round's
    * stats k times, so the carried sizeInBytes grows doubly-exponentially
    * in the round count (bits × k per round). Around round ~8 the
    * optimizer's BigInteger arithmetic (InjectRuntimeFilter's
    * `canBroadcastBySize` and every other stats consumer) does Toom-Cook
    * multiplications on multi-megabit integers and the DRIVER, not the
    * cluster, becomes the bottleneck — measured: the truss fixpoint loop
    * hung minutes in `BigInteger.multiply` at sf0.001. Detaching the
    * stats makes each checkpoint a fresh `defaultSizeInBytes` leaf, so
    * per-round stats stay bounded regardless of round count. Single-use
    * checkpoints (the session index caches) keep Spark's default
    * behavior — carried stats give the planner better join sides there.
    */
  def statsFreeLocalCheckpoint(df: DataFrame): DataFrame = {
    val ck = leveledLocalCheckpoint(df)
    val session = ck.sparkSession.asInstanceOf[classic.SparkSession]
    ck.queryExecution.analyzed match {
      case l: execution.LogicalRDD =>
        classic.Dataset.ofRows(session,
          execution.LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(session, None, None))
      case _ => ck
    }
  }

  /** Spark's internal bounded-state top-k collector (`CollectTopK`,
    * `private[sql]` — the engine's own ML/observation helper): keeps a
    * k-element `BoundedPriorityQueue` per group and returns the k largest
    * child values in DESCENDING child order. Drop-in replacement for the
    * `slice(sort_array(collect_list(c), asc = false), 1, k)` pattern with
    * per-group state O(k) instead of O(group) — the difference between a
    * bounded buffer and materializing every candidate row in the
    * aggregation buffer (see graft's distributed top-k call sites).
    */
  def collectTopK(c: Column, k: Int): Column =
    classic.ExpressionUtils.column(
      catalyst.expressions.aggregate.GraftTopKBridge.collectTopK(
        classic.ExpressionUtils.expression(c), k, reverse = false))

  /** The ascending face: the k SMALLEST child values in ASCENDING child
    * order — a drop-in for `slice(sort_array(collect_list(c)), 1, k)`
    * with the same O(k) per-group state.
    */
  def collectBottomK(c: Column, k: Int): Column =
    classic.ExpressionUtils.column(
      catalyst.expressions.aggregate.GraftTopKBridge.collectTopK(
        classic.ExpressionUtils.expression(c), k, reverse = true))

  /** Register a function builder on a LIVE session's registry (the
    * `spark.sql.extensions` config only applies at session construction).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
