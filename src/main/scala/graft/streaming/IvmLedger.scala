package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental-view-maintenance CHANGELOG — the streaming face
  * of the batch `cdc_ivm_agg` query (ops/CdcQueries.scala), and the piece
  * Structured Streaming does not provide natively: update-mode aggregation
  * emits only each key's NEW value, but a downstream consumer maintaining
  * its own materialization (a cache, a serving index, another engine's
  * view) needs the RETRACTION stream — (before, after) pairs, Flink's
  * changelog / DBSP's Z-set delta. This operator emits exactly one
  * changelog row per (key, micro-batch that touched the key): the signed
  * ledger before the batch, the ledger after, and how many changes the
  * batch folded in.
  *
  * State is one `Ledger` per key — O(active keys), independent of stream
  * length; a batch's changes fold in with pure addition (signed
  * multiplicities: insert/update images +1, the delete analog 'error' −1),
  * so the fold is order-insensitive WITHIN a batch and the changelog chain
  * (before_k = after_{k−1}) is exact in integers for the counts. Append
  * output mode is correct because an emitted changelog row is immutable —
  * it describes a batch transition that already happened.
  *
  * At scale this is the standard keyed-state shape: state shuffles once by
  * key, each executor holds its key range's ledgers, and emission volume is
  * bounded by (touched keys × batches), not rows.
  */
object IvmLedger {

  final case class Change(pk: Long, event_id: Long, op: String, value: Double)

  /** A key's maintained aggregate view: Σsign, Σsign·cents, change count.
    * The value ledger is INTEGER CENTS (floor(v·100+0.5)) — a float
    * ledger would accumulate association-order drift over unbounded
    * maintenance batches; integer cents make every merge exact, the
    * same rule the batch `cdc_ivm_agg` follows.
    */
  final case class Ledger(n_changes: Long, net_n: Long, net_c: Long)

  final case class ChangelogRow(
      pk: Long, batch_changes: Long,
      before_n: Long, before_c: Long,
      after_n: Long, after_c: Long,
      total_changes: Long)

  val empty: Ledger = Ledger(0L, 0L, 0L)

  def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  /** Fold a batch of changes into a ledger — the kernel shared by the
    * operator, the spec's oracle, and (in spirit) the batch query's
    * signed aggregate.
    */
  def fold(l: Ledger, cs: Iterable[Change]): Ledger =
    cs.foldLeft(l) { (acc, c) =>
      val sign = if (c.op == "error") -1L else 1L
      Ledger(acc.n_changes + 1, acc.net_n + sign, acc.net_c + sign * cents(c.value))
    }

  def changelog(changes: Dataset[Change]): Dataset[ChangelogRow] = {
    implicit val outEnc = Encoders.product[ChangelogRow]
    implicit val stateEnc = Encoders.product[Ledger]
    implicit val longEnc = Encoders.scalaLong

    changes
      .groupByKey(_.pk)
      .flatMapGroupsWithState[Ledger, ChangelogRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (pk: Long, rows: Iterator[Change], state: GroupState[Ledger]) =>
          val before = state.getOption.getOrElse(empty)
          val batch = rows.toSeq
          val after = fold(before, batch)
          state.update(after)
          Iterator.single(ChangelogRow(
            pk, batch.size.toLong,
            before.net_n, before.net_c,
            after.net_n, after.net_c,
            after.n_changes))
      }
  }
}
