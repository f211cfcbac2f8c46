package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tombstone-GC ledger — the incremental face of the batch
  * `cdc_tombstone_gc` query (ops/CdcQueries.scala): a log-compaction
  * process doesn't re-scan the changelog per GC cycle; it maintains one
  * tiny tombstone record per deleted key as changes arrive and evaluates
  * the purge/retain/revived verdict against the CURRENT watermark at
  * decision time.
  *
  * State per key is O(1) by construction — (last delete position, last
  * write position, delete count) — the family contract (`LwwRegister`:
  * one winner struct; `MarkovChain`: one last event; `DriftMonitor`:
  * domain-bounded histogram).
  *
  * Like `LwwRegister` (and unlike the order-contracted operators), the
  * merge is commutative-associative (max, max, +), so NO arrival-order
  * contract is needed: any partition of the change stream into
  * micro-batches, in any order, converges to the identical tombstone
  * ledger; `TombstoneGcSpec` pins the final verdicts equal to the batch
  * query under ordered, reversed and shuffled arrival across splits.
  *
  * The GC VERDICT is deliberately factored out of the stateful operator:
  * a verdict is a function of (ledger row, watermark-at-decision-time),
  * and baking a moving watermark into keyed state would make emissions
  * depend on micro-batch boundaries (the snapshot-vs-decision split every
  * real compactor has — Kafka's log cleaner evaluates `delete.retention.ms`
  * against the cleaning point, not against state captured at write time).
  */
object TombstoneGc {

  /** One change-log entry: `op` is the action analog (the batch query's
    * `event_type`), `pos` the log position (`event_id`).
    */
  final case class Change(pk: Long, pos: Long, op: String)

  /** The per-key tombstone ledger row. `lastDelete` is -1 until the first
    * delete arrives (the batch query only emits keys with ≥ 1 delete;
    * a ledger row without one is retained in state but never snapshot).
    */
  final case class Tomb(lastDelete: Long, lastAny: Long, nDeletes: Long)

  final case class Snapshot(
      pk: Long, last_delete: Long, n_deletes: Long, revived: Boolean)

  /** The batch query's verdict row, evaluated against a watermark. */
  final case class Verdict(
      pk: Long, last_delete: Long, n_deletes: Long, revived: Boolean,
      gc_action: String, wm: Long)

  /** Commutative-associative fold: max on positions, + on the counter. */
  def merge(state: Option[Tomb], changes: Iterator[Change]): Option[Tomb] =
    changes.foldLeft(state) { (acc, c) =>
      val del = c.op == "error"
      acc match {
        case None =>
          Some(Tomb(if (del) c.pos else -1L, c.pos, if (del) 1L else 0L))
        case Some(t) => Some(Tomb(
          if (del) math.max(t.lastDelete, c.pos) else t.lastDelete,
          math.max(t.lastAny, c.pos),
          t.nDeletes + (if (del) 1L else 0L)))
      }
    }

  /** The batch `gc_action` CASE, shared with the spec's replay. */
  def verdict(pk: Long, t: Tomb, wm: Long): Verdict =
    verdict(Snapshot(pk, t.lastDelete, t.nDeletes, t.lastAny > t.lastDelete), wm)

  /** Verdict from an emitted ledger snapshot — what a GC cycle actually
    * consumes (the snapshot carries everything the decision needs).
    */
  def verdict(s: Snapshot, wm: Long): Verdict = {
    val action =
      if (s.revived) "keep_revived"
      else if (s.last_delete <= wm) "purge"
      else "retain"
    Verdict(s.pk, s.last_delete, s.n_deletes, s.revived, action, wm)
  }

  def tombstones(changes: Dataset[Change]): Dataset[Snapshot] = {
    implicit val outEnc = Encoders.product[Snapshot]
    implicit val stateEnc = Encoders.product[Tomb]
    implicit val longEnc = Encoders.scalaLong

    changes
      .groupByKey(_.pk)
      .flatMapGroupsWithState[Tomb, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (pk: Long, rows: Iterator[Change], state: GroupState[Tomb]) =>
          merge(state.getOption, rows) match {
            case Some(t) =>
              state.update(t)
              if (t.nDeletes > 0L)
                Iterator(Snapshot(pk, t.lastDelete, t.nDeletes,
                  t.lastAny > t.lastDelete))
              else Iterator.empty
            case None => Iterator.empty
          }
      }
  }
}
