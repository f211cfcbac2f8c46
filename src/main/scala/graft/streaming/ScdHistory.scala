package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type-2 history — the incremental sibling of the batch
  * `cdc_scd2` query (ops/CdcQueries.scala): each change CLOSES the key's
  * previous open version, which is emitted with its validity interval the
  * moment it closes (append-mode: a closed interval is immutable, exactly
  * the contract append output needs). The still-open current version lives
  * in state — one small record per key, O(active keys) regardless of
  * stream length — and is emitted only by a later change that closes it.
  *
  * Ordering contract: changes arrive in `event_id` order PER KEY across
  * micro-batches (a binlog-derived change stream is totally ordered, and
  * the reference delivers per-table events in log order — see
  * `/root/reference/main.go` row-event handling; partition-by-key
  * preserves it). Within one micro-batch rows are sorted by `event_id`,
  * so any batch split of an ordered stream yields byte-identical closed
  * intervals — the equivalence `ScdHistorySpec` pins against the batch
  * query for several splits.
  *
  * A delete (`op == "error"`, matching the batch query) closes its
  * predecessor like any change and its own version carries no value; it
  * can itself be closed by a later re-insert of the key.
  */
object ScdHistory {

  final case class Change(pk: Long, event_id: Long, op: String, value: Double)

  /** The key's open version: everything needed to emit it once it closes. */
  final case class OpenVersion(version: Long, valid_from: Long, op: String, value: Double)

  /** A closed version. `value` is None for delete rows (op == "error"),
    * mirroring the batch query's null.
    */
  final case class ClosedVersion(
      pk: Long, version: Long, valid_from: Long, valid_to: Long,
      op: String, value: Option[Double])

  /** Fold one ordered run of changes into (closed rows, new open state) —
    * the kernel both the streaming operator and the spec's oracle use.
    */
  def fold(pk: Long, open: Option[OpenVersion], ordered: Seq[Change])
      : (Seq[ClosedVersion], Option[OpenVersion]) = {
    var cur = open
    val closed = Seq.newBuilder[ClosedVersion]
    ordered.foreach { c =>
      cur.foreach { o =>
        closed += ClosedVersion(pk, o.version, o.valid_from, c.event_id, o.op,
          if (o.op == "error") None else Some(o.value))
      }
      cur = Some(OpenVersion(cur.map(_.version + 1).getOrElse(1L), c.event_id, c.op, c.value))
    }
    (closed.result(), cur)
  }

  def history(changes: Dataset[Change]): Dataset[ClosedVersion] = {
    implicit val closedEnc = Encoders.product[ClosedVersion]
    implicit val stateEnc = Encoders.product[OpenVersion]
    implicit val longEnc = Encoders.scalaLong

    changes
      .groupByKey(_.pk)
      .flatMapGroupsWithState[OpenVersion, ClosedVersion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (pk: Long, rows: Iterator[Change], state: GroupState[OpenVersion]) =>
          val (closed, open) = fold(pk, state.getOption, rows.toSeq.sortBy(_.event_id))
          open.foreach(state.update)
          closed.iterator
      }
  }
}
