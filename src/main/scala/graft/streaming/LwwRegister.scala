package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-writer-wins register — the incremental face of the batch
  * `cdc_lww_register` query (ops/CdcQueries.scala): the multi-master CDC
  * merge operator run ON the stream, where it actually lives in
  * production (each key's register converges as writes from different
  * sites arrive in whatever order replication delivers them).
  *
  * State per key is O(1) by construction — one winner struct
  * (ts, site, event_id, value), one write counter, one site BIT-SET
  * (sites are a small fixed replication topology, so the set is a Long
  * mask exactly as in the batch query) — the family contract
  * (`MarkovChain`: one last event; `DriftMonitor`: domain-bounded
  * histogram).
  *
  * Unlike the order-contracted operators (`MarkovChain`/`ScdHistory`),
  * the LWW merge is a CRDT: commutative, associative, idempotent-free
  * max-merge — so NO arrival-order contract is needed. ANY partition of
  * the write stream into micro-batches, in ANY order, converges to the
  * identical register; `LwwRegisterSpec` pins the final snapshot equal to
  * the batch query under ordered, reversed and deterministically shuffled
  * splits.
  *
  * Emission per (key, touching micro-batch) is append-safe: a snapshot is
  * an immutable fact about the register's state at that batch (the
  * `DriftMonitor` emission shape).
  */
object LwwRegister {

  /** One replicated write: site derives from event_id exactly as the
    * batch query's `event_id % 3` (a stand-in for the origin replica id
    * carried by a real multi-master binlog envelope).
    */
  final case class Write(pk: Long, event_id: Long, ts: Long, value: Double) {
    def site: Long = event_id % 3
  }

  /** The register: winner ordered by (ts, site, event_id) — the batch
    * max(struct(ts, site, event_id, value)) — plus the bounded conflict
    * profile.
    */
  final case class Reg(
      ts: Long, site: Long, eventId: Long, value: Double,
      nWrites: Long, siteBits: Long)

  final case class Snapshot(
      pk: Long, winner_event: Long, winner_site: Long, value_r: Double,
      n_writes: Long, n_sites: Long)

  /** The LWW merge kernel, shared with the spec's oracle: fold writes into
    * the register. Order-independent: max-merge on the winner ordering,
    * OR on the site bits, + on the counter.
    */
  def merge(state: Option[Reg], writes: Iterator[Write]): Option[Reg] =
    writes.foldLeft(state) { (acc, w) =>
      val bit = 1L << w.site.toInt
      acc match {
        case None => Some(Reg(w.ts, w.site, w.event_id, w.value, 1L, bit))
        case Some(r) =>
          val wins = w.ts > r.ts || (w.ts == r.ts &&
            (w.site > r.site || (w.site == r.site && w.event_id > r.eventId)))
          Some(if (wins)
            Reg(w.ts, w.site, w.event_id, w.value, r.nWrites + 1, r.siteBits | bit)
          else r.copy(nWrites = r.nWrites + 1, siteBits = r.siteBits | bit))
      }
    }

  /** The batch query's output row from a register (value rounded to cents
    * with the same HALF_UP `round(value, 2)` the batch side emits).
    */
  def snapshot(pk: Long, r: Reg): Snapshot =
    Snapshot(pk, r.eventId, r.site,
      BigDecimal(r.value).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
      r.nWrites, java.lang.Long.bitCount(r.siteBits).toLong)

  def registers(writes: Dataset[Write]): Dataset[Snapshot] = {
    implicit val outEnc = Encoders.product[Snapshot]
    implicit val stateEnc = Encoders.product[Reg]
    implicit val longEnc = Encoders.scalaLong

    writes
      .groupByKey(_.pk)
      .flatMapGroupsWithState[Reg, Snapshot](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (pk: Long, rows: Iterator[Write], state: GroupState[Reg]) =>
          merge(state.getOption, rows) match {
            case Some(r) => state.update(r); Iterator(snapshot(pk, r))
            case None => Iterator.empty
          }
      }
  }
}
