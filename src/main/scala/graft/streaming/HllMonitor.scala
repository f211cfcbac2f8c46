package graft.streaming

import org.apache.datasketches.hll.{HllSketch, TgtHllType}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SHARD-MERGED DISTINCT COUNT — the incremental face of the
  * batch `agg_hll_union` sketch rollup (ops/RelationalQueries.scala; the
  * r17 verdict's ask #7): per-shard HyperLogLog state updated as keys
  * arrive, a serialized sketch snapshot emitted per trigger, and any
  * cross-shard cardinality rollup served by a register-max UNION of the
  * latest snapshots — the canonical streaming-distinct topology (count
  * distinct over an unbounded stream in O(2^lgK) state per shard, no key
  * set retained anywhere).
  *
  * The state algebra is exactly the batch build's, by construction:
  * Spark's `hll_sketch_agg(key, 14)` constructs
  * `new HllSketch(lgK, TgtHllType.HLL_8)` and folds `update(key: Long)`
  * — this monitor calls the identical Datasketches constructor and
  * update, so a shard's streamed sketch registers equal the batch
  * sketch's over the same key set, REGARDLESS of arrival order or
  * micro-batch split (a register holds the max leading-zero count seen
  * for its slot — max is commutative, associative, and idempotent).
  * Duplicate re-delivery is therefore a state no-op by INSERTION
  * IDEMPOTENCE: the same key always produces the same (slot, value)
  * coupon, and folding it twice cannot move a register — the
  * at-least-once delivery contract every monitor in this module
  * satisfies, here for free from the sketch algebra rather than an
  * explicit dedup.
  *
  * `StreamingHllSpec` pins the end-to-end estimate — the final
  * snapshots' `hll_sketch_estimate(hll_union_agg(...))` — EQUAL to the
  * batch query's `approx_parts` under 1/3/8-way splits, shuffled
  * arrivals, and duplicate re-delivery of a whole prefix, plus per-shard
  * snapshot-estimate monotonicity (a sketch only ever absorbs coupons).
  *
  * Scale: state per shard is one 2^lgK-register sketch (~16 KB at
  * lgK = 14) — independent of stream length; emissions are one compact
  * sketch per (shard, trigger). At 100 TB the shard key is the
  * date/partition/site the batch face documents, the snapshots land in a
  * sketch store, and any rollup window (day, month, all-time) is a union
  * over stored snapshots with no raw-key re-scan — exactly what a
  * streaming `approx_count_distinct` aggregate cannot give you, because
  * its estimate is not a stored, re-unionable artifact.
  */
object HllMonitor {

  /** One keyed observation: `shard` = the rollup shard (the batch face
    * uses `l_orderkey % 16`), `key` = the identity being counted.
    */
  final case class Obs(shard: Long, key: Long)

  /** Per-shard state: the UPDATABLE serialized sketch plus the exact
    * update count (observations folded, not distinct keys — the ledger
    * a re-delivery audit reads next to the estimate).
    */
  final case class SketchState(bytes: Array[Byte], nSeen: Long)

  /** One emitted snapshot: the shard's COMPACT serialized sketch after
    * this trigger, directly consumable by `hll_union_agg` /
    * `hll_sketch_estimate` (and by Datasketches' own `Union`).
    */
  final case class ShardSketch(shard: Long, n_seen: Long, sketch: Array[Byte])

  /** Matches the batch face's `hll_sketch_agg(l_partkey, 14)`. */
  val LgK = 14

  /** The keyed fold: heapify-or-create the shard's sketch, absorb the
    * batch's keys, snapshot. Update semantics downstream: LAST snapshot
    * per shard wins (each snapshot strictly contains its predecessors).
    */
  def monitor(obs: Dataset[Obs]): Dataset[ShardSketch] = {
    implicit val outEnc = Encoders.product[ShardSketch]
    implicit val stateEnc = Encoders.product[SketchState]
    implicit val longEnc = Encoders.scalaLong
    obs.groupByKey(_.shard)
      .flatMapGroupsWithState[SketchState, ShardSketch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (shard: Long, rows: Iterator[Obs], state: GroupState[SketchState]) =>
          val prev = state.getOption
          val sk = prev.map(p => HllSketch.heapify(p.bytes))
            .getOrElse(new HllSketch(LgK, TgtHllType.HLL_8))
          var seen = prev.map(_.nSeen).getOrElse(0L)
          rows.foreach { r => sk.update(r.key); seen += 1 }
          state.update(SketchState(sk.toUpdatableByteArray, seen))
          Iterator.single(ShardSketch(shard, seen, sk.toCompactByteArray))
      }
  }
}
