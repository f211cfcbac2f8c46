package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import scala.collection.mutable

import graft.functions.SpaceSaving

/** Streaming heavy hitters — the batch `space_saving_topk` aggregate
  * (`text_heavy_hitters`) as continuously maintained keyed state, so a live
  * term stream reports its top-k per group every micro-batch instead of on
  * re-scan. The trending-terms / hot-keys monitor a corpus-ingest pipeline
  * runs next to its quality filters.
  *
  * The state IS the batch sketch's O(k) counter summary — the SAME kernel
  * (`graft.functions.SpaceSaving`: one eviction rule, one reporting order),
  * folded across micro-batches in arrival order. Consequences, which
  * `StreamingTopKSpec` pins:
  *
  *   - in the exact regime (distinct items per group never exceed k) the
  *     streamed summary equals the batch aggregate's under ANY batch split
  *     — counts are exact, err = 0;
  *   - in the approximate regime the sketch guarantees hold at every
  *     trigger (cnt overestimates by at most err; any item with true count
  *     > N/k so far is present), while the exact counter values may depend
  *     on arrival order — inherent to SpaceSaving, same caveat as the batch
  *     aggregate's partial-merge order.
  *
  * State is O(k) per group forever — no watermark needed for boundedness;
  * groups that go quiet simply stop being emitted (update mode emits only
  * the keys each batch touched).
  */
object StreamingTopK {

  final case class Item(group: String, term: String)

  final case class TopKState(items: Map[String, (Long, Long)])

  final case class Entry(item: String, cnt: Long, err: Long)

  final case class TopK(group: String, summary: Seq[Entry])

  /** Per-group SpaceSaving top-k, updated every micro-batch. */
  def topK(items: Dataset[Item], k: Int): Dataset[TopK] = {
    implicit val outEnc = Encoders.product[TopK]
    implicit val stateEnc = Encoders.product[TopKState]
    implicit val strEnc = Encoders.STRING
    items
      .groupByKey(_.group)
      .mapGroupsWithState[TopKState, TopK](GroupStateTimeout.NoTimeout()) {
        case (group: String, rows: Iterator[Item], state: GroupState[TopKState]) =>
          val buf: SpaceSaving.Buf =
            mutable.HashMap(state.getOption.map(_.items.toSeq).getOrElse(Nil): _*)
          rows.foreach(r => SpaceSaving.insert(buf, r.term, k))
          state.update(TopKState(buf.toMap))
          TopK(group, SpaceSaving.sorted(buf).map(Entry.tupled))
      }
  }
}
