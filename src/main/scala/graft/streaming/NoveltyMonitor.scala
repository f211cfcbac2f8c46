package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming N-GRAM NOVELTY — the incremental face of the batch
  * `text_ngram_novelty` query (ops/TextQueries.scala; the r14 verdict's
  * ask #5): per document, how many of its 5-gram positions are FIRST
  * EXPOSURE — grams owned by this document, where a gram's owner is the
  * minimum doc_id carrying it.
  *
  * First-exposure novelty is inherently arrival-ordered, but a stream
  * cannot assume doc_id order: a late-arriving older document (backfill,
  * replay) must STEAL ownership of every gram it shares with younger docs
  * already credited. The topology therefore keys state by GRAM and emits
  * DELTA rows, the same retraction discipline as [[PowerUsers]]:
  *
  *   - every observed (doc, gram, c) row emits a presence delta
  *     `(doc, +c, 0, 0)` — the per-doc gram-position total is
  *     ownership-independent;
  *   - the gram's owner is folded as min(state.owner, batch min); when it
  *     changes from `o` (count c_o) to `o'` (count c_o'), the fold emits
  *     `(o, 0, −c_o, −1)` and `(o', 0, +c_o', +1)` — exactly one live
  *     ownership row per gram at any time.
  *
  * Downstream, per-doc novelty is an ordinary streaming SUM of the deltas;
  * retractions cancel stolen credit exactly, in any micro-batch split and
  * any arrival order, so the converged table equals the batch query
  * (`StreamingNoveltySpec` pins equality on the shared fixture, including
  * the recomputed ppm). The input grain is the SAME (doc_id, gram, c)
  * grain the batch face reads from the session 5-gram artifact
  * ([[graft.ops.GramIndex]]) — one definition of "a document's grams" on
  * both sides.
  *
  * Scale: state per gram is ONE (owner, count) pair — O(1), not O(docs
  * seen); the state store shards by gram like any keyed stage, and the
  * downstream sum shards by doc. Nothing here is proportional to corpus
  * history except the gram-key universe itself, the same bound the batch
  * artifact carries.
  */
object NoveltyMonitor {

  /** One observation: document `doc_id` contains `gram` at `c` positions.
    * The grain is unique per (doc, gram) — the artifact grain.
    */
  final case class GramObs(doc_id: Long, gram: String, c: Long)

  /** Per-gram state: current owner (min doc_id seen) + its position count. */
  final case class OwnerState(owner: Long, c: Long)

  /** Signed contributions to one document's novelty row. */
  final case class Delta(doc_id: Long, d_pos: Long, d_novel_pos: Long,
    d_novel_grams: Long)

  /** Append-mode delta stream: presence rows for every observation plus a
    * retract/assert pair whenever a gram's ownership resolves or moves.
    */
  def deltas(obs: Dataset[GramObs]): Dataset[Delta] = {
    implicit val outEnc = Encoders.product[Delta]
    implicit val stateEnc = Encoders.product[OwnerState]
    implicit val strEnc = Encoders.STRING

    obs.groupByKey(_.gram)
      .flatMapGroupsWithState[OwnerState, Delta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_: String, rows: Iterator[GramObs], state: GroupState[OwnerState]) =>
          val batch = rows.toSeq
          val out = Seq.newBuilder[Delta]
          batch.foreach(r => out += Delta(r.doc_id, r.c, 0L, 0L))
          val bmin = batch.minBy(_.doc_id)
          val prev = state.getOption
          val next = prev match {
            case Some(st) if st.owner <= bmin.doc_id => st
            case _ => OwnerState(bmin.doc_id, bmin.c)
          }
          if (!prev.contains(next)) {
            prev.foreach(st => out += Delta(st.owner, 0L, -st.c, -1L))
            out += Delta(next.owner, 0L, next.c, 1L)
            state.update(next)
          }
          out.result().iterator
      }
  }

  /** The per-doc novelty table as an ordinary streaming sum over the
    * deltas (update-mode downstream aggregation); novelty_ppm is integer
    * arithmetic over the summed columns, recomputable by any consumer.
    */
  def novelty(d: Dataset[Delta]): DataFrame = {
    import org.apache.spark.sql.functions._
    d.groupBy(col("doc_id"))
      .agg(sum(col("d_pos")).as("n_grams"),
        sum(col("d_novel_pos")).as("n_novel_pos"),
        sum(col("d_novel_grams")).as("n_novel_grams"))
  }
}
