package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SPAN REMOVAL — the incremental face of the batch
  * `dedup_span_removal` / `dedup_span_savings` ledger
  * (ops/DedupQueries.scala `spanLedger`; the r15 verdict's ask #6): per
  * document, which 5-gram start positions are DUPLICATED (the gram
  * appears in ≥ 2 distinct documents corpus-wide), and the removal
  * verdict that follows from interval-merging the [i, i+4] spans those
  * starts cover.
  *
  * Duplication is MONOTONE under arrival — once a gram has two distinct
  * owner documents it never becomes unique again — so unlike
  * [[NoveltyMonitor]]'s ownership steals this topology needs NO
  * retractions: stage 1 (keyed by gram) holds the first document's
  * (doc, starts) until a second distinct document arrives, then flushes
  * BOTH documents' starts and every later arrival's immediately; emitted
  * `(doc, start)` rows are pure additions. Stage 2 (keyed by doc) folds
  * arriving starts into the document's sorted start set and re-emits the
  * interval-merge verdict — the same left-to-right fold as the batch
  * ledger's `aggregate` HOF, over the same 1-based position domain —
  * whenever the verdict can change. Update semantics: a consumer keeps
  * the LAST verdict per doc; the converged table equals the batch ledger
  * under any micro-batch split and any arrival order
  * (`StreamingSpanSpec` pins equality on the shared fixture).
  *
  * Scale: stage-1 state per gram is one (owner doc, starts) pair until
  * duplication resolves, then a single boolean — never a document list;
  * stage-2 state per doc is its own duplicated-start set plus token
  * lengths, bounded by the document's length (the bound the batch fold
  * already implies). Both stages shard by their key like any keyed
  * aggregate; nothing is proportional to corpus history except the gram
  * universe itself, the same bound the batch artifact carries.
  */
object SpanMonitor {

  /** One artifact-grain observation: document `doc_id` contains `gram`
    * starting at 1-based token positions `ps` (unique per (doc, gram)).
    */
  final case class PosObs(doc_id: Long, gram: String, ps: Seq[Int])

  /** Per-gram state: the sole owner so far (with its starts), or the
    * resolved-duplicated flag (owner starts cleared — O(1) from then on).
    */
  final case class GramSeen(firstDoc: Long, firstPs: Seq[Int], dup: Boolean)

  /** A duplicated 5-gram start inside one document (addition-only). */
  final case class StartDelta(doc_id: Long, start: Int)

  /** Document metadata as it enters the corpus: language + per-token
    * character lengths (the only projection of the text the verdict
    * arithmetic reads — mirrors the batch ledger's one `documents` scan).
    */
  final case class DocMeta(doc_id: Long, lang: String, tok_lens: Seq[Int])

  /** The per-document removal verdict — the batch ledger row. */
  final case class SpanVerdict(doc_id: Long, lang: String, n_toks: Long,
    n_removed: Long, removed_chars: Long, n_kept_spans: Long)

  /** Stage 1: append-mode stream of duplicated starts. A gram's first
    * document parks in state; the second distinct document flushes both
    * (and flips the gram to the O(1) `dup` state); later documents flush
    * on arrival.
    */
  def duplicatedStarts(obs: Dataset[PosObs]): Dataset[StartDelta] = {
    implicit val outEnc = Encoders.product[StartDelta]
    implicit val stateEnc = Encoders.product[GramSeen]
    implicit val strEnc = Encoders.STRING

    obs.groupByKey(_.gram)
      .flatMapGroupsWithState[GramSeen, StartDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_: String, rows: Iterator[PosObs], state: GroupState[GramSeen]) =>
          // the grain is unique per (doc, gram); fold replays defensively
          val batch = rows.toSeq.groupBy(_.doc_id).values.map(_.head).toSeq
          val out = Seq.newBuilder[StartDelta]
          def flush(doc: Long, ps: Seq[Int]): Unit =
            ps.foreach(i => out += StartDelta(doc, i))
          state.getOption match {
            case Some(st) if st.dup =>
              batch.foreach(r => flush(r.doc_id, r.ps))
            case prev =>
              val docs = (prev.map(st => st.firstDoc -> st.firstPs).toSeq ++
                batch.map(r => r.doc_id -> r.ps)).groupBy(_._1).values
                .map(_.head).toSeq
              if (docs.size >= 2) {
                docs.foreach { case (d, ps) => flush(d, ps) }
                state.update(GramSeen(docs.map(_._1).min, Nil, dup = true))
              } else docs.headOption.foreach { case (d, ps) =>
                if (!prev.exists(_.firstDoc == d))
                  state.update(GramSeen(d, ps, dup = false))
              }
          }
          out.result().iterator
      }
  }

  /** One stage-2 input event: either a document arrival or a duplicated
    * start (exactly one of `meta` / `start` is set). Union the two faces
    * with [[docEvents]] / [[startEvents]].
    */
  final case class SpanEvent(doc_id: Long, start: Int, lang: String,
    tok_lens: Seq[Int], is_doc: Boolean)

  def docEvents(docs: Dataset[DocMeta]): Dataset[SpanEvent] = {
    implicit val enc = Encoders.product[SpanEvent]
    docs.map(d => SpanEvent(d.doc_id, 0, d.lang, d.tok_lens, is_doc = true))
  }

  def startEvents(starts: Dataset[StartDelta]): Dataset[SpanEvent] = {
    implicit val enc = Encoders.product[SpanEvent]
    starts.map(s => SpanEvent(s.doc_id, s.start, null, Nil, is_doc = false))
  }

  /** Per-doc fold state: metadata (once arrived) + the duplicated-start
    * set so far.
    */
  final case class DocState(hasMeta: Boolean, lang: String,
    tok_lens: Seq[Int], starts: Seq[Int])

  /** Stage 2: the verdict stream. Emits a (re)computed verdict row for a
    * document whenever its metadata is present and this batch changed the
    * inputs — last row per doc wins. Starts arriving before their
    * document buffer silently (the backfill case).
    */
  def verdicts(events: Dataset[SpanEvent]): Dataset[SpanVerdict] = {
    implicit val outEnc = Encoders.product[SpanVerdict]
    implicit val stateEnc = Encoders.product[DocState]
    implicit val longEnc = Encoders.scalaLong

    events.groupByKey(_.doc_id)
      .flatMapGroupsWithState[DocState, SpanVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (doc: Long, rows: Iterator[SpanEvent], state: GroupState[DocState]) =>
          val batch = rows.toSeq
          val prev = state.getOption.getOrElse(DocState(false, null, Nil, Nil))
          val meta = batch.find(_.is_doc)
          val newStarts = batch.filter(!_.is_doc).map(_.start)
          val starts = (prev.starts ++ newStarts).distinct.sorted
          val next = DocState(
            prev.hasMeta || meta.isDefined,
            meta.map(_.lang).getOrElse(prev.lang),
            meta.map(_.tok_lens).getOrElse(prev.tok_lens),
            starts)
          val changed = next != prev
          if (changed) state.update(next)
          if (next.hasMeta && changed)
            Iterator.single(verdictOf(doc, next))
          else Iterator.empty
      }
  }

  /** The batch ledger's interval-merge fold, verbatim in Scala: each
    * start i covers 1-based token positions [i, i+4]; overlaps clip at
    * the last covered end; kept spans follow from run arithmetic on the
    * dense position domain (see `DedupQueries.spanLedger`).
    */
  private[streaming] def verdictOf(doc: Long, st: DocState): SpanVerdict = {
    var cnt = 0L; var chars = 0L; var lastEnd = -5; var runs = 0L
    st.starts.foreach { i =>
      if (i + 4 > lastEnd) {
        val from = math.max(i, lastEnd + 1)
        cnt += i + 4 - from + 1
        var p = from
        while (p <= i + 4) { chars += st.tok_lens(p - 1).toLong; p += 1 }
        if (i > lastEnd + 1) runs += 1
        lastEnd = i + 4
      }
    }
    val n = st.tok_lens.size
    val kept = runs + 1L -
      (if (st.starts.headOption.contains(1)) 1L else 0L) -
      (if (lastEnd == n) 1L else 0L)
    SpanVerdict(doc, st.lang, n.toLong, cnt, chars, kept)
  }
}
