package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CONNECTED COMPONENTS — the incremental face of the batch
  * `graph_components` min-label fixpoint (ops/GraphQueries.scala
  * `componentLabels`; the r16 verdict's ask #6): under EDGE ARRIVALS,
  * every node's component label converges to the minimum node id
  * reachable from it, exactly the batch recurrence.
  *
  * This is the canonical MONOTONE streaming fixpoint: labels only ever
  * DECREASE (an edge can merge two components, never split one), so —
  * like [[SpanMonitor]]'s duplication flag and unlike
  * [[NoveltyMonitor]]'s ownership steals — no retractions exist. The
  * topology is the batch DELTA ROUND made event-driven:
  *
  *   - state is keyed by NODE: (current label, adjacency so far) — the
  *     same |V| labels + 2|E| adjacency the batch loop shuffles, sharded
  *     by the grouping key instead;
  *   - an edge (u, v) arrives at BOTH endpoint groups (u learns neighbor
  *     v and takes min(label, v); v symmetrically — each node id is an
  *     upper bound on its own component minimum, so folding a neighbor
  *     ID is sound and seeds the propagation);
  *   - whenever a node's label DROPS (a new neighbor, or a HINT carrying
  *     a neighbor's smaller label), the fold emits a verdict update for
  *     itself plus one hint per neighbor — the hint stream is the batch
  *     round's changed-label frontier, and it FEEDS BACK into the input
  *     (in production: a loop topic on the bus, the standard
  *     delta-iteration-over-a-queue layout; in the spec: re-injected
  *     MemoryStream batches). A new neighbor additionally gets our
  *     current label even when nothing dropped — the edge's other
  *     delivery covers the reverse direction.
  *
  * Convergence = a batch that produces no hints; at that point the
  * min-label recurrence has no enabled rule, which IS the batch
  * fixpoint, so the LAST verdict per node equals `graph_components`
  * under any micro-batch split, any arrival order, and any hint
  * re-injection schedule (`StreamingComponentsSpec` pins it, duplicate
  * edge re-delivery included — a known neighbor with no label change is
  * a state no-op, and a stale hint ≥ the current label is dropped by
  * the min fold).
  *
  * Scale: state per node is its own adjacency (Σ = 2|E|, the batch
  * bound; a hub holds its degree — the same hub that dominates the
  * batch shuffle). Hints per round are bounded by (changed nodes ×
  * their degree) — precisely the candidate mass the batch delta round's
  * `deltaCandMaxRows` guard prices; emissions are per-change, never
  * per-state.
  */
object ComponentsMonitor {

  /** An undirected edge arrival (self-loops are dropped at the fan-out —
    * the batch edge universe has none, and min(label, self) never
    * drops).
    */
  final case class EdgeArrival(u: Long, v: Long)

  /** One keyed input event: an edge face (`other` = the neighbor id) or
    * a label hint (`hintLab` = a neighbor's label; `other` unused).
    */
  final case class NodeEvent(node: Long, other: Long, hintLab: Long,
    isEdge: Boolean)

  /** Per-node state: the best label so far, the adjacency seen, and
    * whether a verdict has been emitted (a node whose FIRST contact is a
    * hint that does not beat its own id must still verdict itself when
    * its edge arrives — without the flag that node would stay silent
    * forever if its label never drops again).
    */
  final case class NodeState(label: Long, neighbors: Seq[Long],
    emitted: Boolean)

  /** An output row: a VERDICT (this node's label changed — update
    * semantics, last wins) or a HINT addressed to `node` carrying
    * `label` (the feedback face — re-inject as
    * `NodeEvent(node, 0, label, isEdge = false)`).
    */
  final case class Emit(node: Long, label: Long, isVerdict: Boolean)

  /** Fan an edge stream out to its two endpoint deliveries (self-loops
    * dropped — see [[EdgeArrival]]).
    */
  def edgeEvents(edges: Dataset[EdgeArrival]): Dataset[NodeEvent] = {
    implicit val enc = Encoders.product[NodeEvent]
    edges.flatMap(e =>
      if (e.u == e.v) Seq.empty
      else Seq(
        NodeEvent(e.u, e.v, Long.MaxValue, isEdge = true),
        NodeEvent(e.v, e.u, Long.MaxValue, isEdge = true)))
  }

  /** Re-inject a drained hint as its keyed event (the spec's loop leg —
    * in production the hint topic's consumer side).
    */
  def hintEvents(hints: Dataset[Emit]): Dataset[NodeEvent] = {
    implicit val enc = Encoders.product[NodeEvent]
    hints.map(h => NodeEvent(h.node, 0L, h.label, isEdge = false))
  }

  /** The keyed fold: min-label ownership with union-by-min adjacency
    * propagation. Emits verdicts for this node and hints for neighbors.
    */
  def step(events: Dataset[NodeEvent]): Dataset[Emit] = {
    implicit val outEnc = Encoders.product[Emit]
    implicit val stateEnc = Encoders.product[NodeState]
    implicit val longEnc = Encoders.scalaLong

    events.groupByKey(_.node)
      .flatMapGroupsWithState[NodeState, Emit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (node: Long, rows: Iterator[NodeEvent], state: GroupState[NodeState]) =>
          val batch = rows.toSeq
          val prev = state.getOption
          val prevLabel = prev.map(_.label).getOrElse(node)
          val prevN = prev.map(_.neighbors.toSet).getOrElse(Set.empty[Long])
          val emittedBefore = prev.exists(_.emitted)
          val arrivedN = batch.filter(e => e.isEdge && e.other != node)
            .map(_.other).toSet
          val newN = arrivedN -- prevN
          val hintMin = batch.filter(!_.isEdge).map(_.hintLab)
            .foldLeft(Long.MaxValue)(math.min)
          // a neighbor's ID is itself a sound label bound — folding it
          // seeds propagation one round earlier than waiting for a hint
          val neighborMin =
            if (arrivedN.isEmpty) Long.MaxValue else arrivedN.min
          val label = math.min(prevLabel, math.min(hintMin, neighborMin))
          val allN = prevN ++ newN
          val dropped = label < prevLabel
          // universe membership ⟺ some incident edge seen ⟺ a neighbor
          // exists (self-loops never enter); a hint-only node holds
          // state but no verdict until its edge delivery lands
          val verdict = allN.nonEmpty && (dropped || !emittedBefore)
          val out = Seq.newBuilder[Emit]
          if (verdict) out += Emit(node, label, isVerdict = true)
          if (dropped) {
            // the changed-label frontier: every neighbor hears the drop
            allN.foreach(nb => out += Emit(nb, label, isVerdict = false))
          } else {
            // label held, but brand-new neighbors still need our label
            // (their own delivery of the edge folds OUR id; the hint
            // carries the possibly-smaller LABEL)
            newN.foreach(nb => out += Emit(nb, label, isVerdict = false))
          }
          if (dropped || newN.nonEmpty || verdict || prev.isEmpty)
            state.update(NodeState(label, allN.toSeq,
              emittedBefore || verdict))
          out.result().iterator
      }
  }
}
