package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the r16 monitor fold kernels: under ANY
  * arrival order and ANY batching, the summed signed deltas equal a
  * direct batch recompute over the full set — the algebraic heart of the
  * batch≡stream equivalence the harness specs pin on the fixture, here
  * exercised across hundreds of adversarial random histories (driver-side
  * only; no SparkSession). Sampling is seeded → deterministic.
  */
class MonitorFoldPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(911L + i)))

  // --- GrowthAccounting ---------------------------------------------------

  /** Batch recompute of the (week → state → count) ledger for ONE user's
    * week set, churn horizon applied by the caller.
    */
  private def growthBatch(weeks: Seq[Long]): Map[(Long, String), Int] = {
    val ws = weeks.distinct.sorted
    val states = ws.zipWithIndex.map { case (w, i) =>
      val st =
        if (i == 0) "new"
        else if (w - ws(i - 1) == 7) "retained"
        else "resurrected"
      (w, st)
    }
    val churn = ws.zipWithIndex.collect {
      case (w, i) if i + 1 >= ws.length || ws(i + 1) - w > 7 => (w + 7, "churned")
    }
    (states ++ churn).groupBy(identity).view.mapValues(_.size).toMap
  }

  /** Weeks on the 7-day grid (what date_trunc('week') produces), small
    * domain so retained/resurrected/churn transitions all occur.
    */
  private val weekSeq: Gen[List[Long]] =
    Gen.listOfN(12, Gen.choose(0L, 15L).map(_ * 7L))

  test("property: growth fold deltas sum to the batch ledger under any order/batching") {
    samples(weekSeq, 400).foreach { ws =>
      // random-ish deterministic arrival order + uneven batching
      val order = ws.zipWithIndex.sortBy { case (w, i) => (w * 31 + i * 17) % 13 }
        .map(_._1)
      var st = Array.empty[Long]
      val deltas = Seq.newBuilder[GrowthAccounting.Delta]
      order.grouped(3).foreach { chunk =>
        val (out, next) = GrowthAccounting.fold(st, chunk)
        deltas ++= out
        st = next
      }
      val summed = deltas.result()
        .groupBy(d => (d.week, d.state))
        .view.mapValues(_.map(_.delta).sum).filter(_._2 != 0).toMap
      assert(summed == growthBatch(ws), s"weeks=$ws order=$order")
      assert(st.toSeq == ws.distinct.sorted, "state diverged from the week set")
    }
  }

  // --- InterarrivalMonitor ------------------------------------------------

  /** Batch recompute: the exact gap multiset of the (t, id)-ordered
    * timeline.
    */
  private def gapBatch(obs: Seq[(Long, Long)]): Map[Long, Int] = {
    val sorted = obs.distinct.sorted
    sorted.sliding(2).collect { case Seq((t1, _), (t2, _)) => t2 - t1 }
      .toSeq.groupBy(identity).view.mapValues(_.size).toMap
  }

  /** Deliberately NOT distinct: at-least-once re-delivery of the same
    * (t, id) must be a fold no-op (the r16 review's duplicate guard) —
    * the batch recompute below distincts, so any phantom 0-gap or split
    * from a re-spliced duplicate fails the property.
    */
  private val obsSeq: Gen[List[(Long, Long)]] =
    Gen.listOfN(14, for {
      t <- Gen.choose(0L, 40L)
      id <- Gen.choose(0L, 9L)
    } yield (t, id))

  test("property: interarrival fold deltas reconstruct the exact gap multiset") {
    samples(obsSeq, 400).foreach { obs =>
      val order = obs.zipWithIndex
        .sortBy { case ((t, id), i) => (t * 7 + id * 5 + i * 11) % 17 }
        .map(_._1)
      var tl = InterarrivalMonitor.Timeline(Array.empty, Array.empty)
      val deltas = Seq.newBuilder[InterarrivalMonitor.GapDelta]
      order.grouped(4).foreach { chunk =>
        val (out, next) = InterarrivalMonitor.fold(tl, "t", chunk)
        deltas ++= out
        tl = next
      }
      val summed = deltas.result()
        .groupBy(_.gap_us)
        .view.mapValues(_.map(_.delta).sum).filter(_._2 != 0).toMap
      assert(summed == gapBatch(obs), s"obs=$obs order=$order")
      assert(tl.ts.toSeq == obs.distinct.sorted.map(_._1),
        "timeline diverged from the observation set")
    }
  }
}
