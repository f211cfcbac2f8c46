package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** Semantic properties of the round-11 operators: Markov transitions,
  * CUSUM changepoints, the Gini histogram fold, min-label propagation,
  * and largest-remainder quota sampling. The DuckDB oracle proves value
  * equality against an independent engine; these pin the algebraic
  * invariants a refactor could break while staying self-consistent.
  */
class R11OpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("events_markov: transition mass accounts for every non-first event; rows are probability-complete") {
    val rows = run("events_markov").collect()
    val ev = Tables.events(spark, sfDir).select("user_id").collect()
    val nUsers = ev.map(_.getAs[Long]("user_id")).distinct.length
    // every event except each user's first contributes exactly one transition
    assert(rows.map(_.getAs[Long]("n")).sum == ev.length - nUsers)
    // per-source probabilities sum to ~1e6 (floor division loses < |dst| ppm)
    rows.groupBy(_.getAs[String]("src")).foreach { case (src, rs) =>
      val pSum = rs.map(_.getAs[Long]("p_ppm")).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length,
        s"src=$src p_ppm sum=$pSum")
    }
  }

  test("ts_changepoint: the reported peak matches a per-user brute-force CUSUM") {
    val rows = run("ts_changepoint").collect()
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"),
        math.floor(r.getAs[Double]("value") * 100 + 0.5).toLong))
    assert(rows.length == ev.map(_._1).distinct.length)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val series = ev.filter(_._1 == u).sortBy(e => (e._3.getTime, e._2))
      val s = series.map(_._4).sum
      val n = series.length.toLong
      var cs = 0L
      val scored = series.zipWithIndex.map { case (e, i) =>
        cs += e._4
        (math.abs(n * cs - (i + 1) * s), e._2, i + 1L)
      }
      val best = scored.maxBy(x => (x._1, -x._2))
      assert(r.getAs[Long]("cusum_stat") == best._1, s"user $u stat")
      assert(r.getAs[Long]("cp_event") == best._2, s"user $u event")
      assert(r.getAs[Long]("cp_pos") == best._3, s"user $u pos")
    }
  }

  test("agg_gini: histogram fold equals the sorted-rank brute force") {
    val rows = run("agg_gini").collect()
    val ev = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"),
        math.floor(r.getAs[Double]("value") * 100 + 0.5).toLong))
    rows.foreach { r =>
      val g = r.getAs[String]("event_type")
      val xs = ev.filter(_._1 == g).map(_._2).sorted
      val n = xs.length.toLong
      val s = xs.sum
      val ranksum = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val want = ((2 * ranksum - (n + 1) * s) * 1000000L) / (n * s)
      assert(r.getAs[Long]("n") == n, s"$g n")
      assert(r.getAs[Long]("gini_ppm") == want, s"$g gini")
      assert(want >= 0L && want < 1000000L, s"$g bounds")
    }
  }

  test("agg_moments: standardized moments match a driver-side exact recount") {
    val rows = run("agg_moments").collect()
    val ev = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"),
        math.floor(r.getAs[Double]("value") * 100 + 0.5).toLong))
    rows.foreach { r =>
      val g = r.getAs[String]("event_type")
      val xs = ev.filter(_._1 == g).map(_._2.toDouble)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      def cm(k: Int) = xs.map(x => math.pow(x - mu, k)).sum / n
      val (m2, m3, m4) = (cm(2), cm(3), cm(4))
      assert(r.getAs[Long]("n") == xs.length.toLong, s"$g n")
      assert(math.abs(r.getAs[Double]("skew_r") - m3 / (m2 * math.sqrt(m2))) < 1e-3, s"$g skew")
      assert(math.abs(r.getAs[Double]("exkurt_r") - (m4 / (m2 * m2) - 3.0)) < 1e-3, s"$g kurt")
    }
  }

  test("agg_hhi: ppm concentration matches the share-squared recount and its bounds") {
    val rows = run("agg_hhi").collect()
    val docs = Tables.documents(spark, sfDir).select("lang", "source").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val bySource = docs.filter(_._1 == lang).groupBy(_._2).view.mapValues(_.length.toLong)
      val n = bySource.values.sum
      val want = (bySource.values.map(x => x * x).sum * 1000000L) / (n * n)
      assert(r.getAs[Long]("n") == n, s"$lang n")
      assert(r.getAs[Long]("hhi_ppm") == want, s"$lang hhi")
      // HHI floor is 1e6/k for k sources (floor-division slack ≤ 1)
      assert(want >= 1000000L / bySource.size - 1 && want <= 1000000L, s"$lang bounds")
    }
  }

  test("agg_ks_drift / agg_mannwhitney: every arm pair matches its brute-force recount") {
    // r12: the drift pair generalized to ALL pairs of arms — the recount
    // now covers every returned row (the r11 verdict's ask: at least a
    // second pair), plus the pair-inventory shape itself.
    val ev = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"),
        math.floor(r.getAs[Double]("value") * 100 + 0.5).toLong))
    val byArm = ev.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val nArms = byArm.size
    val wantPairs = (for {
      x <- byArm.keys; y <- byArm.keys if x < y
    } yield (x, y)).toSet

    val ksRows = run("agg_ks_drift").collect()
    assert(ksRows.length == nArms * (nArms - 1) / 2, s"expected C($nArms,2) KS rows")
    assert(ksRows.map(r => (r.getAs[String]("arm_a"), r.getAs[String]("arm_b"))).toSet
      == wantPairs)
    ksRows.foreach { ks =>
      val a = byArm(ks.getAs[String]("arm_a"))
      val b = byArm(ks.getAs[String]("arm_b"))
      val (n1, n2) = (a.length.toLong, b.length.toLong)
      // brute-force D over every distinct value
      val dMax = (a ++ b).distinct.map { v =>
        math.abs(a.count(_ <= v) * n2 - b.count(_ <= v) * n1)
      }.max
      assert(ks.getAs[Long]("n_a") == n1 && ks.getAs[Long]("n_b") == n2)
      assert(ks.getAs[Long]("ks_ppm") == dMax * 1000000L / (n1 * n2),
        s"ks value ${ks.getAs[String]("arm_a")}/${ks.getAs[String]("arm_b")}")
      val atV = ks.getAs[Long]("ks_at_cents")
      assert(math.abs(a.count(_ <= atV) * n2 - b.count(_ <= atV) * n1) == dMax, "argmax")
    }

    val mwRows = run("agg_mannwhitney").collect()
    assert(mwRows.map(r => (r.getAs[String]("arm_a"), r.getAs[String]("arm_b"))).toSet
      == wantPairs)
    mwRows.foreach { mw =>
      val a = byArm(mw.getAs[String]("arm_a"))
      val b = byArm(mw.getAs[String]("arm_b"))
      val (n1, n2) = (a.length.toLong, b.length.toLong)
      // midrank rank-sum over the combined sample, 2x-scaled to stay exact
      val all = (a.map((_, 1)) ++ b.map((_, 0))).sortBy(_._1)
      val r1x2 = all.groupBy(_._1).map { case (v, g) =>
        val cum = all.count(_._1 < v).toLong
        val c = g.length.toLong
        g.count(_._2 == 1).toLong * (2 * cum + c + 1)
      }.sum
      assert(mw.getAs[Long]("u1_x2") == r1x2 - n1 * (n1 + 1), "U statistic")
      val u1 = (r1x2 - n1 * (n1 + 1)) / 2.0
      val zWant = (u1 - n1.toDouble * n2 / 2.0) /
        math.sqrt(n1.toDouble * n2 * (n1 + n2 + 1) / 12.0)
      assert(math.abs(mw.getAs[Double]("z_r") - zWant) < 1e-3, "z")
    }
  }

  test("graph_label_prop: labels partition the vertex set and only shrink") {
    val rows = run("graph_label_prop").collect()
    val nNodes = run("graph_degree_dist").collect()
      .map(_.getAs[Long]("n_nodes")).sum
    assert(rows.map(_.getAs[Long]("n_members")).sum == nNodes)
    // 3 rounds of min-propagation strictly reduce the label count on any
    // graph with at least one edge
    assert(rows.length < nNodes)
    assert(rows.map(_.getAs[Long]("lbl")).distinct.length == rows.length)
  }

  test("pipeline_quota_sample: largest-remainder allocation is exact and the pick is the hash top-k") {
    val rows = run("pipeline_quota_sample").collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), sha2(col("text"), 256).as("h"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("h")))
    // quotas sum to exactly the budget (the whole point of largest remainder)
    assert(rows.map(_.getAs[Long]("quota")).sum == 1000L)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val inStratum = docs.filter(_._2 == src)
      assert(r.getAs[Long]("n_s") == inStratum.length.toLong, s"$src n_s")
      val q = r.getAs[Long]("quota").toInt
      val picked = inStratum.sortBy(d => (d._3, d._1)).take(q)
      assert(r.getAs[Long]("n_sampled") == picked.length.toLong, s"$src n_sampled")
      assert(r.getAs[Long]("sum_doc_ids") == picked.map(_._1).sum, s"$src selection")
    }
  }

  test("bounded top-k aggregate: state never exceeds k and output is the exact rank order") {
    // The O(k)-per-task-state claim behind knnTop3, the PQ shortlist and
    // pipeline_quota_sample's per-stratum pick (r12, ADVICE — the r11
    // collect_list formulation buffered whole partition-strata before
    // truncating): fold 100k shuffled values through the collector and pin
    // the LARGEST buffer ever observed, not just the final size.
    import org.apache.spark.sql.catalyst.expressions.aggregate.TopKBufferProbe
    val values = new scala.util.Random(7).shuffle((1L to 100000L).toVector)
    val (maxTop, topOut) = TopKBufferProbe.maxBufferSize(values, 5, reverse = false)
    assert(maxTop == 5, s"top-k buffer grew to $maxTop")
    assert(topOut == Seq(100000L, 99999L, 99998L, 99997L, 99996L))
    val (maxBot, botOut) = TopKBufferProbe.maxBufferSize(values, 5, reverse = true)
    assert(maxBot == 5, s"bottom-k buffer grew to $maxBot")
    assert(botOut == Seq(1L, 2L, 3L, 4L, 5L))
  }
}
