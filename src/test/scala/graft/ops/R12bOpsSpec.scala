package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}

/** Semantic properties of the second round-12 batch: HITS hub/authority
  * scores, tombstone GC verdicts, the Theil inequality index, NDCG@10,
  * and the Kaplan-Meier survival curve. The DuckDB oracle proves value
  * equality against an independent engine; these pin each operator
  * against an in-memory brute force that shares no code with the
  * distributed plan.
  */
class R12bOpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def events(): Array[(Long, java.sql.Timestamp, Long, String, Double)] =
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))

  test("graph_hits: two power-iteration rounds match the brute force, hubs vs authorities") {
    val sp = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val a1 = sp.groupBy(_._2).map { case (p, es) => p -> es.size.toLong }
    val h1 = sp.groupBy(_._1).map { case (s, es) =>
      s -> es.map(e => BigInt(a1(e._2))).sum
    }
    val a2 = sp.groupBy(_._2).map { case (p, es) =>
      p -> es.map(e => h1(e._1)).sum
    }
    val expected =
      (h1.toSeq.map { case (n, sc) => ("hub", n, sc.toLong) } ++
        a2.toSeq.map { case (n, sc) => ("authority", n, sc.toLong) })
        .sortBy { case (side, n, sc) => (side, -sc, n) }
    val got = run("graph_hits").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("cdc_tombstone_gc: every verdict matches the brute-force replay rule") {
    val ev = events()
    val wm = ev.map(_._1).max * 3 / 4
    val expected = ev.groupBy(_._3).flatMap { case (pk, es) =>
      val dels = es.filter(_._4 == "error").map(_._1)
      if (dels.isEmpty) None
      else {
        val lastDel = dels.max
        val lastAny = es.map(_._1).max
        val action =
          if (lastAny > lastDel) "keep_revived"
          else if (lastDel <= wm) "purge"
          else "retain"
        Some((pk, lastDel, dels.length.toLong, lastAny > lastDel, action, wm))
      }
    }.toSeq.sortBy(_._1)
    val got = run("cdc_tombstone_gc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getString(4), r.getLong(5))).toSeq
    assert(got == expected)
    // The fixture exercises all three verdicts or the test is vacuous.
    assert(expected.map(_._5).distinct.size >= 2)
  }

  test("agg_theil: per-arm index matches the brute force and is non-negative") {
    val ev = events()
    val expected = ev.groupBy(_._4).map { case (g, es) =>
      val cents = es.map(e => math.floor(e._5 * 100 + 0.5).toLong)
      val n = cents.length.toLong
      val sv = cents.sum
      val sumNs = cents.map { c =>
        if (c == 0L) 0L
        else math.round(c.toDouble * math.log(c.toDouble * n / sv) * 1e9)
      }.sum
      (g, n, sumNs / sv)
    }.toSeq.sortBy(_._1)
    val got = run("agg_theil").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.forall(_._3 >= 0L), "Theil is non-negative by Jensen")
  }

  test("text_ndcg: DCG/IDCG match the brute-force ranking and NDCG <= 1") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val avgdl = docs.map(_._2.length.toDouble).sum / docs.length
    val terms = Seq("table", "spark", "merge")
    val expected = terms.flatMap { t =>
      val cand = docs.flatMap { case (id, toks) =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val dl = toks.length.toDouble
          val scoreUs = math.round(
            tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6)
          Some((id, scoreUs, math.min(tf, 3.0).toLong))
        }
      }
      if (cand.isEmpty) None
      else {
        def dcg(ordered: Seq[(Long, Long, Long)]): Long =
          ordered.take(10).zipWithIndex.map { case ((_, _, rel), i) =>
            math.round((math.pow(2.0, rel.toDouble) - 1.0)
              / (math.log(i + 2.0) / math.log(2.0)) * 1e6)
          }.sum
        val byScore = cand.sortBy { case (id, s, _) => (-s, id) }.toSeq
        val byRel = cand.sortBy { case (id, _, r) => (-r, id) }.toSeq
        val d = dcg(byScore)
        val i = dcg(byRel)
        Some((t, math.min(cand.length, 10).toLong, d, i,
          BigDecimal(d.toDouble / i)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.sortBy(_._1)
    val got = run("text_ndcg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    assert(got.forall(_._5 <= 1.0), "realized DCG cannot beat the ideal")
  }

  private def md5hexOf(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Brute co-purchase edge set (u < v) and sorted adjacency. */
  private def copurchase(): (Set[(Long, Long)], Map[Long, Seq[Long]]) = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).distinct.sorted }
    (edges, adj)
  }

  test("graph_random_walk: every step matches the brute md5-ranked walk; steps are real edges") {
    val (_, adj) = copurchase()
    def fold16(h: String): Long = {
      val hex = "0123456789abcdef"
      (0 until 4).map(i => hex.indexOf(h(i)).toLong * math.pow(16, 3 - i).toLong).sum
    }
    def pick(start: Long, t: Int, cur: Long): Long = {
      val ns = adj(cur)
      val r = fold16(md5hexOf(s"walk:$start:$t:$cur")) % ns.length
      ns(r.toInt)
    }
    val expected = adj.keys.toSeq.sorted.map { start =>
      val s1 = pick(start, 1, start)
      val s2 = pick(start, 2, s1)
      val s3 = pick(start, 3, s2)
      (start, s1, s2, s3)
    }
    val got = run("graph_random_walk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // every hop is an actual edge of the graph
    assert(got.forall { case (s0, s1, s2, s3) =>
      adj(s0).contains(s1) && adj(s1).contains(s2) && adj(s2).contains(s3)
    })
  }

  test("graph_betweenness_2hop: per-middleman credit matches the brute geodesic count") {
    val (edges, adj) = copurchase()
    val wedges = adj.toSeq
      .filter(_._2.size <= 64)
      .flatMap { case (m, ns) =>
        for {
          i <- ns.indices; j <- i + 1 until ns.length
          if !edges.contains((ns(i), ns(j)))
        } yield (m, ns(i), ns(j))
      }
    val sigma = wedges.groupBy(w => (w._2, w._3)).view.mapValues(_.size.toLong)
    val expected = wedges.groupBy(_._1).toSeq.map { case (m, ws) =>
      (m, ws.size.toLong, ws.map(w => 1000000L / sigma((w._2, w._3))).sum)
    }.sortBy { case (m, _, ppm) => (-ppm, m) }.take(20)
    val got = run("graph_betweenness_2hop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .map { case (n, w, p) => (n, w, p) }
    assert(got.map(t => (t._1, t._3)) == expected.map(t => (t._1, t._3)))
    assert(got == expected)
  }

  test("events_cohort_ltv: cells and running LTV match the brute cohort matrix") {
    val ev = events()
    val day = 86400000L
    val rows = ev.map(e => (e._3, e._2.getTime / day,
      math.floor(e._5 * 100 + 0.5).toLong))
    val cohort = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = rows
      .map { case (u, d, c) => (cohort(u), d - cohort(u), u, c) }
      .filter(_._2 <= 7L)
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((cd, off), es) =>
        (cd, off, es.map(_._3).distinct.length.toLong, es.map(_._4).sum)
      }
      .sortBy(t => (t._1, t._2))
    val expected = cells.groupBy(_._1).toSeq.flatMap { case (_, cs) =>
      cs.sortBy(_._2).scanLeft((0L, 0L, 0L, 0L, 0L)) { case (acc, c) =>
        (c._1, c._2, c._3, c._4, acc._5 + c._4)
      }.drop(1)
    }.sortBy(t => (t._1, t._2))
    val got = run("events_cohort_ltv").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("ts_drawdown: trough and depth match the brute detrended walk; drawdown is positive") {
    val ev = events()
    val day = 86400000L
    val expected = ev.groupBy(_._4).toSeq.map { case (g, es) =>
      val daily = es.groupBy(_._2.getTime / day).view
        .mapValues(_.map(e => math.floor(e._5 * 100 + 0.5).toLong).sum)
        .toSeq.sortBy(_._1)
      val n = daily.length.toLong
      val s = daily.map(d => BigInt(d._2)).sum
      var equity = BigInt(0)
      var peak = BigInt(0)
      var best = (BigInt(-1), 0L)
      daily.zipWithIndex.foreach { case ((d, c), i) =>
        equity += BigInt(c) * n - s
        if (i == 0 || equity > peak) peak = equity
        val dd = peak - equity
        if (dd > best._1) best = (dd, d)
      }
      (g, n, (best._1 / n).toLong, best._2)
    }.sortBy(_._1)
    val got = run("ts_drawdown").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDate(3).toLocalDate.toEpochDay)).toSeq
    assert(got == expected)
    assert(got.forall(_._3 > 0L), "the detrended curve must actually draw down")
  }

  test("ts_forecast_eval: MAE/MASE match the brute seasonal-naive backtest") {
    val ev = events()
    val day = 86400000L
    val daily = ev.groupBy(e => (e._4, e._2.getTime / day))
      .view.mapValues(_.map(e => math.floor(e._5 * 100 + 0.5).toLong).sum)
      .toMap
    val expected = daily.keys.map(_._1).toSeq.distinct.sorted.flatMap { g =>
      val evalDays = daily.keys.filter(_._1 == g).map(_._2)
        .filter(d => daily.contains((g, d - 1)) && daily.contains((g, d - 7)))
        .toSeq.sorted
      if (evalDays.isEmpty) None
      else {
        val sae1 = evalDays.map(d => BigInt((daily((g, d)) - daily((g, d - 1))).abs).abs).sum
        val sae7 = evalDays.map(d => BigInt((daily((g, d)) - daily((g, d - 7))).abs).abs).sum
        val n = evalDays.length.toLong
        Some((g, n, (sae1 / n).toLong, (sae7 / n).toLong,
          (sae7 * 1000000 / sae1).toLong))
      }
    }
    val got = run("ts_forecast_eval").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("text_heaps_law: the one-scan b_min curve equals the 10-rescan brute prefixes") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    // The brute computes each prefix's token count and vocab by
    // RE-SCANNING the prefix — the O(10·corpus) formulation the query's
    // single-scan b_min trick must reproduce exactly.
    val curve = (0 to 9).map { t =>
      val prefix = docs.filter(d => d._1 % 10 <= t)
      val toks = prefix.flatMap(_._2)
      (t.toLong, toks.length.toLong, toks.distinct.length.toLong)
    }
    val (_, t0, v0) = curve.head
    val expected = curve.map { case (b, tc, vc) =>
      val beta =
        if (b == 0L) null
        else java.lang.Double.valueOf(
          BigDecimal(math.log(vc.toDouble / v0) / math.log(tc.toDouble / t0))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
      (b, tc, vc, beta)
    }
    val got = run("text_heaps_law").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
      .toSeq
    assert(got == expected)
    // vocabulary growth is monotone and sub-linear on this fixture
    assert(got.map(_._3) == got.map(_._3).sorted)
  }

  test("agg_bootstrap_ci: replicate means match the brute-force hash bootstrap; CI brackets the mean") {
    val ev = events()
    def weight(eventId: Long, b: Int): Long = {
      val h = md5hexOf(s"boot:$eventId:0") + md5hexOf(s"boot:$eventId:1")
      val hex = "0123456789abcdef"
      val u = hex.indexOf(h(2 * b - 2)) * 16 + hex.indexOf(h(2 * b - 1))
      if (u < 94) 0L else if (u < 188) 1L else if (u < 235) 2L
      else if (u < 251) 3L else 4L
    }
    val expected = ev.groupBy(_._4).toSeq.map { case (g, es) =>
      val cs = es.map(e => (e._1, math.floor(e._5 * 100 + 0.5).toLong))
      val n = cs.length.toLong
      val meanPpm = (BigInt(cs.map(_._2).sum) * 1000000 / n).toLong
      val ms = (1 to 32).map { b =>
        val (swc, sw) = cs.foldLeft((BigInt(0), 0L)) { case ((a, w), (id, c)) =>
          val wi = weight(id, b)
          (a + BigInt(wi) * c, w + wi)
        }
        (swc * 1000000 / sw).toLong
      }.sorted
      (g, n, meanPpm, ms(1), ms(30))
    }.sortBy(_._1)
    val got = run("agg_bootstrap_ci").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.forall(r => r._4 <= r._3 && r._3 <= r._5),
      "the rank CI must bracket the full-sample mean on this fixture")
  }

  test("agg_ttest_welch: t and df match the brute Welch computation; sign is antisymmetric") {
    val ev = events()
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val st = ev.groupBy(_._4).toSeq.map { case (g, es) =>
      val cs = es.map(e => math.floor(e._5 * 100 + 0.5).toLong)
      val n = cs.length.toDouble
      val s1 = cs.sum.toDouble
      val s2 = cs.map(c => c * c).sum.toDouble
      val mu = s1 / n
      val v = (s2 - s1 * s1 / n) / (n - 1.0)
      (g, cs.length.toLong, mu, v, v / n)
    }.sortBy(_._1)
    val expected = for {
      a <- st; b <- st if a._1 < b._1
    } yield {
      val se2 = a._5 + b._5
      (a._1, b._1, a._2, b._2, r4((a._3 - b._3) / math.sqrt(se2)),
        r2(se2 * se2 / (a._5 * a._5 / (a._2 - 1.0) + b._5 * b._5 / (b._2 - 1.0))))
    }
    val got = run("agg_ttest_welch").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected)
  }

  test("cdc_checksum_diff: chunk verdicts match the brute ledger compare") {
    val rows = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Number](2).longValue(), r.getDouble(3), r.getString(4)))
    def fold(h: String): Long =
      (1 to 32).map(i => h(i - 1).toInt.toLong * i).sum
    def ledger(replica: Boolean): Map[Long, (Long, Long)] =
      rows.filter(r => !replica || r._1 % 131 != 0)
        .map { case (k, nm, nk, bal, seg) =>
          val cents = math.floor(bal * 100 + 0.5).toLong +
            (if (replica && k % 97 == 0) 1L else 0L)
          (k / 100, fold(md5hexOf(s"$k|$nm|$nk|$cents|$seg")))
        }
        .groupBy(_._1).view
        .mapValues(vs => (vs.length.toLong, vs.map(_._2).sum)).toMap
    val m = ledger(replica = false)
    val r = ledger(replica = true)
    val expected = (m.keySet ++ r.keySet).toSeq.sorted.map { b =>
      val status = (m.get(b), r.get(b)) match {
        case (None, _) => "replica_only"
        case (_, None) => "master_only"
        case (Some((nm, _)), Some((nr, _))) if nm != nr => "count_mismatch"
        case (Some((_, cm)), Some((_, cr))) if cm != cr => "checksum_mismatch"
        case _ => "ok"
      }
      (b, status)
    }
    val got = run("cdc_checksum_diff").collect()
      .map(r2 => (r2.getLong(0), r2.getString(5))).toSeq
    assert(got == expected)
    // the injected drift is visible (both failure modes are exercised by
    // the DuckDB oracle at sf0.01/0.1, where buckets without a lost key
    // exist; at sf0.001 every bucket loses a mod-131 key)
    assert(got.nonEmpty && got.exists(_._2 != "ok"))
    assert(got.map(_._2).contains("count_mismatch"))
  }

  test("sim_filtered_topk: candidates are filtered BEFORE ranking (never post-filtered)") {
    import org.apache.spark.sql.functions.col
    val keep = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en" && col("n_chars") >= 200)
      .collect().map(_.getLong(0)).toSet
    val unfilteredTop = run("sim_cosine_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("t_id"))).toSet
    val rows = run("sim_filtered_topk").collect()
    // every hit satisfies the predicate
    assert(rows.forall(r => keep.contains(r.getAs[Long]("t_id"))))
    // k stays FULL under the filter (5 per query) — the post-filter
    // anti-pattern would under-fill it
    val perQ = rows.groupBy(_.getAs[Long]("q_id")).view.mapValues(_.length)
    assert(perQ.values.forall(_ == 5), perQ.toMap.toString)
    // and the fixture makes the filter bite: some filtered hit is NOT in
    // the unfiltered top-5 (otherwise the test is vacuous)
    assert(rows.exists(r =>
      !unfilteredTop.contains((r.getAs[Long]("q_id"), r.getAs[Long]("t_id")))))
  }

  test("ts_survival_km: steps match the brute-force estimator; curve is non-increasing") {
    val ev = events()
    val day = 86400000L
    // groupBy returns a Map: convert to Seq BEFORE mapping to pair-shaped
    // tuples, or the collection dedups lives by duration.
    val lives = ev.groupBy(_._3).toSeq.map { case (_, es) =>
      val d0 = es.map(_._2.getTime / day).min
      val last = es.maxBy(e =>
        (Math.floorDiv(e._2.getTime, 1000L), e._2.getNanos.toLong, e._1))
      (last._2.getTime / day - d0, last._4 == "error")
    }
    val byT = lives.groupBy(_._1).map { case (t, ls) =>
      (t, ls.count(_._2).toLong, ls.length.toLong)
    }.toSeq.sortBy(_._1)
    val atRisk = byT.map { case (t, _, _) =>
      t -> byT.filter(_._1 >= t).map(_._3).sum
    }.toMap
    var cum = 0L
    var zero = false
    val expected = byT.flatMap { case (t, d, e) =>
      val n = atRisk(t)
      if (d == 0L) None
      else {
        if (n > d) cum += math.round(math.log((n - d).toDouble / n) * 1e9)
        else zero = true
        Some((t, n, d, e - d, cum, zero))
      }
    }
    val got = run("ts_survival_km").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected)
    assert(got.map(_._5) == got.map(_._5).sorted.reverse,
      "log-survival must be non-increasing in t")
  }
}
