package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** Semantic properties of the round-13 batch operators: winsorized means,
  * CUSUM monitors, engagement histograms, vocabulary overlap, cluster
  * censuses, data cards and media dedup. The DuckDB oracle proves value
  * equality against an independent engine; these pin each operator
  * against an in-memory brute force that shares no code with the
  * distributed plan.
  */
class R13OpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("agg_winsorized_mean: equals the clamp-by-rank brute force, n unchanged") {
    val cents = Tables.lineitem(spark, sfDir)
      .select(col("l_linestatus"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    val got = run("agg_winsorized_mean").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    cents.foreach { case (g, sorted) =>
      val n = sorted.length
      val d = n / 20
      if (d > 0) {
        val wlo = sorted(d) // rank d+1, 0-indexed
        val whi = sorted(n - d - 1) // rank n−d
        val win = sorted.map(v => math.max(wlo, math.min(whi, v))).sum
        assert(got(g) == ((n.toLong, win)), s"group $g")
      }
    }
    // winsorizing keeps every row: n is the raw group size
    assert(got.values.map(_._1).sum ==
      cents.values.map(_.length.toLong).sum)
  }

  test("ts_cusum: matches the sequential max(0, s + dev) fold per arm") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("sc"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val got = run("ts_cusum").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    daily.groupBy(_._1).foreach { case (arm, rows) =>
      val seq0 = rows.sortBy(_._2.toEpochDay)
      val target = seq0.map(x => BigInt(x._3)).sum / seq0.length
      var s = BigInt(0)
      seq0.foreach { case (_, day, sc) =>
        s = (s + (BigInt(sc) - target)).max(0)
        val (cusum, alarm) = got((arm, day))
        assert(BigInt(cusum) == s, s"$arm $day")
        assert(alarm == (s > target), s"$arm $day alarm")
      }
    }
  }

  test("events_power_users: histogram equals the per-user brute force; shares sum to ~1e6") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    // .toSeq BEFORE the map — mapping a Map to (da, money) pairs would
    // silently deduplicate users that share both values
    val per = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      (rows.map(_._2).distinct.size.toLong, rows.map(x => BigInt(x._3)).sum)
    }
    val want = per.groupBy(_._1).map { case (da, us) =>
      da -> (us.size.toLong, us.map(_._2).sum)
    }
    val got = run("events_power_users").collect()
    assert(got.map(_.getLong(0)).toSet == want.keySet)
    got.foreach { r =>
      val (nu, money) = want(r.getLong(0))
      assert(r.getLong(1) == nu && BigInt(r.getLong(2)) == money, r.toString)
    }
    // ppm shares are floor-divided — they sum to 1e6 within the bucket count
    val ppmSum = got.map(_.getLong(3)).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - got.length, s"ppm $ppmSum")
  }

  test("text_vocab_overlap: every pair matches exact set Jaccard") {
    val vocab = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").map(t => (r.getString(0), t)))
      .groupBy(_._1).map { case (s0, ts) => s0 -> ts.map(_._2).toSet }
    val got = run("text_vocab_overlap").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (vocab(r.getString(0)), vocab(r.getString(1)))
      val ni = (a & b).size.toLong
      assert(r.getLong(2) == ni, r.toString)
      assert(r.getLong(5) == ni * 1000000L / (a.size + b.size - ni), r.toString)
    }
    // all source pairs with nonzero overlap are present
    val pairs = vocab.keys.toSeq.sorted.combinations(2)
      .count { case Seq(x, y) => (vocab(x) & vocab(y)).nonEmpty }
    assert(got.length == pairs)
  }

  test("dedup_cluster_stats: census is a partition of the corpus") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val rows = run("dedup_cluster_stats").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == nDocs, "census must cover every document")
    rows.foreach { case (sz, nc, nd) => assert(nd == sz * nc, s"size $sz") }
    // clusters proper (size >= 2) agree with the components query
    val comp = run("dedup_components").collect().map(_.getLong(1))
    val sizes = comp.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    rows.filter(_._1 >= 2).foreach { case (sz, nc, _) =>
      assert(sizes.getOrElse(sz, 0L) == nc, s"size $sz")
    }
  }

  test("pipeline_data_card: one source recomputed by hand matches") {
    val card = run("pipeline_data_card").collect()
    val docs = Tables.documents(spark, sfDir)
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(card.map(_.getString(0)).toSet == docs.map(_._1).toSet)
    val src = card.head.getString(0)
    val mine = docs.filter(_._1 == src)
    val row = card.head
    assert(row.getLong(1) == mine.length.toLong)
    assert(row.getLong(2) == mine.map(_._3.split(" ").length.toLong).sum)
    val langCounts = mine.groupBy(_._2).map { case (l, xs) => l -> xs.length }
    val top = langCounts.toSeq.map { case (l, c) => (-c, l) }.min._2
    assert(row.getLong(4) == langCounts.size.toLong)
    assert(row.getString(5) == top)
    val dup = mine.groupBy(_._3).values.filter(_.length > 1).map(_.length).sum
    assert(row.getLong(6) == dup.toLong)
  }

  test("join_asof_tolerance: per-purchase brute force over the ordered stream") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val byUser = ev.groupBy(_._2)
    val want = byUser.values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      sorted.zipWithIndex.collect {
        case ((eid, _, us, "purchase", _), i) =>
          val lastClick = sorted.take(i).reverse
            .find(r => r._4 == "click" && r._5.isDefined)
          eid -> lastClick.collect {
            case (_, _, cus, _, Some(v)) if us - cus <= 300000000L =>
              BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          }
      }
    }.toMap
    val got = run("join_asof_tolerance").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some(BigDecimal(r.getDouble(2))))).toMap
    assert(got.keySet == want.keySet)
    assert(want.values.exists(_.isDefined) && want.values.exists(_.isEmpty),
      "fixture must exercise both fresh and stale matches")
    want.foreach { case (eid, w) => assert(got(eid) == w, s"purchase $eid") }
  }

  test("pipeline_dedup_rate_curve: each point recomputable from the verified pair set") {
    val pairs = run("dedup_jaccard_prefix").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1000)))
    val got = run("pipeline_dedup_rate_curve").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(500L, 600L, 700L, 800L, 900L))
    got.foreach { case (thr, (np, nd)) =>
      val hit = pairs.filter(_._3 >= thr)
      assert(np == hit.length.toLong, s"thr $thr pairs")
      assert(nd == hit.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong,
        s"thr $thr docs")
    }
    // the curve is monotone non-increasing in the threshold
    val curve = got.toSeq.sortBy(_._1).map(_._2._1)
    assert(curve == curve.sorted.reverse, curve.toString)
  }

  test("agg_raking: BigInt IPF replay matches; marginals converge toward uniform") {
    val rows = run("agg_raking").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cells = rows.map { case (et, wd, n, _) => ((et, wd), BigInt(n)) }.toMap
    val t = cells.values.sum
    val ets = cells.keys.map(_._1).toSeq.distinct
    val wds = cells.keys.map(_._2).toSeq.distinct
    val tr = t * 1000000 / ets.size
    val tc = t * 1000000 / wds.size
    var w = cells.map { case (k, c) => k -> c * 1000000 }
    for (_ <- 1 to 2) {
      val rs = w.groupBy(_._1._1).map { case (e, m) => e -> m.values.sum }
      w = w.map { case (k, v) => k -> v * tr / rs(k._1) }
      val cs = w.groupBy(_._1._2).map { case (d, m) => d -> m.values.sum }
      w = w.map { case (k, v) => k -> v * tc / cs(k._2) }
    }
    rows.foreach { case (et, wd, _, raked) =>
      assert(BigInt(raked) == w((et, wd)), s"($et, $wd)")
    }
    // after two rounds the column marginals are exact (last step scaled
    // them) and row marginals are within 0.2% of the uniform target
    val rowMarg = w.groupBy(_._1._1).map(_._2.values.sum)
    rowMarg.foreach(m =>
      assert((m - tr).abs * 500 <= tr, s"row marginal $m vs $tr"))
  }

  test("agg_mann_kendall: pairwise sign sum and tie-corrected variance by brute force") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("sc"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val got = run("agg_mann_kendall").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    daily.groupBy(_._1).foreach { case (arm, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val d = xs.length.toLong
      val s = (for (i <- xs.indices; j <- i + 1 until xs.length)
        yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
      val tsum = xs.groupBy(identity).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val var18 = d * (d - 1) * (2 * d + 5) - tsum
      val z = if (s == 0) 0.0
        else (s - math.signum(s.toDouble)) / math.sqrt(var18 / 18.0)
      val (gn, gs, gv, gz) = got(arm)
      assert((gn, gs, gv) == ((d, s, var18)), arm)
      assert(math.abs(gz - BigDecimal(z).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, arm)
    }
  }

  test("ts_theil_sen: lower-median pairwise slope by brute force") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("sc"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val got = run("ts_theil_sen").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    daily.groupBy(_._1).foreach { case (arm, rows) =>
      val pts = rows.sortBy(_._2)
      val slopes = (for {
        i <- pts.indices; j <- i + 1 until pts.length
      } yield {
        val dx = pts(j)._2 - pts(i)._2
        val dy = BigInt(pts(j)._3 - pts(i)._3)
        val q = (dy.abs * 1000000 / dx).toLong
        ((if (dy >= 0) q else -q), pts(i)._2, pts(j)._2)
      }).sorted
      val med = slopes((slopes.size + 1) / 2 - 1)._1
      assert(got(arm) == ((slopes.size.toLong, med)), arm)
    }
  }

  test("text_keywords_rake: degree/frequency scores match the phrase brute force") {
    val stop = Set("a", "the", "of")
    val docs = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long]
    val degree = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { t =>
      // phrases = maximal stopword-free runs
      val phrases = t.split(" ").foldLeft(List(List.empty[String])) {
        case (acc, w) if stop(w) => Nil :: acc
        case (h :: rest, w) => (w :: h) :: rest
        case (Nil, w) => List(List(w))
      }.filter(_.nonEmpty)
      phrases.foreach { p =>
        p.foreach { w =>
          freq(w) = freq.getOrElse(w, 0L) + 1L
          degree(w) = degree.getOrElse(w, 0L) + p.length
        }
      }
    }
    val got = run("text_keywords_rake").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (w, (f, d, m)) =>
      assert(f == freq(w) && d == degree(w), w)
      assert(m == d * 1000 / f, w)
    }
    // ranking is the declared (score desc, freq desc, word) total order
    val key = got.map { case (w, (f, _, m)) => (-m, -f, w) }
    assert(key.sortBy(identity).toSeq == key.toSeq)
  }

  test("events_conversion_lag: per-user brute force; cum_ppm ends at 1e6") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val lags = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val first = rows.map(_._2).min
      val conv = rows.filter(_._3 == "purchase").map(_._2)
      if (conv.isEmpty) None else Some((conv.min - first) / 86400000000L)
    }
    val want = lags.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("events_conversion_lag").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == want.keySet)
    got.foreach { case (d, (n, _, _)) => assert(n == want(d), s"day $d") }
    // the cumulative share ends within floor-division slack of 1e6
    assert(got.last._2._3 == 1000000L ||
      got.last._2._3 > 1000000L - got.length, got.last.toString)
  }

  test("graph_edge_support: histogram equals the brute per-edge triangle count") {
    val adj = bruteAdj()
    val edges = bruteEdges()
    val support = edges.toSeq.map { case (u, v) =>
      (u, v) -> (adj(u) & adj(v)).size.toLong
    }.toMap
    val want = support.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .filter(_._2 > 0)
    val got = run("graph_edge_support").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"only-got=${got.keySet -- want.keySet} " +
      s"only-want=${want.keySet -- got.keySet}")
    // the census covers every edge exactly once
    assert(got.values.sum == edges.size.toLong)
  }

  /** The co-purchase edge set (u < v), brute-forced off the raw table. */
  private def bruteEdges(): Set[(Long, Long)] = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
  }

  private def bruteAdj(): Map[Long, Set[Long]] = {
    val e = bruteEdges()
    (e.toSeq ++ e.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
  }

  test("mm_dedup: clusters are >= 2 members sharing a modality+prefix, disjoint reps") {
    val rows = run("mm_dedup").collect()
    assert(rows.forall(_.getLong(2) >= 2L))
    // brute force: group docs by (doc_id % 3 modality, 16-byte prefix)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clusters = docs.groupBy { case (id, t) =>
      (id % 3, t.take(16))
    }.values.filter(_.length > 1).toSeq
    assert(rows.length == clusters.size)
    assert(rows.map(_.getLong(3)).toSet ==
      clusters.map(_.map(_._1).min).toSet)
  }
}
