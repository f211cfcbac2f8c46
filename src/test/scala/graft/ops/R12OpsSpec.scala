package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}

/** Semantic properties of the round-12 batch operators: local clustering
  * coefficients, landmark BFS distances, rank-trimmed means, triplet
  * mining, interval concurrency, and term burstiness. The DuckDB oracle
  * proves value equality against an independent engine; these pin each
  * operator against an in-memory brute force that shares no code with
  * the distributed plan.
  */
class R12OpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

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

  test("graph_clustering_coeff: reported rows match the brute-force per-node census") {
    val adj = bruteAdj()
    val triOf = adj.map { case (u, ns) =>
      u -> ns.toSeq.flatMap(a => ns.toSeq.map(b => (a, b)))
        .count { case (a, b) => a < b && adj(a).contains(b) }.toLong
    }
    val expected = adj.toSeq
      .filter(_._2.size >= 2)
      .map { case (u, ns) =>
        val d = ns.size.toLong
        val t = triOf(u)
        (u, d, t, t * 2000000L / (d * (d - 1)))
      }
      .sortBy { case (u, _, t, c) => (-c, -t, u) }
      .take(20)
    val got = run("graph_clustering_coeff").collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("degree"),
        r.getAs[Long]("n_tri"), r.getAs[Long]("coeff_ppm")))
    assert(got.toSeq == expected)
  }

  test("graph_landmark_distance: histogram equals brute-force multi-source BFS") {
    val adj = bruteAdj()
    val seeds = adj.keys.toSeq.sorted.take(3)
    val expected = seeds.flatMap { s =>
      var dist = Map(s -> 0L)
      var frontier = Set(s)
      for (r <- 1 to 3) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
        dist ++= next.map(_ -> r.toLong)
        frontier = next
      }
      dist.groupBy(_._2).toSeq.map { case (d, m) => (s, d, m.size.toLong) }
    }.sortBy(x => (x._1, x._2))
    val got = run("graph_landmark_distance").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dist"),
        r.getAs[Long]("n_nodes"))).toSeq
    assert(got == expected)
  }

  test("agg_trimmed_mean: survivors are exactly the rank-trimmed set") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_linestatus", "l_extendedprice").collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val expected = li.groupBy(_._1).toSeq.map { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val k = (sorted.length / 20)
      val kept = sorted.slice(k, sorted.length - k)
      (g, kept.length.toLong, kept.sum)
    }.sortBy(_._1)
    val got = run("agg_trimmed_mean").collect()
      .map(r => (r.getAs[String]("l_linestatus"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("sum_cents"))).toSeq
    assert(got == expected)
    // the trimmed mean is bracketed by min and max of the kept mass
    run("agg_trimmed_mean").collect().foreach { r =>
      val mean = r.getAs[Double]("trimmed_mean_r")
      assert(mean > 0 && mean < 200000, s"implausible trimmed mean $mean")
    }
  }

  test("emb_hard_negatives: each row is the true arg-extreme of its (anchor, kind) class") {
    val embs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Int]("label")))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = run("emb_hard_negatives").collect()
    val anchors = embs.filter(_._1 < 20)
    assert(got.length == anchors.length * 2)
    got.foreach { r =>
      val q = r.getAs[Long]("q_id"); val kind = r.getAs[String]("kind")
      val t = r.getAs[Long]("t_id")
      val (_, qe, ql) = anchors.find(_._1 == q).get
      val pool = embs.filter(e => e._1 != q &&
        (if (kind == "hard_pos") e._3 == ql else e._3 != ql))
      val best =
        if (kind == "hard_neg")
          pool.minBy(e => (-BigDecimal(cos(qe, e._2)).setScale(6, BigDecimal.RoundingMode.HALF_UP), e._1))
        else
          pool.minBy(e => (BigDecimal(cos(qe, e._2)).setScale(6, BigDecimal.RoundingMode.HALF_UP), e._1))
      assert(t == best._1, s"anchor $q kind $kind: got $t expected ${best._1}")
    }
  }

  test("ts_active_intervals: concurrency curve matches per-day interval counting") {
    val ship = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getAs[Long]("l_orderkey"),
        r.getAs[java.sql.Timestamp]("l_shipdate").toLocalDateTime.toLocalDate))
    val ordered = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getAs[Long]("o_orderkey"),
        r.getAs[java.sql.Timestamp]("o_orderdate").toLocalDateTime.toLocalDate))
      .toMap
    val li = ship.map { case (ok, sd) =>
      val od = ordered(ok)
      if (od.isBefore(sd)) (od, sd) else (sd, od)
    }
    // event-day domain only (days where some interval starts or ends+1)
    val days = (li.map(_._1) ++ li.map(_._2.plusDays(1))).distinct.sorted
    val curve = days.map { d =>
      d -> li.count(iv => !iv._1.isAfter(d) && !iv._2.isBefore(d)).toLong
    }
    val expected = curve.groupBy(_._1.toString.substring(0, 7)).toSeq
      .map { case (m, rows) =>
        (m, rows.map(_._2).max, rows.maxBy(_._1)._2)
      }.sortBy(_._1)
    val got = run("ts_active_intervals").collect()
      .map(r => (r.getAs[String]("month"), r.getAs[Long]("max_active"),
        r.getAs[Long]("eom_active"))).toSeq
    assert(got == expected)
  }

  test("text_burstiness: gap moments match a brute-force rescan") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").split(" ", -1)))
    val counts = docs.flatMap(_._3).groupBy(identity).map { case (t, xs) => (t, xs.length) }
    val top5 = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(5).map(_._1).toSet
    val gaps = docs.flatMap { case (_, src, toks) =>
      toks.zipWithIndex.filter(t => top5.contains(t._1))
        .groupBy(_._1).toSeq.flatMap { case (term, occ) =>
          val pos = occ.map(_._2.toLong).sorted
          pos.sliding(2).collect { case Array(a, b) => (src, term, b - a) }
        }
    }
    val expected = gaps.groupBy(g => (g._1, g._2)).toSeq.map { case ((src, term), gs) =>
      val n = gs.length.toLong
      val s = gs.map(_._3).sum
      val ss = gs.map(g => g._3 * g._3).sum
      (src, term, n, s * 1000 / n, (n * ss - s * s) * 1000 / (n * s))
    }.sortBy(x => (x._1, x._2))
    val got = run("text_burstiness").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("term"),
        r.getAs[Long]("n_gaps"), r.getAs[Long]("mean_gap_milli"),
        r.getAs[Long]("fano_milli"))).toSeq
    assert(got == expected)
  }
}
