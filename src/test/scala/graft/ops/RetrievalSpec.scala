package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}

/** Semantic guards for the retrieval/linkage family (round 10). The DuckDB
  * oracles prove engine-vs-engine equality; these pin the semantics against
  * independently-structured driver-side recounts (BM25 from scratch, an
  * all-pairs Levenshtein DP, a wedge recount) and the invariants the
  * oracles can't see (blocking losslessness argument, sigmoid/threshold
  * coherence, share normalization).
  */
class RetrievalSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def docTokens: Map[Long, Seq[String]] =
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap

  test("bm25 matches a from-scratch driver recount bit-for-bit") {
    val got = q("text_bm25_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = docTokens
    val qterms = Set("table", "spark", "merge")
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val tf = docs.toSeq.flatMap { case (id, ts) =>
      ts.filter(qterms).groupBy(identity).map { case (t, g) => (id, t, g.size.toDouble) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toDouble).toMap
    val scored = tf.groupBy(_._1).map { case (id, rows) =>
      val s = rows.map { case (_, t, f) =>
        val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        val dl = docs(id).size.toDouble
        math.round(idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6)
      }.sum
      (id, s, rows.size.toLong)
    }
    val want = scored.toSeq.sortBy { case (id, s, _) => (-s, id) }.take(20)
    assert(got.toSeq == want, s"got=${got.take(3).toSeq} want=${want.take(3)}")
  }

  test("fuzzy join equals the unblocked all-pairs Levenshtein join") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = (docTokens.values.flatten.toSet ++
      Tables.part(spark, sfDir).select("p_name").collect()
        .flatMap(_.getString(0).split(" "))).toSeq.sorted
    val want = (for {
      i <- vocab.indices; j <- i + 1 until vocab.length
      d = lev(vocab(i), vocab(j)) if d <= 2
    } yield (vocab(i), vocab(j), d)).sorted
    val got = q("join_fuzzy_levenshtein").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq.sorted
    assert(got == want, s"got ${got.size} pairs vs brute ${want.size}")
  }

  test("classifier accept is exactly the z >= 0 half-space") {
    // sigmoid is monotone: score >= 0.5 ⇔ z >= 0; the flag must agree
    // with the reported z for every row, and scores must stay in (0, 1).
    val rows = q("pipeline_quality_classifier").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (z, score, accept) = (r.getDouble(1), r.getDouble(2), r.getBoolean(3))
      assert(score > 0.0 && score < 1.0)
      // z_r is rounded to 4 decimals; only assert coherence away from the
      // rounding boundary.
      if (math.abs(z) > 1e-3) assert(accept == (z >= 0.0), s"z=$z accept=$accept")
      assert(math.abs(score - 1.0 / (1.0 + math.exp(-z))) < 1e-3)
    }
  }

  test("temperature mix shares normalize and draws never exceed budget") {
    val rows = q("pipeline_temperature_mix").collect()
    val shares = rows.map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 1e-4, s"Σshare=${shares.sum}")
    val draws = rows.map(_.getLong(3))
    assert(draws.sum <= 10000 && draws.forall(_ >= 0))
    // α = 0.5 flattens: the max/min draw ratio must not exceed the
    // max/min doc-count ratio.
    val counts = rows.map(_.getLong(1).toDouble)
    assert(draws.max.toDouble / draws.min <= counts.max / counts.min + 1e-9)
  }

  test("entropy/gini are zero iff a source is monolingual, else positive") {
    val rows = q("agg_entropy_gini").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (nLangs, ent, gini) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (nLangs == 1L) assert(ent == 0L && gini == 0L)
      else {
        assert(ent > 0L && gini > 0L)
        // Gini < 1 - 1/k is the impurity ceiling for k classes.
        assert(gini < 1000000000L)
      }
    }
  }

  test("MAD outliers: fences are coherent and bounded") {
    val rows = q("agg_mad_outliers").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (n, out) = (r.getLong(1), r.getLong(2))
      val (med, mad) = (r.getDouble(3), r.getDouble(4))
      assert(out >= 0 && out < n, s"outliers $out of $n")
      assert(med > 0.0 && mad > 0.0 && mad < med)
      // At least half the mass lies within one MAD of the median by
      // definition, so > 3·MAD outliers are always a minority.
      assert(out.toDouble / n < 0.5)
    }
  }

  test("radius search equals a brute-force driver recount") {
    val got = q("sim_radius_search").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val embs = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val queries = embs.filter(_._1 < 5)
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = (for {
      (qid, qe) <- queries.toSeq; (tid, te) <- embs.toSeq
      if qid != tid && cos(qe, te) >= 0.3
    } yield (qid, tid)).sorted
    assert(got == want, s"got=${got.size} want=${want.size}")
  }

  test("common neighbors matches a driver-side wedge recount") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val capped = adj.filter(_._2.size <= 64)
    val counts = scala.collection.mutable.Map[(Long, Long), Long]()
    capped.values.foreach { ns =>
      val ps = ns.toSeq.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        counts((ps(i), ps(j))) = counts.getOrElse((ps(i), ps(j)), 0L) + 1
    }
    val want = counts.toSeq.collect {
      case ((a, b), c) if !edges((a, b)) => (a, b, c)
    }.sortBy { case (a, b, c) => (-c, a, b) }.take(50)
    val got = q("graph_common_neighbors").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
  }
}
