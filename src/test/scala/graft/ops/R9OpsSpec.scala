package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** Semantic properties of the round-9 operators: character entropy,
  * gap-fill densification, BPE pair counting, sequence-pattern matching,
  * time travel, and centroid outliers. The DuckDB oracle proves value
  * equality against an independent engine; these pin the invariants —
  * bounds, contiguity, soundness vs a brute-force Scala recomputation —
  * a refactor could silently break.
  */
class R9OpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("text_entropy: bounds, and exact agreement with a direct recount") {
    val rows = run("text_entropy").collect()
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val (doc, n, alpha, h) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n"),
        r.getAs[Long]("n_alphabet"), r.getAs[Double]("entropy_r"))
      // entropy of an n-char string over an a-char alphabet is in
      // [0, log2(a)] (uniform maximizes), and 0 iff one distinct char
      assert(h >= 0.0 && h <= math.log(alpha.toDouble) / math.log(2.0) + 1e-9,
        r.toString)
      assert((alpha == 1) == (h == 0.0), r.toString)
      // direct recount: same counts, same formula
      val counts = texts(doc).groupBy(identity).map(_._2.size)
      assert(counts.sum.toLong == n && counts.size.toLong == alpha, r.toString)
      val log2 = (x: Double) => math.log(x) / math.log(2.0)
      val direct = log2(n.toDouble) -
        counts.map(c => c * log2(c.toDouble)).sum / n
      assert(math.abs(direct - h) < 5e-5, s"doc $doc: $direct vs $h")
    }
  }

  test("window_gap_fill: spans dense, fill flags consistent, carry correct") {
    val rows = run("window_gap_fill").collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_.getAs[java.sql.Date]("day").toLocalDate)
      // dense: exactly every day between min and max, once
      val span = java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max)
      assert(days.length.toLong == span + 1, s"user $u has gaps")
      assert(days.distinct.length == days.length, s"user $u duplicates days")
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
      // endpoints are observed by construction (the span is min..max of
      // OBSERVED days); filled ⟺ n=0; v_ff carries the last observed v
      assert(!sorted.head.getAs[Boolean]("filled") &&
        !sorted.last.getAs[Boolean]("filled"), s"user $u endpoint filled")
      var lastV = Double.NaN
      sorted.foreach { r =>
        val (n, filled, vff) = (r.getAs[Long]("n"),
          r.getAs[Boolean]("filled"), r.getAs[Double]("v_ff"))
        assert((n == 0) == filled, r.toString)
        if (!filled) lastV = vff // an observed day defines its own v
        assert(vff == lastV, s"user $u: forward fill broke at $r")
      }
    }
    // the fixture must actually contain gaps, or the fill is untested
    assert(rows.exists(_.getAs[Boolean]("filled")), "no gaps in fixture")
  }

  test("pipeline_bpe_pairs: exact agreement with a brute-force recount") {
    val got = run("pipeline_bpe_pairs").collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n_weighted"),
        r.getAs[Long]("n_types")))
    val terms = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t")).collect()
      .map(_.getString(0))
    val tf = terms.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      .filter(_._1.length >= 2)
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    tf.foreach { case (term, f) =>
      val pairs = term.sliding(2).toSeq
      pairs.foreach { p =>
        val (w, ty) = acc.getOrElse(p, (0L, 0L))
        acc(p) = (w + f, ty)
      }
      pairs.distinct.foreach { p =>
        val (w, ty) = acc(p); acc(p) = (w, ty + 1)
      }
    }
    val want = acc.toSeq.map { case (p, (w, ty)) => (p, w, ty) }
      .sortBy { case (p, w, _) => (-w, p) }.take(50)
    assert(got.toSeq == want, s"top-50 differs:\n got=${got.take(5).toSeq}\nwant=${want.take(5)}")
  }

  test("window_pattern_match: counts equal a direct regex recount") {
    val got = run("window_pattern_match").collect()
      .map(r => r.getAs[String]("pattern") -> r.getAs[Long]("n_users")).toMap
    val seqs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (_, rs) =>
        // micros exactly as PatternMatch.micros computes them: getTime
        // already carries the millis, so only the sub-milli part of
        // getNanos may be added (getTime*1e6 + getNanos double-counted
        // the millisecond component and was non-monotonic across seconds)
        rs.sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime * 1000L +
            (r.getAs[java.sql.Timestamp]("ts").getNanos % 1000000L) / 1000L,
            r.getAs[Long]("event_id")))
          .map(_.getAs[String]("event_type").charAt(0)).mkString
      }.toSeq
    got.keySet.foreach { p =>
      val re = p.r
      val n = seqs.count(s => re.findFirstIn(s).isDefined).toLong
      assert(got(p) == n, s"'$p': query ${got(p)} vs recount $n")
    }
  }

  test("cdc_time_travel: the as-of state is the half-history prefix fold") {
    val rows = run("cdc_time_travel").collect()
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value").collect()
    val cutoff = events.map(_.getAs[Long]("event_id")).max / 2
    val byUser = events.filter(_.getAs[Long]("event_id") <= cutoff)
      .groupBy(_.getAs[Long]("user_id"))
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val pk = r.getAs[Long]("pk")
      val evs = byUser(pk)
      assert(r.getAs[Long]("as_of") == cutoff)
      assert(r.getAs[Long]("n_changes") == evs.length.toLong)
      val win = evs.maxBy(_.getAs[Long]("event_id"))
      assert(r.getAs[Long]("last_event") == win.getAs[Long]("event_id"))
      assert(r.getAs[String]("op") == win.getAs[String]("event_type"), r.toString)
    }
  }

  test("sql_recursive_cte: the walk terminates at exactly the key's digit count") {
    val got = run("sql_recursive_cte").collect()
      .map(r => r.getAs[Int]("depth") -> (r.getAs[Long]("n_keys"),
        r.getAs[Long]("key_min"), r.getAs[Long]("key_max"))).toMap
    val keys = Tables.supplier(spark, sfDir).select("s_suppkey").collect()
      .map(_.getLong(0))
    // depth = number of div-10 steps to reach 0: digit count, except the
    // root key 0 itself which is already terminal at depth 0
    val want = keys.groupBy(k => if (k == 0) 0 else k.toString.length)
      .map { case (d, ks) => d -> (ks.length.toLong, ks.min, ks.max) }
    assert(got == want, s"depth ledger differs: $got vs $want")
  }

  test("emb_centroid_outliers: reported top-5 dominate every unreported vector") {
    val rows = run("emb_centroid_outliers").collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    // recompute every distance on the quantized grid
    val embs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 10000 + 0.5))))
    val dists: Map[(Int, Long), Double] =
      embs.groupBy(_._2).toSeq.flatMap { case (label, vs) =>
        val dim = vs.head._3.length
        val cent = (0 until dim).map(i => vs.map(_._3(i)).sum / vs.length)
        vs.toSeq.map { case (id, _, q) =>
          (label, id) -> math.sqrt(
            q.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum) / 10000.0
        }
      }.toMap
    byLabel.foreach { case (label, rs) =>
      assert(rs.length == 5, s"label $label: ${rs.length} rows")
      val reported = rs.map(_.getAs[Long]("vec_id")).toSet
      val minReported = rs.map(r => dists((label, r.getAs[Long]("vec_id")))).min
      val maxOther = dists.collect {
        case ((l, id), d) if l == label && !reported(id) => d
      }.max
      assert(minReported >= maxOther - 1e-9,
        s"label $label: unreported vector beats a reported one")
      // and the reported distances round to the query's output
      rs.foreach { r =>
        val d = dists((label, r.getAs[Long]("vec_id")))
        assert(math.abs(d - r.getAs[Double]("dist_r")) < 5e-5, r.toString)
      }
    }
  }
}
