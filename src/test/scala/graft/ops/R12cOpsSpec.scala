package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}

/** Semantic properties of the third round-12 batch: 3-step journey path
  * mining and RFM quintile segmentation. The DuckDB oracle proves value
  * equality against an independent engine; these pin each operator
  * against an in-memory brute force that shares no code with the
  * distributed plan.
  */
class R12cOpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def events(): Array[(Long, java.sql.Timestamp, Long, String, Double)] =
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))

  private def tsKey(e: (Long, java.sql.Timestamp, Long, String, Double)) =
    (Math.floorDiv(e._2.getTime, 1000L), e._2.getNanos.toLong, e._1)

  test("events_path: trigram counts and ppm shares match the sliding-window brute force") {
    val ev = events()
    val paths = ev.groupBy(_._3).toSeq.flatMap { case (_, es) =>
      es.sortBy(tsKey).map(_._4).sliding(3).filter(_.length == 3)
        .map(w => (w(0), w(1), w(2))).toSeq
    }
    val tot = paths.length.toLong
    val expected = paths.groupBy(identity).toSeq
      .map { case (p, ps) =>
        val n = ps.length.toLong
        (p._1, p._2, p._3, n, n * 1000000L / tot)
      }.sortBy(p => (p._1, p._2, p._3))
    val got = run("events_path").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // shares are a (near-)partition of unity: floor division loses at
    // most 1 ppm per path cell
    val ppm = got.map(_._5).sum
    assert(ppm <= 1000000L && ppm > 1000000L - got.length)
  }

  test("events_rfm: segment cube matches a brute-force ntile over (metric, user_id)") {
    val day = 86400000L
    val ev = events()
    val per = ev.groupBy(_._3).toSeq.map { case (u, es) =>
      val lastDay = es.map(_._2.getTime / day).max
      val money = es.map(e => math.floor(e._5 * 100 + 0.5).toLong).sum
      (u, lastDay, es.length.toLong, money)
    }
    val maxd = per.map(_._2).max
    // SQL ntile(k) over n rows: the first n%k buckets take ceil(n/k)
    // rows, the rest floor(n/k) — on a TOTAL order, so engine-identical.
    def ntile(ranked: Seq[Long], k: Int): Map[Long, Long] = {
      val n = ranked.length; val q = n / k; val r = n % k
      ranked.zipWithIndex.map { case (u, i) =>
        val b = if (i < (q + 1) * r) i / (q + 1) else r + (i - (q + 1) * r) / q
        u -> (b + 1).toLong
      }.toMap
    }
    val rS = ntile(per.sortBy(p => (maxd - p._2, p._1)).map(_._1), 5)
    val fS = ntile(per.sortBy(p => (-p._3, p._1)).map(_._1), 5)
    val mS = ntile(per.sortBy(p => (-p._4, p._1)).map(_._1), 5)
    val expected = per.groupBy(p => (rS(p._1), fS(p._1), mS(p._1))).toSeq
      .map { case (k, ps) => (k._1, k._2, k._3, ps.length.toLong, ps.map(_._4).sum) }
      .sortBy(k => (k._1, k._2, k._3))
    val got = run("events_rfm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // quintiles are balanced: per axis, buckets differ by at most one user
    Seq(rS, fS, mS).foreach { sc =>
      val sizes = sc.values.groupBy(identity).view.mapValues(_.size).values
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("text_collocations: bigram counts and PMI match the brute force") {
    // split with -1: Spark's split KEEPS trailing empty tokens
    val bgs = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0).split(" ", -1).toSeq)
      .filter(_.length >= 2)
      .flatMap(_.sliding(2).map(w => (w(0), w(1))))
    val n = bgs.length.toLong
    val cell = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val la = bgs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val rb = bgs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = cell.filter(_._2 >= 5L).toSeq
      .map { case ((a, b), nab) =>
        (a, b, nab, math.log(nab.toDouble * n / (la(a).toDouble * rb(b))))
      }.sortBy(p => (p._1, p._2))
    val got = run("text_collocations").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.map(g => (g._1, g._2, g._3)) == expected.map(e => (e._1, e._2, e._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-6, s"pmi(${g._1},${g._2})")
    }
    // the support floor bites: at least one sub-floor pair existed
    assert(cell.exists(_._2 < 5L))
  }

  test("agg_cramers_v: exact-ppm chi2 over the full grid matches BigInt brute force") {
    val day = 86400000L
    val ev = events()
    val cells = ev.groupBy(e => (e._4, (e._2.getTime / day + 3) % 7))
      .view.mapValues(_.length.toLong).toMap
    val ets = cells.keySet.map(_._1)
    val dws = cells.keySet.map(_._2)
    val rm = ets.map(t => t -> cells.filter(_._1._1 == t).values.sum).toMap
    val cm = dws.map(d => d -> cells.filter(_._1._2 == d).values.sum).toMap
    val nn = rm.values.sum
    // full grid including zero-observed cells; floor BEFORE the sum
    val chi2 = (for { t <- ets; d <- dws } yield {
      val o = BigInt(cells.getOrElse((t, d), 0L))
      val num = o * nn - BigInt(rm(t)) * cm(d)
      num * num * 1000000 / (BigInt(nn) * rm(t) * cm(d))
    }).sum
    val v = math.sqrt(chi2.toDouble / 1e6 /
      (nn.toDouble * (math.min(ets.size, dws.size) - 1)))
    val r = run("agg_cramers_v").collect()(0)
    assert(r.getLong(0) == nn && r.getLong(1) == ets.size.toLong
      && r.getLong(2) == dws.size.toLong)
    assert(r.getLong(3) == chi2.toLong)
    assert(math.abs(r.getDouble(4) - v) < 1e-6)
  }

  test("events_dau_mau: trailing-28-day actives match the direct window brute force") {
    val day = 86400000L
    val ud = events().map(e => (e._3, e._2.getTime / day)).distinct.toSeq
    val activeDays = ud.map(_._2).distinct.sorted
    val expected = activeDays.map { d =>
      val dau = ud.count(_._2 == d).toLong
      val mau = ud.filter(p => p._2 <= d && p._2 > d - 28).map(_._1).distinct.length.toLong
      (d, dau, mau, dau * 1000000L / mau)
    }
    val got = run("events_dau_mau").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // rows come back ordered by day, so the per-day value tuples must
    // line up positionally with the epoch-day brute force
    assert(got.length == expected.length)
    assert(got.map(_._1) == got.map(_._1).sorted)
    assert(got.map(g => (g._2, g._3, g._4)) ==
      expected.map(e => (e._2, e._3, e._4)))
    // MAU >= DAU always, and early days ramp: first day's MAU == its DAU
    assert(got.forall(g => g._3 >= g._2))
    assert(got.head._2 == got.head._3)
  }
}
