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
}
