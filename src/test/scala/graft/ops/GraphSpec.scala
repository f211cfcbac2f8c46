package graft.ops

import graft.{SparkEntry, SparkSuite}

/** Semantic + plan guards for the graph family (round 11). The DuckDB
  * oracle proves the exact end result; these pin the internal invariants
  * (handshake identity, mass conservation, a driver-side brute-force
  * PageRank recount) and the scale-critical join shapes.
  */
class GraphSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("degree distribution satisfies the handshake lemma") {
    val rows = q("graph_degree_dist").collect()
    val sumDeg = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val nEdges = q("graph_triangles").collect().head.getAs[Long]("n_edges")
    assert(sumDeg == 2 * nEdges, s"sum(deg*n)=$sumDeg vs 2m=${2 * nEdges}")
  }

  test("triangle census matches a driver-side brute-force recount") {
    val t = q("graph_triangles").collect().head
    // Rebuild the edge set directly from the table and count naively.
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val edges = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length if ps(i) != ps(j))
        yield (ps(i), ps(j))
    }.toSet
    assert(t.getAs[Long]("n_edges") == edges.size)
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(t.getAs[Long]("n_wedges") == nWedges)
    val nTri = edges.toSeq.map { case (u, v) => (adj(u) & adj(v)).size.toLong }
      .sum / 3 // each triangle counted once per edge
    assert(t.getAs[Long]("n_triangles") == nTri,
      s"query=${t.getAs[Long]("n_triangles")} brute=$nTri")
  }

  test("pagerank matches a driver-side integer fixpoint bit-for-bit") {
    val got = q("graph_pagerank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val bi = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
    val deg = bi.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    var r = deg.keys.map(u => u -> 1000000000000L / n).toMap
    for (_ <- 1 to 3) {
      val contrib = bi.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) * 85 / (100 * deg(u)) }.sum).toMap
      r = deg.keys.map(u =>
        u -> (15000000000000L / (100 * n) + contrib.getOrElse(u, 0L))).toMap
    }
    assert(got == r, "integer PageRank fixpoint diverged from the query")
    // Truncating division leaks at most (100·outdeg − 1) fp-units per split;
    // total mass stays within that bound of the scale constant.
    val mass = r.values.sum
    assert(mass <= 1000000000000L && mass > 1000000000000L - 100L * bi.size - n,
      s"mass=$mass")
  }

  test("graph edge joins are hash joins — no cartesian product") {
    // (The 1-row stat/n assemblies are explicit broadcast crossJoins —
    // BroadcastNestedLoopJoin with a 1-row build side — and are fine;
    // what must never appear is a CartesianProduct or a nested loop on
    // the edge keys themselves.)
    // graph_triangles reads the corner-count checkpoint since r12, so the
    // wedge enumeration's join shape is pinned on the BUILDER plan
    // (closedTriangles) — the subtree every consumer's first build runs.
    // closedTriangles is checkpoint-served since r14, so the wedge
    // enumeration's join shape is pinned on the BUILDER plan.
    for (df <- Seq(q("graph_triangles"), q("graph_pagerank"),
        GraphQueries.buildClosedTriangles(spark, sfDir))) {
      df.collect() // finalize AQE
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), p)
    }
    for (df <- Seq(q("graph_pagerank"),
        GraphQueries.buildClosedTriangles(spark, sfDir))) {
      df.collect()
      assert(df.queryExecution.executedPlan.toString
        .contains("ShuffledHashJoin"))
    }
  }
}
