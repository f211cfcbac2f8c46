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

  test("truss labels match a driver-side exact support-peel, rounds within oracle unroll") {
    // The h-index fixpoint (what the engine iterates) must equal the
    // textbook sequential peel (what "k-truss" MEANS) edge for edge —
    // this is the semantic theorem the query rests on, proven here on the
    // real sf0.001 graph rather than assumed from the literature.
    val got = q("graph_truss").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val allEdges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    // exact batched support-peel: remove all min-support edges, cascade
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    allEdges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set()) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set()) += u
    }
    def support(u: Long, v: Long): Int = (adj(u) & adj(v)).size
    var alive = allEdges.filter { case (u, v) => support(u, v) > 0 }
    val truss = scala.collection.mutable.Map[(Long, Long), Long]()
    allEdges.diff(alive).foreach(e => truss(e) = 2L)
    // non-triangle edges still sit in adj; drop them so supports are
    // counted within the alive subgraph only
    allEdges.diff(alive).foreach { case (u, v) => adj(u) -= v; adj(v) -= u }
    var level = 0L
    while (alive.nonEmpty) {
      val sups = alive.toSeq.map(e => e -> support(e._1, e._2).toLong).toMap
      val m = sups.values.min
      level = math.max(level, m)
      val drop = alive.filter(e => sups(e) <= level)
      if (drop.isEmpty) ()
      drop.foreach { e =>
        truss(e) = level + 2
        adj(e._1) -= e._2; adj(e._2) -= e._1
      }
      alive = alive.diff(drop)
    }
    assert(got.size == allEdges.size)
    val diff = got.collect { case (e, t) if truss(e) != t => (e, t, truss(e)) }
    assert(diff.isEmpty, s"${diff.size} edges diverge, e.g. ${diff.take(5)}")
  }

  test("coreness labels match a driver-side exact min-degree peel, rounds within unroll") {
    val got = q("graph_coreness").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val allEdges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    allEdges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set()) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set()) += u
    }
    val core = scala.collection.mutable.Map[Long, Long]()
    var level = 0L
    while (adj.nonEmpty) {
      val m = adj.values.map(_.size).min.toLong
      level = math.max(level, m)
      val drop = adj.collect { case (u, ns) if ns.size <= level => u }.toSeq
      drop.foreach { u =>
        core(u) = level
        adj(u).foreach(v => if (adj.contains(v)) adj(v) -= u)
        adj -= u
      }
    }
    assert(got.size == core.size)
    val diff = got.collect { case (u, c) if core(u) != c => (u, c, core(u)) }
    assert(diff.isEmpty, s"${diff.size} nodes diverge, e.g. ${diff.take(5)}")
  }

  test("distributed h-index loop equals the gated in-task peel (both decompositions)") {
    // Default sessions below the decomposition gate serve the one-job
    // exact peel; the DISTRIBUTED loop is the shape that ships at scale.
    // Force the loop (gate = 0), rebuild, and require bit-identical
    // labels - plus round counts within the oracle unrolls (32 / 48)
    // with margin, so a fixture change that slows convergence fails here
    // before it can diverge from the fixed-round oracle SQL.
    val gatedTruss = SparkEntry.queries("graph_truss")(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val gatedCore = SparkEntry.queries("graph_coreness")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val key = GraphQueries.DecompInTaskMaxEdgesKey
    spark.conf.set(key, "0")
    // r16: force delta-round ELIGIBILITY too (the fixture adjacency sits
    // far under the production DeltaMinAdjRows), so the forced loop
    // serves most rounds through the delta path and the label equality
    // below proves delta ≡ dense ≡ exact peel on real data, not by
    // argument alone.
    spark.conf.set(GraphQueries.DeltaMinAdjRowsKey, "0")
    spark.conf.set(GraphQueries.TrussDeltaMinTriSlotsKey, "0")
    try {
      GraphQueries.clearCache(spark, sfDir)
      val loopTruss = SparkEntry.queries("graph_truss")(spark, sfDir).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val loopCore = SparkEntry.queries("graph_coreness")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(loopTruss == gatedTruss, "truss loop != gated peel")
      assert(loopCore == gatedCore, "coreness loop != gated peel")
      val tr = GraphQueries.trussRounds.get((spark, sfDir))
      assert(tr > 0 && tr <= 30, s"truss loop took $tr rounds (oracle unrolls 32)")
      val cr = GraphQueries.corenessRounds.get((spark, sfDir))
      assert(cr > 0 && cr <= 44, s"coreness loop took $cr rounds (oracle unrolls 48)")
      val dr = GraphQueries.deltaRounds.get((spark, sfDir, "coreness"))
      assert(dr != null && dr >= 1,
        s"coreness loop ran $dr delta rounds — the delta path never engaged")
      assert(dr <= cr, s"delta rounds $dr exceed recorded rounds $cr")
      // r17: the truss step consumes the frontier too — the label
      // equality above already proved delta ≡ dense ≡ exact peel; here
      // pin that the delta path actually SERVED rounds (the convergence
      // tail's frontiers sit under the default caps on this fixture)
      val dtr = GraphQueries.deltaRounds.get((spark, sfDir, "truss"))
      assert(dtr != null && dtr >= 1,
        s"truss loop ran $dtr delta rounds — the delta path never engaged")
      assert(dtr <= tr, s"truss delta rounds $dtr exceed recorded rounds $tr")
    } finally {
      spark.conf.unset(key)
      spark.conf.unset(GraphQueries.DeltaMinAdjRowsKey)
      spark.conf.unset(GraphQueries.TrussDeltaMinTriSlotsKey)
      GraphQueries.clearCache(spark, sfDir)
    }
  }

  test("component labels match a driver-side union-find, delta ≡ dense, rounds within unroll") {
    // Exact yardstick: driver-side union-find over the collected edge
    // list (the fixture edge set is test-sized; the ENGINE never
    // collects edges).
    val edges = q("graph_triangles") // just to warm caches deterministically
    edges.collect()
    val es = GraphQueries.componentLabels(spark, sfDir) // ensure built
    es.count()
    val edgeRows = graft.Tables.lineitem(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("ok"),
        org.apache.spark.sql.functions.col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = edgeRows.groupBy(_._1).values
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for (grp <- byOrder; Seq((_, a), (_, b)) <- grp.map(x => (x._1, x._2)).toSeq
        .sortBy(_._2).sliding(2) if grp.size >= 2)
      union(a, b)
    // min-id normalization: component = min node reachable
    val expected = parent.keys.map(u => u -> find(u)).toMap
    val got = SparkEntry.queries("graph_components")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // nodes with no co-purchased sibling never enter the graph; compare
    // on the engine's node universe
    assert(got.nonEmpty)
    got.foreach { case (u, c) =>
      assert(expected.getOrElse(u, u) == c,
        s"node $u: engine component $c != union-find ${expected.getOrElse(u, u)}")
    }
    val rounds = GraphQueries.componentRounds.get((spark, sfDir))
    assert(rounds > 0 && rounds <= 10,
      s"components converged in $rounds rounds (oracle unrolls 12)")
    // delta ≡ dense on real data: force delta eligibility AND an absolute
    // frontier cap (the fixture converges in 2 rounds, so no natural
    // frontier ever drops under the default |V|/8 clamp), rebuild, and
    // require identical labels plus at least one delta round served
    spark.conf.set(GraphQueries.DeltaMinAdjRowsKey, "0")
    spark.conf.set(GraphQueries.DeltaFrontierMaxRowsKey, "10000000")
    try {
      GraphQueries.clearCache(spark, sfDir)
      val loop = SparkEntry.queries("graph_components")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(loop == got, "delta-round component labels != dense labels")
      val dr = GraphQueries.deltaRounds.get((spark, sfDir, "components"))
      assert(dr != null && dr >= 1,
        s"components loop ran $dr delta rounds — the delta path never engaged")
    } finally {
      spark.conf.unset(GraphQueries.DeltaMinAdjRowsKey)
      spark.conf.unset(GraphQueries.DeltaFrontierMaxRowsKey)
      GraphQueries.clearCache(spark, sfDir)
    }
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
