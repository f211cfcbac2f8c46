package graft

import graft.ops._

/** Driver-contract guards: no silent query-name collisions between modules
  * (Map ++ would drop one), every oracle belongs to a declared query, and
  * the flagship entry returns rows.
  */
class SparkEntrySpec extends SparkSuite {

  private val moduleQueries = Seq(
    CdcQueries.queries, RelationalQueries.queries, AdvancedQueries.queries,
    SqlQueries.queries, HofQueries.queries, TimeWindowQueries.queries,
    TextQueries.queries, DedupQueries.queries, GraphQueries.queries,
    RetrievalQueries.queries, MiningQueries.queries,
    MultimodalQueries.queries, VectorQueries.queries)

  test("no query-name collisions across modules") {
    val total = moduleQueries.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      s"merged ${SparkEntry.queries.size} != sum $total — duplicate names: " +
        moduleQueries.flatMap(_.keys).groupBy(identity)
          .collect { case (k, v) if v.size > 1 => k }.mkString(", "))
  }

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, orphans.toString)
  }

  test("no duplicate query keys WITHIN a module's Map literal (shadowed dead code)") {
    // A Map literal with a repeated key silently keeps the LAST entry —
    // the cross-module collision test can't see it because the module's
    // own Map already deduplicated. r14 shipped (and caught in review)
    // a re-added agg_gini/agg_hhi pair that shadowed the r12 originals
    // as dead code. Source-level guard: a declared query's `"name" ->`
    // token may appear at most twice in its module file (query entry +
    // oracle entry); a third occurrence is a duplicate definition.
    val files = java.nio.file.Files.list(
      java.nio.file.Paths.get("src/main/scala/graft/ops")).iterator()
    val texts = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => p.getFileName.toString ->
        new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8))
      .toSeq
    val offenders = SparkEntry.queries.keys.toSeq.flatMap { name =>
      val tok = "\"" + name + "\" ->"
      texts.collect {
        case (f, t) if t.sliding(tok.length).count(_ == tok) > 2 =>
          s"$f: $name appears ${t.sliding(tok.length).count(_ == tok)}x"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("flagship entry returns rows (the driver's t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("documented inventory counts match the code (no doc drift)") {
    // COVERAGE.md and README.md each carry an `Inventory: N declared / M
    // oracle-checked` line; r8's audit caught both stale (133/125 vs the
    // real 137/129) because the counts were hand-maintained prose. This
    // guard makes the docs fail the build instead of drifting.
    val declared = SparkEntry.queries.size
    val oracle = SparkEntry.oracleSql.size
    val marker = """Inventory: (\d+)\s*declared / (\d+)\s*oracle-checked""".r
    Seq("COVERAGE.md", "README.md").foreach { f =>
      val p = java.nio.file.Paths.get(f)
      assert(java.nio.file.Files.exists(p), s"$f missing")
      val text = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      marker.findFirstMatchIn(text) match {
        case None => fail(s"$f lacks an 'Inventory: N declared / M oracle-checked' line")
        case Some(m) =>
          assert(m.group(1).toInt == declared && m.group(2).toInt == oracle,
            s"$f documents ${m.group(1)}/${m.group(2)} but the code declares " +
              s"$declared/$oracle — update the doc's Inventory line")
      }
    }
  }
}
