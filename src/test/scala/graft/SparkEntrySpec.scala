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
    TextQueries.queries, DedupQueries.queries, MultimodalQueries.queries,
    VectorQueries.queries)

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

  test("flagship entry returns rows (the driver's t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
