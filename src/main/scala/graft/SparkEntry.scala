package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{AdvancedQueries, CdcQueries, DedupQueries, GraphQueries, HofQueries, MiningQueries, MultimodalQueries, RelationalQueries, RetrievalQueries, SqlQueries, TextQueries, TimeWindowQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared operator inventory (SURVEY.md §2.6):
  *   - Tier A (CdcQueries): the reference's faithful CDC semantics.
  *   - Tier B (RelationalQueries): joins / aggs / windows / sorts / set ops /
  *     scalar functions.
  *   - Tier D (TextQueries / DedupQueries / VectorQueries): the LLM-pipeline
  *     extensions (text analysis, dedup, similarity search).
  *   - Tier C (streaming) is validated in ScalaTest (StreamingSpec) — no
  *     batch oracle by nature.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core end-to-end path: change stream → envelope → JSON
    * (reference `main.go:50-113`).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_envelope")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++
      RelationalQueries.queries ++
      AdvancedQueries.queries ++
      SqlQueries.queries ++
      HofQueries.queries ++
      TimeWindowQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      GraphQueries.queries ++
      RetrievalQueries.queries ++
      MiningQueries.queries ++
      MultimodalQueries.queries ++
      VectorQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, SimHash, LSH ANN) — those get rows-only checks here
    * and property tests in ScalaTest.
    */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++
      RelationalQueries.oracles ++
      AdvancedQueries.oracles ++
      SqlQueries.oracles ++
      HofQueries.oracles ++
      TimeWindowQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      GraphQueries.oracles ++
      RetrievalQueries.oracles ++
      MiningQueries.oracles ++
      MultimodalQueries.oracles ++
      VectorQueries.oracles
}
