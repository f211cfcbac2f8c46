package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The SQL entry surface: the same engine driven through `spark.sql` over
  * registered views — CTEs, correlated/scalar/IN subqueries, GROUPING SETS,
  * PIVOT. Catalyst compiles these to the same physical plans as the
  * DataFrame API; declaring them separately proves the SQL-text surface a
  * reference user would script against.
  */
object SqlQueries {

  /** Register all testdata tables as temp views — once per (session,
    * dir): re-registration per query invocation re-ran 11 catalog ops
    * under every sql_* rep (r14; the table loads themselves are cached
    * in [[Tables.load]]). A dir switch in one session re-registers.
    */
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def registerViews(s: SparkSession, dir: String): Unit = {
    registeredDir.keySet.removeIf(_.sparkContext.isStopped)
    // Views FIRST, the dir record AFTER (r15 ADVICE): publishing the dir
    // before registration let a concurrent caller race into `spark.sql`
    // against not-yet-registered views, and a registration failure left a
    // poisoned entry that permanently skipped re-registration. compute()
    // runs the loop inside the bin lock (same-session callers block until
    // the views exist) and leaves the mapping ABSENT if it throws, so the
    // next caller retries instead of inheriting a half-registered catalog.
    registeredDir.compute(s, (_, prev) => {
      if (prev != dir) {
        Tables.all.foreach { t =>
          Tables.load(s, dir, t).createOrReplaceTempView(t)
          if (t == "events") Tables.events(s, dir).createOrReplaceTempView(t)
        }
      }
      dir
    })
    ()
  }

  private def q(sql: String): (SparkSession, String) => DataFrame = { (s, dir) =>
    registerViews(s, dir)
    s.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // WITH-clause pipeline: revenue per nation through a CTE chain.
    "sql_cte" -> q(
      """WITH cust_rev AS (
        |  SELECT o_custkey, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY o_custkey
        |), nat_rev AS (
        |  SELECT c_nationkey, round(sum(rev), 2) AS nation_rev,
        |         CAST(count(*) AS BIGINT) AS n_cust
        |  FROM cust_rev JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_nationkey)
        |SELECT n_name, nation_rev, n_cust
        |FROM nat_rev JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin),

    // Correlated EXISTS subquery.
    "sql_exists" -> q(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    // Scalar subquery in the projection + predicate.
    "sql_scalar_subquery" -> q(
      """SELECT o_orderkey, round(o_totalprice, 2) AS tp,
        |       round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2) AS delta
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
        |ORDER BY o_orderkey""".stripMargin),

    // IN / NOT IN subqueries.
    "sql_in_subquery" -> q(
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin),

    // Explicit GROUPING SETS with grouping() disambiguation.
    "sql_grouping_sets" -> q(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       round(sum(l_quantity), 2) AS qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin),

    // PIVOT: order counts per priority × status (oracle via FILTER
    // aggregation). Missing combinations pivot to null in Spark — coalesced
    // to 0 to match COUNT semantics.
    "sql_pivot" -> q(
      """SELECT o_orderpriority,
        |       coalesce(st_o, 0) AS st_o, coalesce(st_f, 0) AS st_f,
        |       coalesce(st_p, 0) AS st_p
        |FROM (
        |  SELECT o_orderpriority, o_orderstatus FROM orders)
        |PIVOT (count(*) FOR o_orderstatus IN ('O' AS st_o, 'F' AS st_f, 'P' AS st_p))
        |ORDER BY o_orderpriority""".stripMargin),

    // UNPIVOT / stack: wide → long over the lineitem charge columns.
    // r19: round() ABOVE the sort (outer projection over the ordered
    // subquery — Catalyst keeps the subquery Sort; plan-checked): the
    // range exchange's sampling pass re-executes its child, so a
    // projection below the sort pays the 1.2M-row BigDecimal round
    // twice. The oracle keeps the single-block ORDER BY text.
    "sql_unpivot" -> q(
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, metric,
        |       round(v, 2) AS v_r
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, metric, v
        |  FROM lineitem
        |  UNPIVOT (v FOR metric IN (l_discount AS disc, l_tax AS tax))
        |  ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, metric)""".stripMargin),

    // Aggregate FILTER clause (r13) — the standard-SQL conditional
    // aggregation surface (one pass, many predicated aggregates). The
    // plain FILTER aggregates compile into the aggregate's own predicate,
    // but mixing them with `count(DISTINCT) FILTER` makes Catalyst plan an
    // Expand (×2 of the full scan, every column duplicated per row) plus a
    // 3-key aggregate over 2n rows — measured 1.17 s where the family norm
    // is ~0.3 (the r13 verdict's ask #7). The r14 form is the manual
    // distinct rewrite: one map-side-combined partial aggregate keyed
    // (l_linestatus, l_partkey) — n rows in, ~|parts| out, no Expand —
    // then a ~|parts|-row rollup where `count_if(has_bulk)` IS the
    // filtered distinct count (each inner group is one distinct partkey).
    // Same rows as the oracle's FILTER-clause text, which keeps the
    // standard surface as the contract. Money via floor-cents (moneySql).
    "sql_filter_clause" -> q(
      """SELECT l_linestatus,
        |       CAST(sum(cnt) AS BIGINT) AS n,
        |       CAST(sum(cnt_ret) AS BIGINT) AS n_returned,
        |       CAST(sum(dc) AS BIGINT) AS disc_cents,
        |       CAST(count_if(has_bulk) AS BIGINT) AS bulk_parts
        |FROM (
        |  SELECT l_linestatus, l_partkey,
        |         count(*) AS cnt,
        |         count(*) FILTER (WHERE l_returnflag = 'R') AS cnt_ret,
        |         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |           FILTER (WHERE l_discount > 0.05) AS dc,
        |         max(l_quantity >= 40) AS has_bulk
        |  FROM lineitem GROUP BY l_linestatus, l_partkey)
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    // QUALIFY-style window filter (r13): top-2 orders per customer by
    // (price, orderkey). Spark has no QUALIFY keyword, so the Spark text
    // nests the window in a subquery — SAME plan Catalyst emits for
    // DuckDB's QUALIFY (window, then filter above it); the oracle uses
    // the actual QUALIFY clause, proving the surface maps. Deterministic
    // total order; cents-exact ordering key.
    "sql_qualify" -> q(
      """SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (
        |           PARTITION BY o_custkey
        |           ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
        |                    o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin),

    // Lateral view explode through SQL.
    "sql_lateral_explode" -> q(
      """SELECT doc_id, pos, tok
        |FROM documents
        |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
        |WHERE pos < 3
        |ORDER BY doc_id, pos""".stripMargin),

    // RECURSIVE CTE (Spark 4's WITH RECURSIVE): iterative graph walk
    // inside the engine — each supplier key walks its synthetic parent
    // chain (parent = key div 10, a deterministic tree over the real key
    // space) to the root, and the report folds the walk's terminal rows by
    // depth. The recursion is engine-iterated (one join per level, bounded
    // by the key width — 6 levels here, never unbounded), the same shape a
    // BOM explosion or org-chart rollup takes; dedup_components covers the
    // unbounded-iteration variant with explicit lineage checkpoints.
    "sql_recursive_cte" -> q(
      """WITH RECURSIVE walk(key, cur, depth) AS (
        |  SELECT s_suppkey AS key, s_suppkey AS cur, 0 AS depth FROM supplier
        |  UNION ALL
        |  SELECT key, cur div 10 AS cur, depth + 1 AS depth FROM walk WHERE cur > 0
        |)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_keys,
        |       min(key) AS key_min, max(key) AS key_max
        |FROM walk WHERE cur = 0
        |GROUP BY depth ORDER BY depth""".stripMargin))

  val oracles: Map[String, String] = Map(
    "sql_filter_clause" ->
      """SELECT l_linestatus,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
        |         AS n_returned,
        |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |            FILTER (WHERE l_discount > 0.05) AS BIGINT)
        |         AS disc_cents,
        |       CAST(count(DISTINCT l_partkey) FILTER (WHERE l_quantity >= 40)
        |            AS BIGINT) AS bulk_parts
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    // The real QUALIFY clause — the Spark side expresses the identical
    // window-then-filter in a subquery.
    "sql_qualify" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(row_number() OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
        |                  o_orderkey) AS BIGINT) AS rn
        |FROM orders
        |QUALIFY rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,

    "sql_cte" ->
      """WITH cust_rev AS (
        |  SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY o_custkey
        |), nat_rev AS (
        |  SELECT c_nationkey, round(sum(rev), 2) AS nation_rev,
        |         CAST(count(*) AS BIGINT) AS n_cust
        |  FROM cust_rev JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey)
        |SELECT n_name, nation_rev, n_cust
        |FROM nat_rev JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,

    "sql_exists" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "sql_scalar_subquery" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS tp,
        |       round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2) AS delta
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
        |ORDER BY o_orderkey""".stripMargin,

    "sql_in_subquery" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin,

    "sql_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       round(sum(l_quantity), 2) AS qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin,

    "sql_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS st_o,
        |       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS st_f,
        |       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS st_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "sql_unpivot" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, metric, round(v, 2) AS v_r
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, 'disc' AS metric, l_discount AS v FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, 'tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, metric""".stripMargin,

    "sql_lateral_explode" ->
      """SELECT doc_id, CAST(pos - 1 AS INT) AS pos, tok FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents)
        |WHERE pos <= 3 ORDER BY doc_id, pos""".stripMargin,

    "sql_recursive_cte" ->
      """WITH RECURSIVE walk(key, cur, depth) AS (
        |  SELECT s_suppkey, s_suppkey, 0 FROM supplier
        |  UNION ALL
        |  SELECT key, cur // 10, depth + 1 FROM walk WHERE cur > 0
        |)
        |SELECT CAST(depth AS INT) AS depth, CAST(count(*) AS BIGINT) AS n_keys,
        |       min(key) AS key_min, max(key) AS key_max
        |FROM walk WHERE cur = 0
        |GROUP BY depth ORDER BY depth""".stripMargin)
}
