package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Array higher-order functions, multiset set-ops, cross join, null-safe
  * equality join — the remaining relational corners of SURVEY.md §2.6.
  */
object HofQueries {

  private def toks: Column = split(col("text"), " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // transform / filter / exists / forall / aggregate over token arrays.
    // HOF chain ABOVE the global sort (r19, the scalar_math contract):
    // the tokenize + lambda folds run once per row, not twice under the
    // range exchange's sampling pass.
    "scalar_hof" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(
          col("doc_id"),
          element_at(transform(toks, t => upper(t)), 1).as("first_upper"),
          size(filter(toks, t => length(t) > 4)).as("n_long"),
          exists(toks, t => t === "data").as("has_data"),
          forall(toks, t => length(t) > 0).as("all_nonempty"),
          aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("total_chars"))
    },

    // Map higher-order functions: transform_values / map_filter /
    // map_zip_with over a per-row measure map.
    // Map-HOF projection ABOVE the global sort (r19): the range
    // exchange's sampling pass re-runs the child, so the lambda chain
    // below the sort executes twice per row; the sort keys are plain base
    // columns, so ordering is unchanged and only the 2 source doubles
    // ride the exchange.
    "scalar_map_hof" -> { (s, dir) =>
      val m = map(
        lit("q"), col("l_quantity"),
        lit("d"), col("l_discount"))
      val doubled = transform_values(m, (_, v) => v * 2)
      val big = map_filter(doubled, (_, v) => v > 10)
      val zipped = map_zip_with(m, doubled, (_, a, b) => b - a)
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_discount"))
        .orderBy(RelationalQueries.liKey.map(col): _*)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          round(element_at(doubled, "q"), 2).as("q2"),
          size(big).as("n_big"),
          round(element_at(zipped, "d"), 4).as("d_delta"))
    },

    // regexp_extract_all (array result joined to a canonical string).
    "scalar_regexp_all" -> { (s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          array_join(regexp_extract_all(col("c_name"), lit("[0-9]+"), lit(0)), ",")
            .as("all_digits"),
          size(regexp_extract_all(col("c_name"), lit("[a-z]+"), lit(0))).as("n_words"))
        .orderBy("c_custkey")
    },

    // Multiset EXCEPT ALL / INTERSECT ALL (multiplicity-preserving),
    // aggregated to per-key counts for deterministic compare.
    "set_except_all" -> { (s, dir) =>
      val a = Tables.lineitem(s, dir).filter(col("l_quantity") > 25).select("l_suppkey")
      val b = Tables.lineitem(s, dir).filter(col("l_discount") > 0.05).select("l_suppkey")
      a.exceptAll(b)
        .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
        .orderBy("l_suppkey")
    },
    "set_intersect_all" -> { (s, dir) =>
      val a = Tables.lineitem(s, dir).filter(col("l_quantity") > 25).select("l_suppkey")
      val b = Tables.lineitem(s, dir).filter(col("l_discount") > 0.05).select("l_suppkey")
      a.intersectAll(b)
        .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
        .orderBy("l_suppkey")
    },

    // Array set operations (distinct semantics), canonicalized to sorted
    // joined strings for cross-engine compare.
    "scalar_array_setops" -> { (s, dir) =>
      val ts = split(col("text"), " ")
      val head = array_distinct(slice(ts, 1, 10))
      val tail = array_distinct(slice(ts, -10, 10))
      // empty-set renderings differ across engines ('' vs NULL) — nullif
      // canonicalizes both to NULL
      def canon(c: org.apache.spark.sql.Column) =
        nullif(array_join(array_sort(c), ","), lit(""))
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          canon(array_union(head, tail)).as("u"),
          canon(array_intersect(head, tail)).as("i"),
          canon(array_except(head, tail)).as("e"))
        .orderBy("doc_id")
    },

    // explode vs explode_outer: rows whose array filters to empty survive
    // only the outer variant (with a null element) — the left-join-shaped
    // unnest every flattening pipeline needs.
    "scalar_explode_outer" -> { (s, dir) =>
      val longToks = filter(split(col("text"), " "), t => length(t) >= 8)
      Tables.documents(s, dir)
        .select(col("doc_id"), explode_outer(longToks).as("tok"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("tok")).as("n_toks"))
        .orderBy("doc_id")
    },

    // Cross join (tiny dims only — deliberately; Catalyst broadcasts it).
    "join_cross" -> { (s, dir) =>
      Tables.nation(s, dir).crossJoin(Tables.region(s, dir))
        .select(col("n_nationkey"), col("r_regionkey"), col("n_name"), col("r_name"))
        .orderBy("n_nationkey", "r_regionkey")
    },

    // Null-safe equality join (<=>): null keys match each other, unlike =.
    "join_null_safe" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), nullif(col("c_nationkey"), lit(3)).as("ck"))
      val n = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"),
          nullif(col("n_nationkey"), lit(3)).as("nk"))
      c.join(n, col("ck") <=> col("nk"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("n_name")
    })

  val oracles: Map[String, String] = Map(
    "scalar_hof" ->
      """SELECT doc_id,
        |       upper(string_split(text, ' ')[1]) AS first_upper,
        |       CAST(len(list_filter(string_split(text, ' '), t -> strlen(t) > 4)) AS INT) AS n_long,
        |       len(list_filter(string_split(text, ' '), t -> t = 'data')) > 0 AS has_data,
        |       len(list_filter(string_split(text, ' '), t -> NOT strlen(t) > 0)) = 0 AS all_nonempty,
        |       CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
        |            t -> CAST(strlen(t) AS INT))), (a, b) -> a + b) AS INT) AS total_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "scalar_map_hof" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       round(l_quantity * 2, 2) AS q2,
        |       CAST((CASE WHEN l_quantity * 2 > 10 THEN 1 ELSE 0 END)
        |          + (CASE WHEN l_discount * 2 > 10 THEN 1 ELSE 0 END) AS INT) AS n_big,
        |       round(l_discount * 2 - l_discount, 4) AS d_delta
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "scalar_regexp_all" ->
      """SELECT c_custkey,
        |       array_to_string(regexp_extract_all(c_name, '[0-9]+', 0), ',') AS all_digits,
        |       CAST(len(regexp_extract_all(c_name, '[a-z]+', 0)) AS INT) AS n_words
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "set_except_all" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 25
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_discount > 0.05)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "set_intersect_all" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 25
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_discount > 0.05)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "scalar_array_setops" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(string_split(text, ' ')[1:10]) AS h,
        |         list_distinct(string_split(text, ' ')[-10:]) AS tl
        |  FROM documents)
        |SELECT doc_id,
        |       nullif(array_to_string(list_sort(list_distinct(list_concat(h, tl))), ','), '') AS u,
        |       nullif(array_to_string(list_sort(list_filter(h, x -> list_contains(tl, x))), ','), '') AS i,
        |       nullif(array_to_string(list_sort(list_filter(h, x -> NOT list_contains(tl, x))), ','), '') AS e
        |FROM t ORDER BY doc_id""".stripMargin,

    "scalar_explode_outer" ->
      """SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(tok) AS BIGINT) AS n_toks
        |FROM (
        |  SELECT doc_id,
        |         unnest(CASE WHEN len(lt) = 0 THEN [NULL] ELSE lt END) AS tok
        |  FROM (SELECT doc_id,
        |               list_filter(string_split(text, ' '), t -> strlen(t) >= 8) AS lt
        |        FROM documents))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_cross" ->
      """SELECT n_nationkey, r_regionkey, n_name, r_name
        |FROM nation CROSS JOIN region
        |ORDER BY n_nationkey, r_regionkey""".stripMargin,

    "join_null_safe" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust
        |FROM (SELECT c_custkey, nullif(c_nationkey, 3) AS ck FROM customer) c
        |JOIN (SELECT n_nationkey, n_name, nullif(n_nationkey, 3) AS nk FROM nation) n
        |  ON c.ck IS NOT DISTINCT FROM n.nk
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
