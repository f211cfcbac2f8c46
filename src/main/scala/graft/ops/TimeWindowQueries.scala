package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Tier C's batch-checkable face — event-time windowing semantics expressed
  * over the `events` table (SURVEY.md §2.6 Tier C): tumbling and sliding
  * `window()`, and `session_window()`. The same constructs run unchanged in
  * Structured Streaming (StreamingSpec asserts batch/stream equivalence);
  * here they get DuckDB oracles via bucket arithmetic and gaps-and-islands.
  *
  * `events.ts` is µs-precision (verified: ns component is 0 for every row),
  * so the nanos→micros read conversion is lossless and window boundaries are
  * bit-comparable across engines.
  */
object TimeWindowQueries {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 10-minute windows: count + sum per (window, event_type).
    // One shuffle on (bucket, type); partial agg map-side. At 100 TB this is
    // the canonical pre-aggregation shape.
    "window_tumbling" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(
          date_format(col("w.start"), fmt).as("w_start"),
          col("event_type"), col("n"), col("sum_v"))
        .orderBy("w_start", "event_type")
    },

    // Sliding windows (10 min length, 5 min slide): each event lands in 2
    // windows — Spark expands then aggregates; same single shuffle.
    "window_sliding" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("w.start"), fmt).as("w_start"), col("n"))
        .orderBy("w_start")
    },

    // Session windows per user, 5-minute gap. Spark semantics: an event
    // extends the session iff ts < previous ts + gap; session end = last
    // event + gap. The oracle reproduces this with gaps-and-islands SQL.
    "window_session" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(
          col("user_id"),
          date_format(col("w.start"), fmt).as("s_start"),
          date_format(col("w.end"), fmt).as("s_end"),
          col("n"), col("sum_v"))
        .orderBy("user_id", "s_start")
    })

  val oracles: Map[String, String] = Map(
    "window_tumbling" ->
      """SELECT strftime(to_timestamp(floor(epoch(ts) / 600) * 600), '%Y-%m-%d %H:%M:%S') AS w_start,
        |       event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "window_sliding" ->
      """SELECT w_start, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT strftime(to_timestamp(floor(epoch(ts) / 300) * 300), '%Y-%m-%d %H:%M:%S') AS w_start FROM events
        |  UNION ALL
        |  SELECT strftime(to_timestamp(floor(epoch(ts) / 300) * 300 - 300), '%Y-%m-%d %H:%M:%S') FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "window_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), numbered AS (
        |  SELECT user_id, ts, value,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        |       strftime(max(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_v
        |FROM numbered GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin)
}
