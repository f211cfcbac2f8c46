package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Tier B — the general relational surface (SURVEY.md §2.6 Tier B): joins,
  * aggregations, grouping sets, windows, sort/top-k, set ops, scalar
  * functions. All Spark built-ins (whole-stage-codegen'd); Catalyst owns the
  * physical strategy. Every query is deterministic (full aggregation or
  * ORDER BY over a unique key) and doubles are rounded for the DuckDB oracle.
  */
object RelationalQueries {

  /** Deterministic 2-decimal money rounding: `floor(x*100 + 0.5)/100` is the
    * identical IEEE op sequence in Spark and DuckDB, unlike `round(double, 2)`
    * whose half-way tie-breaking differs between the engines (Spark goes via
    * shortest-repr BigDecimal, DuckDB via scaled nearbyint). Price×discount
    * products land on exact half-cents constantly, so `round` diverges on
    * real data. Non-negative inputs only.
    */
  def money(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + 0.5) / 100.0

  def moneySql(x: String): String = s"floor(($x)*100 + 0.5)/100"

  /** The unique lineitem row key ((l_orderkey, l_linenumber) alone has dups
    * in the testdata) — per-row lineitem queries order by all four so the
    * positional oracle compare is deterministic.
    */
  val liKey: Seq[String] = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  /** The runtime-filter bloom blob for `join_bloom_runtime_filter`,
    * memoized per (session, dir) — a bounded driver artifact (~128 KiB,
    * same contract as the k-means/PQ codebooks). Without the memo, every
    * DataFrame CONSTRUCTION (bench reps, plan-enumeration tooling) re-ran
    * the dim scan + bloom aggregate as an eager job.
    */
  private val dimBloomCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Array[Byte]]()

  private def dimBloomBlob(s: SparkSession, dir: String, dim: DataFrame): Array[Byte] = {
    dimBloomCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    var entry = dimBloomCache.get((s, dir))
    if (entry == null) {
      // build outside the bin lock; a racing duplicate build is benign
      val fresh = dim
        .agg(graft.functions.BloomFilterAgg.bloom_agg(
          xxhash64(col("o_orderkey")), 1 << 20, 5))
        .head().getAs[Array[Byte]](0)
      val prev = dimBloomCache.putIfAbsent((s, dir), fresh)
      entry = if (prev == null) fresh else prev
    }
    entry
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: partial (map-side) + final hash aggregation.
    "q1_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(money(col("l_extendedprice") * (lit(1) - col("l_discount")))), 2).as("sum_disc"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // 3-way equi-join: lineitem ⋈ orders ⋈ customer. orders/customer are the
    // smaller sides; at 100 TB lineitem stays shuffle-partitioned on the key
    // while customer broadcasts — AQE picks that automatically here.
    "join_inner3" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          round(sum(money(col("l_extendedprice") * (lit(1) - col("l_discount")))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // Left outer with a join-side predicate so unmatched rows exist.
    "join_left" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_quantity") > 45, "left")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_rows"),
          count(l("l_orderkey")).as("n_matched"),
          round(sum(coalesce(l("l_quantity"), lit(0.0))), 2).as("qty_sum"))
        .orderBy("o_orderpriority")
    },

    // Right outer (mirror shape).
    "join_right" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, o("o_orderkey") === l("l_orderkey") && l("l_quantity") > 45, "right")
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_rows"),
          count(l("l_orderkey")).as("n_matched"))
        .orderBy("o_orderstatus")
    },

    // Full outer: customers vs. order-placing custkeys, classified.
    "join_full" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_custkey"))
      val o = Tables.orders(s, dir).select(col("o_custkey")).distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .agg(
          sum(when(c("c_custkey").isNotNull && o("o_custkey").isNotNull, 1).otherwise(0)).as("n_both"),
          sum(when(o("o_custkey").isNull, 1).otherwise(0)).as("n_cust_only"),
          sum(when(c("c_custkey").isNull, 1).otherwise(0)).as("n_order_only"))
    },

    // Broadcast join of two tiny dims — explicitly hinted.
    "join_broadcast" -> { (s, dir) =>
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy("n_nationkey")
    },

    // Left-semi = EXISTS.
    "join_semi" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },

    // Left-anti = NOT EXISTS.
    "join_anti" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },

    // Range (theta) join, BANDED-BUCKET form (r11): events paired within a
    // 5-minute window per user. The naive equi-on-user join compares every
    // per-user pair — O(k²) per user inside each hash-join bucket (3.6 s at
    // sf0.1, and a long-history user at 100 TB would be quadratic in their
    // event count). Bucketing ts into width-300s bands and joining on
    // (user, band) with the left side expanded to (band, band+1) makes the
    // equi key carry the TIME locality too: a right event in (ts1, ts1+5min]
    // lands in exactly band(ts1) or band(ts1)+1, so each candidate is
    // produced exactly once, the residual range predicate just trims band
    // edges, and per-bucket work is O(k·density) — the same rewrite that
    // took dedup_incremental_cosine 4.9 → 0.9 s. PlanSpec pins that the
    // join stays a hash equi-join on (u, band).
    "join_range" -> { (s, dir) =>
      val bandUs = 300L * 1000000L // 5 min in µs — the band width IS the range
      val e1 = Tables.events(s, dir).select(
        col("user_id").as("u1"), col("ts").as("ts1"),
        floor(unix_micros(col("ts")) / bandUs).as("b1"))
      val e2 = Tables.events(s, dir).select(
        col("user_id").as("u2"), col("ts").as("ts2"),
        floor(unix_micros(col("ts")) / bandUs).as("band"))
      e1.select(col("u1"), col("ts1"),
          explode(array(col("b1"), col("b1") + 1)).as("b"))
        .join(e2,
          col("u1") === col("u2") && col("b") === col("band") &&
            col("ts2") > col("ts1") &&
            col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("u1").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("user_id"), col("n_pairs"))
        .orderBy("user_id")
    },

    // INTERVAL-OVERLAP JOIN (r17): pairs of intervals that intersect —
    // the third member of the temporal-join family next to point-lookup
    // (join_asof) and bounded-range (join_range). Interval = each line's
    // order-to-ship exposure [o_orderdate, l_shipdate]; the question is
    // "for each part, which pairs of its lines were simultaneously
    // open", and the answer joins on the NATURAL partition key (the
    // part), with the overlap predicate and a total-order pair tie-break
    // as residual conditions — a hash equi-join whose per-key candidate
    // set is bounded by lines-per-part (a data-model constant, the
    // assoc_item_pairs argument), never a cartesian (PlanSpec-pinned).
    // Overlap length in exact integer days; the output is the bounded
    // (overlap-days → pair count, parts touched) histogram.
    "join_interval_overlap" -> { (s, dir) =>
      val iv = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey").as("p"),
          struct(col("l_orderkey"), col("l_linenumber"), col("l_suppkey")).as("k"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("s"),
          datediff(col("l_shipdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("r"))
      // r19: SELF-join on the identical subtree — the r17 shape renamed
      // the two sides' columns BELOW the join, which broke plan
      // canonicalization and executed the interval build twice (two
      // lineitem scans, two orders broadcasts, two exchanges on p —
      // plans/r19/join_interval_overlap_before.txt). With both sides the
      // same plan, the exchange is built once and the second side is a
      // ReusedExchange (§2.4). Same rows, same predicate, same output.
      iv.as("a").join(iv.as("b"), col("a.p") === col("b.p"))
        .filter(col("a.k") < col("b.k") &&
          col("a.s") <= col("b.r") && col("b.s") <= col("a.r"))
        .select(col("a.p").as("p"),
          (least(col("a.r"), col("b.r")) - greatest(col("a.s"), col("b.s")) + 1)
            .as("ov_days"))
        .groupBy("ov_days")
        .agg(count(lit(1)).as("n_pairs"), countDistinct(col("p")).as("n_parts"))
        .orderBy("ov_days")
    },

    // BLOOM RUNTIME-FILTER JOIN (r10): the join-pruning pattern that
    // matters when the dim side is too big to broadcast but its KEY SET
    // still compresses — build an exact-size bloom over the selective
    // dim keys (a bounded driver artifact, ~128 KiB, the same contract
    // as the k-means/PQ codebooks), prune the fact table BEFORE its
    // shuffle with the codegen'd probe, then let the exact join remove
    // the false positives. No false negatives ⟹ result ≡ the plain
    // join, which is exactly what the oracle checks; the win at 100 TB
    // is that ~99 % of fact rows never enter the exchange. Spark's own
    // runtime row-filtering covers simple cases — this is the explicit,
    // plannable form of it. The built blob is MEMOIZED per (session, dir)
    // like the k-means/PQ codebooks (r11): constructing this DataFrame
    // still runs the bounded bloom-build job eagerly the FIRST time, but
    // tooling that merely enumerates `SparkEntry.queries` to build plans
    // no longer pays a dim-scan job per call.
    "join_bloom_runtime_filter" -> { (s, dir) =>
      val dim = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val blob = dimBloomBlob(s, dir, dim)
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"))
        .filter(graft.functions.BloomFilterAgg.bloom_might_contain(
          lit(blob), xxhash64(col("l_orderkey"))))
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("o_orderpriority")
    },

    // SALTED SKEW JOIN (r10): `Skew.saltedJoin` as a first-class query —
    // the explicit mitigation for the one-key-too-hot-for-any-task case
    // AQE's skew split can't always save (a single key larger than a
    // task's memory). The fact side gets a deterministic per-row salt
    // (hash of a disambiguator column, never rand() — retries must land
    // identically), the dim side replicates 8×, and the join key becomes
    // (key, salt) so the hottest key spreads over 8 reducers. Salting is
    // correctness-neutral by construction; the oracle is the PLAIN join,
    // which is exactly the point.
    "join_salted_skew" -> { (s, dir) =>
      val facts = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey"), col("l_quantity"))
      val dim = Tables.orders(s, dir)
        .select(col("o_orderkey").as("ok"), col("o_orderpriority"))
      Skew.saltedJoin(facts, dim, "ok", "l_partkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("o_orderpriority")
    },

    // As-of join: for each purchase, the latest click value at or before it,
    // via the merge-ordered window emulation (no native as-of in Spark SQL;
    // at 100 TB this is a single shuffle on user_id + in-partition sort).
    "join_asof" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("click_v",
          when(col("event_type") === "click", col("value")))
        .withColumn("asof_click",
          last(col("click_v"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"),
          col("user_id"),
          round(col("asof_click"), 2).as("asof_click"))
        .orderBy("event_id")
    },

    // The same as-of semantics through the NATIVE operator (custom
    // LogicalPlan + SparkStrategy + SparkPlan, graft.plans.AsofJoin): one
    // shuffle per side on user_id, in-partition (by, on) sort, single
    // two-pointer merge — no union, no window state. The value-IS-NOT-NULL
    // filter on the right mirrors the emulation's IGNORE NULLS.
    "join_asof_native" -> { (s, dir) =>
      val purchases = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = Tables.events(s, dir) // fresh read → fresh attribute ids
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id").as("u_id"), col("ts").as("click_ts"),
          col("event_id").as("click_eid"), col("value").as("click_v"))
      graft.plans.Asof.join(purchases, clicks,
        by = Seq("user_id"), on = Seq("ts", "event_id"), exclusive = true,
        rightBy = Seq("u_id"), rightOn = Seq("click_ts", "click_eid"))
        .select(
          col("event_id"), col("user_id"),
          round(col("click_v"), 2).as("asof_click"))
        .orderBy("event_id")
    },

    // AS-OF JOIN WITH TOLERANCE (r13): the feature-store variant — the
    // latest prior click joins a purchase ONLY if it happened within the
    // last 5 minutes; staler matches are nulled, purchases stay (left
    // semantics). This is pandas/polars `merge_asof(tolerance=...)`, the
    // shape online-feature backfills actually use ("the feature must be
    // fresh"). Plan: the SAME native single-merge operator as
    // join_asof_native — tolerance is a post-projection mask on the
    // matched pair's timestamps, so the scale story (one shuffle per
    // side, in-partition two-pointer merge, no window state) is
    // unchanged; the mask adds zero exchanges.
    "join_asof_tolerance" -> { (s, dir) =>
      val purchases = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = Tables.events(s, dir)
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id").as("u_id"), col("ts").as("click_ts"),
          col("event_id").as("click_eid"), col("value").as("click_v"))
      graft.plans.Asof.join(purchases, clicks,
        by = Seq("user_id"), on = Seq("ts", "event_id"), exclusive = true,
        rightBy = Seq("u_id"), rightOn = Seq("click_ts", "click_eid"))
        .select(
          col("event_id"), col("user_id"),
          when(unix_micros(col("ts")) - unix_micros(col("click_ts"))
            <= lit(300000000L), round(col("click_v"), 2)).as("asof_click_5m"))
        .orderBy("event_id")
    },

    // NEAREST-EVENT JOIN (r16): each purchase enriched with its NEAREST
    // click in time — either direction, ties to the earlier one — the
    // merge_asof(direction='nearest') shape sensor/feature pipelines ask
    // for next to plain as-of. Composed from TWO passes of the native
    // [[graft.plans.Asof]] operator: the backward pass as-is, the forward
    // pass as a backward pass over NEGATED integer keys (earliest-after ≡
    // latest-before under order reversal, exclusive both ways), then a
    // per-row argmin of the two candidate distances. Scale story is the
    // operator's own twice: one shuffle per side per direction,
    // in-partition two-pointer merges, no window state.
    "join_nearest_event" -> { (s, dir) =>
      val purchases = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("t"))
      val clicks = Tables.events(s, dir)
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id").as("u_id"), col("ts").as("click_ts"),
          col("event_id").as("click_eid"), col("value").as("click_v"))
      val back = graft.plans.Asof.join(purchases, clicks,
          by = Seq("user_id"), on = Seq("ts", "event_id"), exclusive = true,
          rightBy = Seq("u_id"), rightOn = Seq("click_ts", "click_eid"))
        .select(col("event_id"), col("user_id"), col("t"),
          col("click_v").as("bv"), unix_micros(col("click_ts")).as("bt"))
      val pf = purchases
        .withColumn("nt", -col("t"))
        .withColumn("neid", -col("event_id"))
      val cf = clicks
        .withColumn("nct", -unix_micros(col("click_ts")))
        .withColumn("nceid", -col("click_eid"))
      val fwd = graft.plans.Asof.join(pf, cf,
          by = Seq("user_id"), on = Seq("nt", "neid"), exclusive = true,
          rightBy = Seq("u_id"), rightOn = Seq("nct", "nceid"))
        .select(col("event_id").as("eid2"),
          col("click_v").as("fv"), unix_micros(col("click_ts")).as("ft"))
      back.join(fwd, col("event_id") === col("eid2"), "left")
        .select(col("event_id"), col("user_id"),
          round(
            when(col("bt").isNull && col("ft").isNull, lit(null))
              .when(col("ft").isNull, col("bv"))
              .when(col("bt").isNull, col("fv"))
              .when(col("t") - col("bt") <= col("ft") - col("t"), col("bv"))
              .otherwise(col("fv")), 2).as("nearest_click"),
          when(col("bt").isNull && col("ft").isNull, lit("none"))
            .when(col("ft").isNull, lit("prev"))
            .when(col("bt").isNull, lit("next"))
            .when(col("t") - col("bt") <= col("ft") - col("t"), lit("prev"))
            .otherwise(lit("next")).as("direction"))
        .orderBy("event_id")
    },

    // BUCKETED RANGE JOIN (r14): the standard rewrite that turns a
    // value-in-interval theta join into an EQUI join — each interval of
    // the band dimension is exploded onto a fixed grid (one row per
    // 5000-dollar cell it overlaps), each fact row maps to its single
    // cell, and the join runs on the cell id with the BETWEEN residual
    // re-checked after. With a handful of bands a plain broadcast
    // suffices, but the grid shape is what survives when the interval
    // table is millions of rows (calendars, IP ranges, geo tiles): the
    // theta join that would be O(facts × bands) becomes one shuffle on
    // the grid key with per-cell fanout bounded by overlapping bands.
    // Irregular band edges on purpose — a uniform grid would collapse
    // into width_bucket and prove nothing.
    "join_range_bucketed" -> { (s, dir) =>
      import s.implicits._
      val W = 500000L // grid cell = $5,000 in cents
      val bands = Seq(
        (1L, 0L, 199999L), (2L, 200000L, 499999L), (3L, 500000L, 1499999L),
        (4L, 1500000L, 3999999L), (5L, 4000000L, 6999999L),
        (6L, 7000000L, 99999999L))
        .toDF("band_id", "lo_cents", "hi_cents")
      val cells = bands.select(col("band_id"), col("lo_cents"), col("hi_cents"),
        explode(sequence(expr(s"lo_cents div $W"), expr(s"hi_cents div $W")))
          .as("cell"))
      val li = Tables.lineitem(s, dir)
        .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
        .withColumn("cell", expr(s"cents div $W"))
      li.join(broadcast(cells), Seq("cell"))
        .filter(col("cents") >= col("lo_cents") && col("cents") <= col("hi_cents"))
        .groupBy("band_id", "lo_cents", "hi_cents")
        .agg(count(lit(1)).as("n_items"),
          sum(col("cents").cast(
            org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)))
            .cast("long").as("sum_cents"))
        .orderBy("band_id")
    },

    // Exact distinct aggregation (expands to two-phase agg under the hood).
    "agg_count_distinct" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // ROLLUP with grouping-null disambiguation via coalesce.
    "agg_rollup" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("qty"), col("n"))
        .orderBy("rf", "ls")
    },

    // CUBE.
    "agg_cube" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("qty"), col("n"))
        .orderBy("rf", "ls")
    },

    // Statistical aggregates.
    "agg_stats" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_linestatus")
        .agg(
          round(min(col("l_quantity")), 2).as("min_q"),
          round(max(col("l_quantity")), 2).as("max_q"),
          round(avg(col("l_quantity")), 2).as("avg_q"),
          round(stddev_samp(col("l_quantity")), 2).as("sd_q"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus")
    },

    // HLL sketch — no DuckDB oracle (different sketch); error-bound checked
    // in ScalaTest instead (SURVEY.md §2.6).
    "agg_approx_distinct" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
    },

    // HLL SKETCH-MERGE (r12): the shard-then-merge distinct count — THE
    // 100 TB cardinality pattern: each shard (here 16 hash shards of the
    // fact table; in production each day/partition/site) builds its own
    // Datasketches HLL once, the tiny sketches are stored, and any
    // cross-shard rollup is a register-max UNION of sketches — no
    // re-scan, no shuffle of raw keys, mergeable across time and space
    // (exactly what approx_count_distinct alone cannot give you: its
    // estimate is not a stored, re-unionable artifact). HLL build and
    // union are hash-deterministic (no RNG) and the union is
    // commutative-associative, so the output is stable under any
    // partitioning. No DuckDB oracle (its approx_distinct is a different
    // sketch): `ApproxSpec` pins the union estimate EQUAL to the
    // whole-table sketch estimate (merge associativity) and within the
    // lgK=14 error envelope of the exact count.
    "agg_hll_union" -> { (s, dir) =>
      // ONE corpus pass (r17, verdict ask #7): the deduplicated
      // (shard, key) GRAIN is the only corpus-scale shuffle. HLL
      // insertion is idempotent and hash-deterministic, so the per-shard
      // sketch built over the grain is byte-identical to one built over
      // the raw rows; the per-shard exact count is the grain's row count;
      // the global exact distinct is one more ledger-sized dedup of the
      // grain (AQE serves both consumers from the reused grain exchange).
      // The r16 shape paid a second corpus scan plus two raw-key
      // distinct-Expand shuffles for the same output (1.93 s → ~0.8 s).
      // NULL keys stay excluded (countDistinct semantics — the r16 shape;
      // a NULL would otherwise survive the grain and inflate the exacts)
      val grain = Tables.lineitem(s, dir)
        .where(col("l_partkey").isNotNull)
        .select((col("l_orderkey") % 16).as("shard"), col("l_partkey"))
        .distinct()
      val shards = grain
        .groupBy("shard")
        .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"),
          count(lit(1)).as("exact_shard"))
      val exact = grain.select("l_partkey").distinct()
        .agg(count(lit(1)).as("exact_parts"))
      shards
        .agg(
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_parts"),
          count(lit(1)).as("n_shards"),
          sum(col("exact_shard")).as("sum_shard_distinct"))
        .crossJoin(broadcast(exact))
        .select(col("approx_parts"), col("exact_parts"), col("n_shards"),
          // shard-distinct sum ≥ true distinct (keys span shards) — the
          // double-counting a naive per-shard rollup commits
          col("sum_shard_distinct"),
          expr("abs(approx_parts - exact_parts) * 1000000 div exact_parts")
            .as("err_ppm"))
    },

    // Ranking windows: rank over values, row_number over a unique total order.
    // r19: the filtered output is BOUNDED (≤ 5 rows per returnflag, flags
    // a data-model constant), but the global orderBy's range-exchange
    // sampling pass re-executes its child — i.e. the full corpus window —
    // a second time. localCheckpoint materializes the bounded survivor
    // set once (the window runs distributed, exactly once); the tail sort
    // then orders a handful of rows.
    "window_rank" -> { (s, dir) =>
      val byQty = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity").desc)
      val unique = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, dir)
        .select(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          rank().over(byQty).as("rnk"),
          dense_rank().over(byQty).as("drnk"),
          row_number().over(unique).as("rn"))
        .filter(col("rn") <= 5)
        .localCheckpoint()
        .orderBy("l_returnflag", "rn")
    },

    // lag/lead. r19: the rounds ride ABOVE the final sort (the window
    // itself must stay below — its partitioning differs), so the
    // BigDecimal rounding runs once, not twice under the sampling pass.
    "window_lag_lead" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"), col("o_custkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_raw"),
          lead(col("o_totalprice"), 1).over(w).as("next_raw"))
        .orderBy("o_orderkey")
        .select(
          col("o_orderkey"), col("o_custkey"),
          round(col("prev_raw"), 2).as("prev_tp"),
          round(col("next_raw"), 2).as("next_tp"))
    },

    // ROWS frame: running sum + trailing moving average.
    // r19: rounds ABOVE the global sort (run once, and the exchange
    // carries the raw doubles only). A localCheckpoint before the sort
    // was A/B'd like window_range_frame's and REVERTED: here it benched
    // +0.13 s (the materialization of the corpus-width window output
    // costs more than the sampling pass's re-run of this cheaper frame).
    "window_rows_frame" -> { (s, dir) =>
      // l_partkey completes a total order — (suppkey, shipdate, orderkey,
      // linenumber) ties exist at sf0.1, making running sums ambiguous
      val ord = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
      val running = ord.rowsBetween(Window.unboundedPreceding, 0)
      val trailing = ord.rowsBetween(-3, 0)
      Tables.lineitem(s, dir)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          sum(col("l_quantity")).over(running).as("run_raw"),
          avg(col("l_quantity")).over(trailing).as("ma4_raw"))
        .orderBy(liKey.map(col): _*)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          round(col("run_raw"), 2).as("run_qty"),
          round(col("ma4_raw"), 2).as("ma4_qty"))
    },

    // RANGE frame over a numeric ordering column.
    // r19: same materialize-before-sort contract as window_rows_frame —
    // the corpus range-frame window runs once, not twice under the
    // sampling pass, and the round moves above the sort.
    "window_range_frame" -> { (s, dir) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity"))
        .rangeBetween(-5, 0)
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_returnflag"), col("l_quantity"),
          count(lit(1)).over(w).as("n_in_band"),
          sum(col("l_quantity")).over(w).as("band_raw"))
        .localCheckpoint()
        .orderBy(liKey.map(col): _*)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_returnflag"), col("l_quantity"),
          col("n_in_band"),
          round(col("band_raw"), 2).as("qty_in_band"))
    },

    // Global sort + limit → TakeOrderedAndProject (no full sort at scale).
    "sort_topk" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("tp"))
        .orderBy(col("tp").desc, col("o_orderkey"))
        .limit(100)
    },

    // Per-group top-k via row_number — the scalable top-k pattern.
    "topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .select(
          col("c_mktsegment"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("bal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    },

    // Set ops over key sets: big spenders vs. high balances.
    "set_union" -> { (s, dir) =>
      bigSpenders(s, dir).union(richCustomers(s, dir)).distinct().orderBy("k")
    },
    "set_intersect" -> { (s, dir) =>
      bigSpenders(s, dir).intersect(richCustomers(s, dir)).orderBy("k")
    },
    "set_except" -> { (s, dir) =>
      bigSpenders(s, dir).except(richCustomers(s, dir)).orderBy("k")
    },

    // Scalar string functions.
    "scalar_string" -> { (s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 10, 6).as("sub"),
          length(col("c_name")).as("len"),
          trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          size(split(col("c_name"), "#")).as("n_parts"),
          concat_ws("-", col("c_mktsegment"), col("c_name")).as("joined"))
        .orderBy("c_custkey")
    },

    // Scalar date functions. Projection ABOVE the sort (r19, same
    // contract as scalar_math): one evaluation of the date renders, and
    // the exchange carries (key, date) instead of 6 derived columns.
    "scalar_date" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"))
        .orderBy("o_orderkey")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mon_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
    },

    // Scalar math functions. The computed columns sit ABOVE the global
    // sort (r19): the range exchange's sampling pass re-executes the
    // exchange child, so any projection below the sort is evaluated twice
    // (8 round()s = 8 BigDecimal allocations per row), and its 8 computed
    // doubles would ride the exchange where the 3 base columns suffice —
    // the sort keys are plain base columns, so ordering is unchanged.
    "scalar_math" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_tax"), col("l_discount"))
        .orderBy(liKey.map(col): _*)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          round(sqrt(col("l_quantity")), 4).as("sqrt_q"),
          round(pow(lit(1) + col("l_tax"), 2), 6).as("pow_tax"),
          round(abs(col("l_discount") - 0.05), 4).as("abs_d"),
          ceil(col("l_quantity") / 7).cast("long").as("ceil_q"),
          floor(col("l_quantity") / 7).cast("long").as("floor_q"),
          (col("l_orderkey") % 7).as("mod7"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(log(lit(1) + col("l_quantity")), 6).as("ln_q"))
    },

    // Array functions over tokenized text.
    "scalar_array" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(toks).as("n_toks"),
          array_contains(toks, "data").as("has_data"),
          element_at(toks, 1).as("first_tok"),
          element_at(toks, -1).as("last_tok"),
          size(array_distinct(toks)).as("n_distinct"))
        .orderBy("doc_id")
    },

    // Map functions (construct + access).
    "scalar_map" -> { (s, dir) =>
      val m = map(
        lit("seg"), col("c_mktsegment"),
        lit("name"), col("c_name"))
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          element_at(m, "seg").as("seg"),
          size(m).as("m_size"))
        .orderBy("c_custkey")
    },

    // from_json → typed struct → field access (R16 typed variant).
    // JSON parse ABOVE the sort (r19, same contract as scalar_math): the
    // sampling pass below a range exchange re-runs the child, so parsing
    // below the sort runs twice and ships the parsed field instead of the
    // base row.
    "json_from_json" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("props"))
        .orderBy("event_id")
        .select(
          col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").cast("long").as("k"))
    },

    // Z-ORDER LAYOUT — the multi-dimensional clustering key behind file
    // skipping on two filter columns at once (the Delta/Iceberg OPTIMIZE
    // ZORDER idea): interleave the low 10 bits of l_partkey and l_suppkey
    // into one 20-bit Morton code; writing sorted by it makes every file's
    // (partkey, suppkey) min/max stats a tight bounding box, so a scan
    // filtered on EITHER column prunes files. Pure integer bit arithmetic
    // (codegen'd, map-only until the final tiny rollup); the query emits the
    // per-bucket bounding boxes — the pruning-quality evidence: each of the
    // 64 buckets covers a ~1/8 slice of both key ranges simultaneously.
    "pipeline_zorder_layout" -> { (s, dir) =>
      val p = (col("l_partkey") % 1024).cast("long")
      val q = (col("l_suppkey") % 1024).cast("long")
      val zval = (0 until 10).map { i =>
        shiftleft(shiftright(p, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduce(_ + _)
      Tables.lineitem(s, dir)
        .select(p.as("pb"), q.as("qb"), zval.as("zval"))
        .withColumn("bucket", expr("zval div 16384"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("pb")).as("p_min"), max(col("pb")).as("p_max"),
          min(col("qb")).as("q_min"), max(col("qb")).as("q_max"),
          min(col("zval")).as("z_min"))
        .orderBy("bucket")
    })

  private def bigSpenders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("spend"))
      .filter(col("spend") > 300000)
      .select(col("o_custkey").as("k"))

  private def richCustomers(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k"))

  private val setA =
    "SELECT o_custkey AS k FROM orders GROUP BY o_custkey HAVING sum(o_totalprice) > 300000"
  private val setB =
    "SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000"

  val oracles: Map[String, String] = Map(
    "join_range_bucketed" ->
      """WITH bands(band_id, lo_cents, hi_cents) AS (VALUES
        |  (1, 0, 199999), (2, 200000, 499999), (3, 500000, 1499999),
        |  (4, 1500000, 3999999), (5, 4000000, 6999999),
        |  (6, 7000000, 99999999)),
        |li AS (
        |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem)
        |SELECT CAST(band_id AS BIGINT) AS band_id,
        |       CAST(lo_cents AS BIGINT) AS lo_cents,
        |       CAST(hi_cents AS BIGINT) AS hi_cents,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(cents AS HUGEINT)) AS BIGINT) AS sum_cents
        |FROM li JOIN bands ON cents BETWEEN lo_cents AND hi_cents
        |GROUP BY 1, 2, 3 ORDER BY band_id""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       round(sum(l_quantity), 2) AS sum_qty,
         |       round(sum(l_extendedprice), 2) AS sum_base,
         |       round(sum(${moneySql("l_extendedprice * (1 - l_discount)")}), 2) AS sum_disc,
         |       round(avg(l_quantity), 2) AS avg_qty,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "join_inner3" ->
      s"""SELECT c_mktsegment,
         |       round(sum(${moneySql("l_extendedprice * (1 - l_discount)")}), 2) AS revenue,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_left" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(l_orderkey) AS BIGINT) AS n_matched,
        |       round(sum(coalesce(l_quantity, 0)), 2) AS qty_sum
        |FROM orders LEFT JOIN lineitem
        |  ON o_orderkey = l_orderkey AND l_quantity > 45
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_bloom_runtime_filter" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_salted_skew" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_right" ->
      """SELECT o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(l_orderkey) AS BIGINT) AS n_matched
        |FROM lineitem RIGHT JOIN orders
        |  ON o_orderkey = l_orderkey AND l_quantity > 45
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_full" ->
      """SELECT CAST(sum(CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
        |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cust_only,
        |       CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_order_only
        |FROM (SELECT c_custkey FROM customer) c
        |FULL JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |  ON c_custkey = o_custkey""".stripMargin,

    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_range" ->
      """SELECT e1.user_id, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts > e1.ts
        | AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_interval_overlap" ->
      """WITH iv AS (
        |  SELECT l_partkey AS p,
        |         ROW(l_orderkey, l_linenumber, l_suppkey) AS k,
        |         datediff('day', DATE '1970-01-01',
        |                  CAST(o_orderdate AS DATE)) AS s,
        |         datediff('day', DATE '1970-01-01',
        |                  CAST(l_shipdate AS DATE)) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |)
        |SELECT CAST(least(a.r, b.r) - greatest(a.s, b.s) + 1 AS BIGINT)
        |         AS ov_days,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(count(DISTINCT a.p) AS BIGINT) AS n_parts
        |FROM iv a JOIN iv b
        |  ON a.p = b.p AND a.k < b.k AND a.s <= b.r AND b.s <= a.r
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_asof" ->
      """SELECT event_id, user_id, round(asof_v, 2) AS asof_click
        |FROM (
        |  SELECT event_id, user_id, event_type,
        |         last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_v
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // Tolerance face: the windowed emulation carries the matched click's
    // TIMESTAMP alongside its value (both IGNORE-NULLS last_values pick
    // the same row — the conditions are identical), then masks stale
    // matches exactly like the native plan's projection.
    "join_asof_tolerance" ->
      """SELECT event_id, user_id,
        |       CASE WHEN ts - asof_ts <= INTERVAL '300' SECOND
        |            THEN round(asof_v, 2) END AS asof_click_5m
        |FROM (
        |  SELECT event_id, user_id, event_type, ts,
        |         last_value(CASE WHEN event_type = 'click' AND value IS NOT NULL
        |                         THEN value END IGNORE NULLS)
        |           OVER w AS asof_v,
        |         last_value(CASE WHEN event_type = 'click' AND value IS NOT NULL
        |                         THEN ts END IGNORE NULLS)
        |           OVER w AS asof_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "join_nearest_event" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t
        |  FROM events
        |), w AS (
        |  SELECT event_id, user_id, event_type, t,
        |    last_value(CASE WHEN event_type = 'click' AND value IS NOT NULL
        |               THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bv,
        |    last_value(CASE WHEN event_type = 'click' AND value IS NOT NULL
        |               THEN t END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bt,
        |    first_value(CASE WHEN event_type = 'click' AND value IS NOT NULL
        |                THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fv,
        |    first_value(CASE WHEN event_type = 'click' AND value IS NOT NULL
        |                THEN t END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ft
        |  FROM e
        |)
        |SELECT event_id, user_id,
        |       round(CASE WHEN bt IS NULL AND ft IS NULL THEN NULL
        |                  WHEN ft IS NULL THEN bv
        |                  WHEN bt IS NULL THEN fv
        |                  WHEN t - bt <= ft - t THEN bv
        |                  ELSE fv END, 2) AS nearest_click,
        |       CASE WHEN bt IS NULL AND ft IS NULL THEN 'none'
        |            WHEN ft IS NULL THEN 'prev'
        |            WHEN bt IS NULL THEN 'next'
        |            WHEN t - bt <= ft - t THEN 'prev'
        |            ELSE 'next' END AS direction
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // Same result as join_asof — the native operator must be
    // indistinguishable from the windowed emulation.
    "join_asof_native" ->
      """SELECT event_id, user_id, round(asof_v, 2) AS asof_click
        |FROM (
        |  SELECT event_id, user_id, event_type,
        |         last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_v
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "agg_count_distinct" ->
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       round(sum(l_quantity), 2) AS qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       round(sum(l_quantity), 2) AS qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "agg_stats" ->
      """SELECT l_linestatus,
        |       round(min(l_quantity), 2) AS min_q,
        |       round(max(l_quantity), 2) AS max_q,
        |       round(avg(l_quantity), 2) AS avg_q,
        |       round(stddev_samp(l_quantity), 2) AS sd_q,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |       CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk, CAST(rn AS INT) AS rn
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |         rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
        |         dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk,
        |         row_number() OVER (PARTITION BY l_returnflag
        |                            ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 5 ORDER BY l_returnflag, rn""".stripMargin,

    "window_lag_lead" ->
      """SELECT o_orderkey, o_custkey,
        |       round(lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS prev_tp,
        |       round(lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS next_tp
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "window_rows_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
        |       round(sum(l_quantity) OVER w_run, 2) AS run_qty,
        |       round(avg(l_quantity) OVER w_ma, 2) AS ma4_qty
        |FROM lineitem
        |WINDOW
        |  w_run AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_ma AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "window_range_frame" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, l_quantity,
        |       CAST(count(*) OVER w AS BIGINT) AS n_in_band,
        |       round(sum(l_quantity) OVER w, 2) AS qty_in_band
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
        |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "sort_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS tp
        |FROM orders ORDER BY tp DESC, o_orderkey LIMIT 100""".stripMargin,

    "topk_per_group" ->
      """SELECT c_mktsegment, c_custkey, bal, CAST(rn AS INT) AS rn FROM (
        |  SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS bal,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "set_union" -> s"SELECT k FROM ($setA UNION $setB) ORDER BY k",
    "set_intersect" -> s"SELECT k FROM ($setA INTERSECT $setB) ORDER BY k",
    "set_except" -> s"SELECT k FROM ($setA EXCEPT $setB) ORDER BY k",

    "scalar_string" ->
      """SELECT c_custkey,
        |       upper(c_name) AS up,
        |       lower(c_mktsegment) AS lo,
        |       substring(c_name, 10, 6) AS sub,
        |       CAST(length(c_name) AS INT) AS len,
        |       trim('  ' || c_name || '  ') AS trimmed,
        |       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |       CAST(len(string_split(c_name, '#')) AS INT) AS n_parts,
        |       concat_ws('-', c_mktsegment, c_name) AS joined
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scalar_date" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       CAST(day(o_orderdate) AS INT) AS dom,
        |       CAST(quarter(o_orderdate) AS INT) AS qtr,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon_start,
        |       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       round(sqrt(l_quantity), 4) AS sqrt_q,
        |       round(pow(1 + l_tax, 2), 6) AS pow_tax,
        |       round(abs(l_discount - 0.05), 4) AS abs_d,
        |       CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q,
        |       CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q,
        |       l_orderkey % 7 AS mod7,
        |       round(exp(l_discount), 6) AS exp_d,
        |       round(ln(1 + l_quantity), 6) AS ln_q
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "scalar_array" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
        |       list_contains(string_split(text, ' '), 'data') AS has_data,
        |       string_split(text, ' ')[1] AS first_tok,
        |       string_split(text, ' ')[-1] AS last_tok,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,

    "scalar_map" ->
      """SELECT c_custkey, c_mktsegment AS seg, 2 AS m_size
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "json_from_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "pipeline_zorder_layout" -> {
      val zSql = (0 until 10).map { i =>
        s"((((l_partkey % 1024) >> $i) & 1) << ${2 * i}) + " +
          s"((((l_suppkey % 1024) >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      s"""WITH z AS (
         |  SELECT CAST(l_partkey % 1024 AS BIGINT) AS pb,
         |         CAST(l_suppkey % 1024 AS BIGINT) AS qb,
         |         CAST($zSql AS BIGINT) AS zval
         |  FROM lineitem
         |)
         |SELECT CAST(zval // 16384 AS BIGINT) AS bucket,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       min(pb) AS p_min, max(pb) AS p_max,
         |       min(qb) AS q_min, max(qb) AS q_max,
         |       min(zval) AS z_min
         |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
    })
}
