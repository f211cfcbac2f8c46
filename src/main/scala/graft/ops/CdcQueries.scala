package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.cdc.{Envelope, Normalize, Routing}

/** Tier A — the reference's faithful CDC semantics expressed as
  * batch-checkable queries over the `events` stand-in change stream and
  * `lineitem` (SURVEY.md §2.6 Tier A). Each query has a DuckDB oracle.
  *
  * `events.event_type` plays the role of the CDC routing/action key
  * (reference `main.go:51-60`), per FIXTURES.md §3.
  */
object CdcQueries {

  /** Test routing map (FIXTURES.md §3): 'error' is deliberately unmapped and
    * must be dropped, mirroring the unmapped-table drop (`main.go:51-55`).
    */
  val testGroups: Map[String, Seq[String]] = Map(
    "grp_engage" -> Seq("click", "view"),
    "grp_convert" -> Seq("purchase", "signup"))

  val tableToGroup: Map[String, String] =
    Routing.invert(testGroups, Seq("grp_engage", "grp_convert"))

  /** The pt-table-checksum chunk ledger over `customer` (the
    * `cdc_snapshot_checksum` kernel): per key-range chunk, (row count,
    * key range, order-independent content checksum — md5 over the
    * canonical '|'-joined row with doubles pre-quantized to integer
    * cents, folded to Σ ascii(hex_i)·i and SUM'd, so partials combine in
    * any partition order). With `replica = true` two CDC failure modes
    * are injected exactly, AFTER cents quantization: lost deletes
    * (keys ≡ 0 mod 131 missing) and a one-cent skew (keys ≡ 0 mod 97).
    */
  private def chunkLedger(s: SparkSession, dir: String, replica: Boolean): DataFrame = {
    val base = Tables.customer(s, dir)
    val src = if (replica) base.filter(col("c_custkey") % 131 =!= 0) else base
    val cents0 = floor(col("c_acctbal") * 100 + 0.5).cast("long")
    val cents =
      if (replica) cents0 + when(col("c_custkey") % 97 === 0, 1L).otherwise(0L)
      else cents0
    val canon = concat_ws("|",
      col("c_custkey").cast("string"), col("c_name"),
      col("c_nationkey").cast("string"), cents.cast("string"),
      col("c_mktsegment"))
    val h = md5(canon)
    val folded = (1 to 32).map(i => ascii(substring(h, i, 1)) * lit(i))
      .reduce(_ + _).cast("long")
    src.select(expr("c_custkey div 100").as("bucket"),
        col("c_custkey"), folded.as("rh"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("c_custkey")).as("key_min"),
        max(col("c_custkey")).as("key_max"),
        sum(col("rh")).as("chk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R4 + R12: group semi-filter + keyed routing, as a literal map expr that
    // stays inside whole-stage codegen (broadcast-join shape in Routing).
    "cdc_route_filter" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("grp", Routing.groupExpr(col("event_type"), tableToGroup))
        .filter(col("grp").isNotNull)
        .groupBy("grp")
        .agg(count(lit(1)).as("n"))
        .orderBy("grp")
    },

    // R5: action-type predicate (keep insert/update analog, drop the rest).
    "cdc_action_filter" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(
          col("event_id"),
          col("event_type"),
          round(col("value"), 2).as("value_r"))
        .orderBy("event_id")
    },

    // ORDERING AUDIT (r16): the binlog-position-vs-commit-time
    // monotonicity check every CDC operator runs when replication lags —
    // per stream (event_type as the table analog): how many events
    // arrived with a commit timestamp BEHIND the high-water mark of
    // earlier log positions (event_id = the position analog), and the
    // worst observed lateness. One per-stream sorted window pass (the
    // running max excludes the current row so an event can't mask its own
    // lateness), one bounded aggregate — the shape a 100 TB replication
    // fleet audit would run per table.
    "cdc_ordering_audit" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          expr("unix_micros(ts)").as("t"))
        .withColumn("hwm", max(col("t")).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("hwm").isNotNull && col("t") < col("hwm"), 1L)
            .otherwise(0L)).as("n_late"),
          coalesce(max(when(col("hwm").isNotNull && col("t") < col("hwm"),
            col("hwm") - col("t"))), lit(0L)).as("max_lateness_us"))
        .orderBy("event_type")
    },

    // R10 + R11: envelope struct + to_json with nulls kept (json.Marshal
    // semantics, `main.go:80-88`).
    // Envelope rendering ABOVE the sort (r19): the range exchange's
    // sampling pass re-runs the child, so rendering below the sort
    // serializes every row to JSON twice and ships the ~200 B envelope
    // string through the exchange where the narrow base row suffices.
    "cdc_envelope" -> { (s, dir) =>
      val after = map(
        lit("event_id"), col("event_id").cast("string"),
        lit("event_type"), col("event_type"),
        lit("props"), col("props"),
        lit("user_id"), col("user_id").cast("string"))
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("props"), col("user_id"))
        .orderBy("event_id")
        .select(
          col("event_id"),
          Envelope.toJsonColumn(
            Envelope.envelope(Envelope.nullBefore, after, lit("events")))
            .as("envelope"))
    },

    // R8 booleans: tinyint(1) semantics incl. else→false (H9).
    // The normalization projections in this family sit ABOVE the global
    // sort (r19): the range exchange's sampling pass re-executes the
    // exchange child, so a projection below the sort is evaluated twice
    // and its rendered/normalized columns ride the exchange where the
    // narrow base columns suffice. Sort keys are plain base columns, so
    // row order is unchanged.
    "cdc_type_norm_bool" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_partkey"),
          col("l_suppkey"))
        .orderBy(RelationalQueries.liKey.map(col): _*)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_partkey"),
          col("l_suppkey"),
          Normalize.normBool(col("l_linenumber")).as("b"))
    },

    // R8 dates: date → RFC3339 with midnight time part (`main.go:147-154`).
    "cdc_type_norm_date" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_partkey"),
          col("l_suppkey"),
          col("l_shipdate"))
        .orderBy(RelationalQueries.liKey.map(col): _*)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_partkey"),
          col("l_suppkey"),
          Normalize.normDateTyped(col("l_shipdate")).as("ship_rfc3339"))
    },

    // R8 numerics: int→int64, float/decimal→float64 (`main.go:183-194`).
    "cdc_type_norm_num" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_partkey"),
          col("l_suppkey"),
          col("l_quantity"),
          col("l_extendedprice"),
          col("l_discount"))
        .orderBy(RelationalQueries.liKey.map(col): _*)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_partkey"),
          col("l_suppkey"),
          Normalize.normInt(col("l_linenumber")).as("ln_i64"),
          Normalize.normFloat(col("l_quantity")).as("qty_f64"),
          RelationalQueries.money(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_r"))
    },

    // R8 text: strict-base64 round trip + passthrough (H1). '#' in customer
    // names is outside the base64 alphabet, so `raw` must pass through.
    "cdc_type_norm_text" -> { (s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          col("c_name"),
          Normalize.normText(base64(col("c_name").cast("binary"))).as("dec"),
          Normalize.normText(col("c_name")).as("raw"))
        .orderBy("c_custkey")
    },

    // R16: JSON field extraction (`$.source.table` analog). Extraction
    // ABOVE the sort (r19) — one JSON parse per row, not two (the range
    // exchange's sampling pass re-runs anything below the sort).
    "cdc_json_extract" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("props"))
        .orderBy("event_id")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
    },

    // R7: update before/after pairing via lag over the per-key change order.
    "cdc_update_pairing" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, dir)
        .select(
          col("event_id"),
          col("user_id"),
          round(col("value"), 2).as("after_v"),
          round(lag(col("value"), 1).over(w), 2).as("before_v"))
        .orderBy("event_id")
    },

    // H3: at-least-once replay collapse — duplicate the stream, dedup by key.
    // groupBy (not dropDuplicates) so map-side partial aggregation kicks in
    // at scale.
    "cdc_dedup_replay" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      e.unionAll(e)
        .groupBy("event_id")
        .agg(
          min(col("event_type")).as("event_type"),
          count(lit(1)).as("copies"))
        .orderBy("event_id")
    },

    // SCHEMA-DRIFT DETECTION: the per-key first-appearance ledger of the
    // change stream's JSON payload — when a producer adds a column, the new
    // key surfaces here with the event_id it first rode in on, which is how
    // a CDC consumer notices upstream DDL without seeing the DDL (the
    // reference forwards raw JSON and leaves drift to the HTTP consumer).
    // One scan + one map-side-combined aggregate over exploded key names;
    // output is the live key vocabulary (tiny), input-scale-free.
    "cdc_schema_drift" -> { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), explode(json_object_keys(col("props"))).as("key"))
        .groupBy("key")
        .agg(min(col("event_id")).as("first_seen"), count(lit(1)).as("n_events"))
        .orderBy("key")
    },

    // CDC MATERIALIZATION ("apply changes"): fold a change log onto a base
    // snapshot to the table's current state — the consumer-side half the
    // reference leaves to whoever drains its HTTP/queue feed. `customer` is
    // the snapshot (pk = c_custkey), `events` the keyed change stream
    // (pk = user_id, change order = event_id, 'error' = delete, any other
    // action = upsert). Last-writer-wins per key is ONE hash aggregate
    // (map-side combined max_by — the standard log compaction; at 100 TB of
    // changes the shuffle carries one partial row per key per task), then
    // one full-outer join on pk against the snapshot. Deleted keys stay in
    // the output labeled 'deleted' with a null value — the audit view; the
    // live table is `WHERE action <> 'deleted'`.
    "cdc_apply_changes" -> { (s, dir) =>
      // ONE max_by over a struct of the carried fields, not one per field:
      // the struct is never NULL even when a field is, so Spark's max_by and
      // DuckDB's arg_max (which skips NULL args) pick the same winning row
      // regardless of NULL values at the winning event_id.
      val last = Tables.events(s, dir)
        .groupBy(col("user_id").as("pk"))
        .agg(
          max_by(
            struct(col("event_type").as("op"), col("value").as("v")),
            col("event_id")).as("w"),
          count(lit(1)).as("n_changes"))
        .select(
          col("pk"), col("w.op").as("op"), col("w.v").as("v"),
          col("n_changes"))
      val base = Tables.customer(s, dir)
        .select(col("c_custkey").as("bpk"), col("c_acctbal"))
      base.join(last, col("bpk") === col("pk"), "full_outer")
        .select(
          coalesce(col("bpk"), col("pk")).as("pk"),
          when(col("pk").isNull, lit("kept"))
            .when(col("op") === "error", lit("deleted"))
            .when(col("bpk").isNull, lit("inserted"))
            .otherwise(lit("updated")).as("action"),
          round(when(col("op") === "error", lit(null))
            .when(col("pk").isNull, col("c_acctbal"))
            .otherwise(col("v")), 2).as("val_r"),
          coalesce(col("n_changes"), lit(0L)).as("n_changes"))
        .orderBy("pk")
    },

    // SNAPSHOT CHECKSUM — the pt-table-checksum shape: the integrity check
    // a CDC consumer runs to prove its materialization (cdc_apply_changes)
    // still matches the master without shipping rows. The table is chunked
    // by key range (bucket = key div 100) and each chunk reduces to
    // (row count, key range, content checksum); master and replica compare
    // these tiny ledgers and re-sync only mismatched chunks. The checksum
    // must be ORDER-INDEPENDENT (chunks arrive in any partition order) and
    // engine-portable: md5 over a canonical '|'-joined row string (doubles
    // canonicalized to integer cents first — a raw double-to-string cast
    // would diverge between engines), folded to an integer as the
    // position-weighted byte sum Σ ascii(hex_i)·i, then SUM'd per chunk —
    // commutative, integer-exact, no CRC builtin needed on either side.
    // One map-side-combined hash aggregate; at 100 TB each executor emits
    // one partial per local chunk and only the ledger moves.
    "cdc_snapshot_checksum" -> { (s, dir) =>
      chunkLedger(s, dir, replica = false).orderBy("bucket")
    },

    // CHECKSUM DIVERGENCE REPORT (r12): the second half of
    // pt-table-checksum — `cdc_snapshot_checksum` builds the per-chunk
    // ledger; this query COMPARES master's ledger to a replica's and
    // names each drifted chunk, which is the actual re-sync work list a
    // repair job consumes. The replica is the master with two simulated
    // CDC failure modes injected exactly (both applied AFTER cents
    // quantization so the drift is integer-precise, never a float
    // artifact): lost deletes (keys ≡ 0 mod 131 missing) and a
    // one-cent balance skew (keys ≡ 0 mod 97). Verdict per chunk:
    // row-count mismatch trumps checksum mismatch (a count diff makes
    // the checksum diff uninformative). Plan: the two ledgers are
    // independent map-side-combined aggregates; the full-outer merge
    // joins two O(chunks) artifacts — at 100 TB only ledgers move.
    "cdc_checksum_diff" -> { (s, dir) =>
      val m = chunkLedger(s, dir, replica = false)
        .select(col("bucket"), col("n_rows").as("n_master"),
          col("chk").as("chk_master"))
      val r = chunkLedger(s, dir, replica = true)
        .select(col("bucket"), col("n_rows").as("n_replica"),
          col("chk").as("chk_replica"))
      m.join(r, Seq("bucket"), "full_outer")
        .select(col("bucket"), col("n_master"), col("n_replica"),
          col("chk_master"), col("chk_replica"),
          when(col("n_master").isNull, lit("replica_only"))
            .when(col("n_replica").isNull, lit("master_only"))
            .when(col("n_master") =!= col("n_replica"), lit("count_mismatch"))
            .when(col("chk_master") =!= col("chk_replica"),
              lit("checksum_mismatch"))
            .otherwise(lit("ok")).as("status"))
        .orderBy("bucket")
    },

    // SCD TYPE-2 MATERIALIZATION: the history-keeping sibling of
    // `cdc_apply_changes` — every change becomes a versioned row whose
    // validity interval runs to the key's NEXT change (open = current).
    // One partitioned window per key (hash-partitioned by pk at scale —
    // no global ordering anywhere); `event_id` is the change ordinate, so
    // the intervals are integer-exact. A delete ('error') closes the
    // key's history: its row carries a null value and is never current.
    "cdc_scd2" -> { (s, dir) =>
      val w = Window.partitionBy("pk").orderBy("event_id")
      Tables.events(s, dir)
        .select(
          col("user_id").as("pk"), col("event_id"),
          col("event_type").as("op"), col("value"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("event_id"), 1).over(w))
        .select(
          col("pk"), col("version"),
          col("event_id").as("valid_from"), col("valid_to"),
          col("op"),
          round(when(col("op") === "error", lit(null)).otherwise(col("value")), 2)
            .as("val_r"),
          (col("valid_to").isNull && col("op") =!= "error").as("is_current"))
        .orderBy("pk", "version")
    },

    // REPLICATION FRESHNESS ledger — the per-destination staleness monitor
    // every CDC deployment runs next to the pipeline (the reference's only
    // observability is a per-event log line, `logger/logger.go`; the
    // operational question it can't answer is "how far behind is each
    // group?"). Per routing group: event count, head position (max event
    // time in µs), and lag behind the stream head. Plan shape: ONE
    // map-side-combined hash aggregate over the routed stream plus a
    // broadcast of the 1-row global head — no window, no second scan, and
    // at 100 TB the shuffle carries n_groups partial rows per task.
    "cdc_freshness" -> { (s, dir) =>
      val routed = Tables.events(s, dir)
        .withColumn("grp", Routing.groupExpr(col("event_type"), tableToGroup))
        .filter(col("grp").isNotNull)
        .select(col("grp"), expr("unix_micros(ts)").as("t"))
      val head = routed.agg(max(col("t")).as("t_head"))
      routed.groupBy("grp")
        .agg(count(lit(1)).as("n"), max(col("t")).as("t_last"))
        .crossJoin(broadcast(head))
        .select(col("grp"), col("n"), col("t_last"),
          (col("t_head") - col("t_last")).as("lag_us"))
        .orderBy("grp")
    },

    // TIME TRAVEL — the AS OF query event sourcing exists for: reconstruct
    // every key's state at a past log position (here the half-history
    // point, derived from the data so the query is scale-free) by folding
    // only the changes at-or-before the cutoff. Same null-robust
    // max_by-over-struct kernel as cdc_apply_changes; the cutoff is a
    // broadcast 1-row aggregate, the fold is one map-side-combined hash
    // aggregate over the filtered log — at 100 TB the position filter
    // rides the scan (binlog files beyond the cutoff prune entirely).
    "cdc_time_travel" -> { (s, dir) =>
      val cut = Tables.events(s, dir)
        .agg(floor(max(col("event_id")) / 2).cast("long").as("as_of"))
      Tables.events(s, dir)
        .crossJoin(broadcast(cut))
        .filter(col("event_id") <= col("as_of"))
        .groupBy(col("user_id").as("pk"))
        .agg(
          max_by(
            struct(col("event_type").as("op"), col("value").as("v")),
            col("event_id")).as("w"),
          count(lit(1)).as("n_changes"),
          max(col("event_id")).as("last_event"),
          min(col("as_of")).as("as_of"))
        .select(
          col("pk"), col("w.op").as("op"),
          round(col("w.v"), 2).as("val_r"),
          col("n_changes"), col("last_event"), col("as_of"))
        .orderBy("pk")
    },

    // INCREMENTAL VIEW MAINTENANCE — aggregate (r10). The Z-set/DBSP
    // shape: each change carries a signed multiplicity (+1 insert/update
    // image, −1 for the delete analog 'error'), so any SUM/COUNT view is
    // maintainable by pure ledger addition. The query materializes the
    // BASE ledger (event_id % 10 < 7 — "already applied"), the DELTA
    // ledger (the new 30%), and merges them with a full-outer coalesce —
    // never re-touching base rows. At 100 TB the base ledger is the
    // stored view (group-count-sized); only the delta batch is scanned
    // and only ledger rows shuffle. Provenance columns (n_base/n_delta)
    // pin that the merge really consumed both sides.
    "cdc_ivm_agg" -> { (s, dir) =>
      // INTEGER-CENTS ledgers: the value sums go through
      // floor(v·100+0.5) BEFORE summation so the base ledger, the delta
      // ledger, and their merge are all integer-EXACT — the same house
      // rule every cross-engine float hazard here follows, and doubly
      // right for IVM, where a float ledger would accumulate drift over
      // unbounded maintenance batches.
      val cents = floor(col("value") * 100 + 0.5).cast("long")
      def ledger(df: DataFrame, nAs: String): DataFrame =
        df.groupBy(col("user_id").as("pk"))
          .agg(count(lit(1)).as(nAs),
            sum(when(col("event_type") === "error", -1L).otherwise(1L)).as("net_n"),
            sum(when(col("event_type") === "error", -cents).otherwise(cents))
              .as("net_c"))
      val ev = Tables.events(s, dir)
      val base = ledger(ev.filter(col("event_id") % 10 < 7), "n_base")
      val delta = ledger(ev.filter(col("event_id") % 10 >= 7), "n_delta")
      base.as("b").join(delta.as("d"), col("b.pk") === col("d.pk"), "full_outer")
        .select(
          coalesce(col("b.pk"), col("d.pk")).as("pk"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_delta"), lit(0L)).as("n_delta"),
          (coalesce(col("b.net_n"), lit(0L)) + coalesce(col("d.net_n"), lit(0L)))
            .as("net_n"),
          ((coalesce(col("b.net_c"), lit(0L)) + coalesce(col("d.net_c"), lit(0L)))
            / 100.0).as("net_v_r"))
        .orderBy("pk")
    },

    // INCREMENTAL VIEW MAINTENANCE — join (r10). The delta-join identity:
    // with A = orders, B = customer and deltas ΔA (o_orderkey % 5 = 0),
    // ΔB (c_custkey % 7 = 0),
    //   ΔV = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB,
    // so the maintained view V_new = V_old + ΔV never rejoins
    // A_old⋈B_old. Here V is the per-nation (count, revenue) rollup:
    // V_old's ledger plays the stored materialization, the three delta
    // terms aggregate into one ΔV ledger, and the merge is a full-outer
    // coalesce over ~25 nation rows. Every join keeps the dimension side
    // broadcast; at 100 TB only ΔA (the new fact partition) is scanned
    // against broadcast B, which is the entire point of IVM.
    "cdc_ivm_join" -> { (s, dir) =>
      val a = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val b = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val dA = a.filter(col("o_orderkey") % 5 === 0)
      val aOld = a.filter(col("o_orderkey") % 5 =!= 0)
      val dB = b.filter(col("c_custkey") % 7 === 0)
      val bOld = b.filter(col("c_custkey") % 7 =!= 0)
      // integer cents (see cdc_ivm_agg): partial ledgers merge exactly
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      def led(df: DataFrame, nAs: String, vAs: String): DataFrame =
        df.groupBy(col("c_nationkey").as("nation"))
          .agg(count(lit(1)).as(nAs), sum(cents).as(vAs))
      val vOld = led(aOld.join(broadcast(bOld),
        col("o_custkey") === col("c_custkey")), "n_old", "v_old")
      val dV = led(
        dA.join(broadcast(bOld), col("o_custkey") === col("c_custkey"))
          .unionByName(aOld.join(broadcast(dB), col("o_custkey") === col("c_custkey")))
          .unionByName(dA.join(broadcast(dB), col("o_custkey") === col("c_custkey"))),
        "n_delta", "v_delta")
      vOld.as("o").join(dV.as("d"), col("o.nation") === col("d.nation"), "full_outer")
        .select(
          coalesce(col("o.nation"), col("d.nation")).as("nation"),
          coalesce(col("n_old"), lit(0L)).as("n_old"),
          coalesce(col("n_delta"), lit(0L)).as("n_delta"),
          (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_delta"), lit(0L)))
            .as("n_pairs"),
          ((coalesce(col("v_old"), lit(0L)) + coalesce(col("v_delta"), lit(0L)))
            / 100.0).as("sum_price_r"))
        .orderBy("nation")
    },

    // LAST-WRITER-WINS REGISTER (r11): multi-master conflict resolution —
    // the merge rule every active-active CDC topology needs when two
    // sites update the same row concurrently. Each event is an update to
    // register `user_id` from site `event_id % 3`; the winner is the max
    // (ts, site, event_id) triple — the LWW-register CRDT with a total
    // deterministic tie-break, which is exactly what makes the merge
    // CONVERGENT: any subset order of arrivals (any shuffle, any
    // partial-aggregation order) yields the same winner because max over
    // a total order is associative+commutative. ONE map-side-combined
    // max_by aggregate; the conflict profile (sites-seen count) rides
    // the same pass via a bounded bit-set OR (3 sites → 3 bits).
    "cdc_lww_register" -> { (s, dir) =>
      val site = (col("event_id") % 3).as("site")
      Tables.events(s, dir)
        .select(col("user_id").as("pk"), col("event_id"), col("ts"),
          col("value"), site)
        .groupBy("pk")
        .agg(
          max(struct(col("ts"), col("site"), col("event_id"),
            col("value"))).as("w"),
          count(lit(1)).as("n_writes"),
          expr("bit_or(1 << CAST(site AS INT))").as("site_bits"))
        .select(col("pk"),
          col("w.event_id").as("winner_event"),
          col("w.site").as("winner_site"),
          round(col("w.value"), 2).as("value_r"),
          col("n_writes"),
          expr("bit_count(site_bits)").cast("long").as("n_sites"))
        .orderBy("pk")
    },

    // TOMBSTONE GC (r12): the retention decision a compacted changelog
    // runs over delete markers. The reference DROPS deletes outright
    // (hazard H2, `main.go:56-60`); a log-compacted consumer instead
    // keeps a tombstone per deleted key until (a) the GC watermark has
    // passed it AND (b) no later write revived the key — GC'ing a
    // tombstone too early resurrects deleted rows on replay, the classic
    // compaction bug. Per key: last delete position, revival check, and
    // the verdict against a data-derived watermark (¾ of the log head, so
    // the query is scale-free). ONE map-side-combined hash aggregate with
    // conditional max (no window, no self-join: "revived" is just
    // max(event_id) > max(delete event_id), both ridden on the same
    // pass); the watermark is a broadcast 1-row aggregate. All integer
    // arithmetic — nothing for the engines to disagree on. At 100 TB the
    // aggregate shuffles one row per deleted key and nothing else.
    "cdc_tombstone_gc" -> { (s, dir) =>
      val wm = Tables.events(s, dir)
        .agg(expr("(max(event_id) * 3) div 4").as("wm"))
      Tables.events(s, dir)
        .groupBy(col("user_id").as("pk"))
        .agg(
          max(when(col("event_type") === "error", col("event_id")))
            .as("last_delete"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_deletes"),
          max(col("event_id")).as("last_any"))
        .filter(col("last_delete").isNotNull)
        .crossJoin(broadcast(wm))
        .select(
          col("pk"), col("last_delete"), col("n_deletes"),
          (col("last_any") > col("last_delete")).as("revived"),
          when(col("last_any") > col("last_delete"), lit("keep_revived"))
            .when(col("last_delete") <= col("wm"), lit("purge"))
            .otherwise(lit("retain")).as("gc_action"),
          col("wm"))
        .orderBy("pk")
    })

  val oracles: Map[String, String] = Map(
    "cdc_ordering_audit" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS t FROM events
        |), h AS (
        |  SELECT event_type, t,
        |         max(t) OVER (PARTITION BY event_type ORDER BY event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING
        |                               AND 1 PRECEDING) AS hwm
        |  FROM e
        |)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN hwm IS NOT NULL AND t < hwm
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |       coalesce(max(CASE WHEN hwm IS NOT NULL AND t < hwm
        |                    THEN hwm - t END), 0) AS max_lateness_us
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdc_route_filter" ->
      """SELECT CASE WHEN event_type IN ('click','view') THEN 'grp_engage'
        |            WHEN event_type IN ('purchase','signup') THEN 'grp_convert' END AS grp,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events
        |WHERE event_type IN ('click','view','purchase','signup')
        |GROUP BY 1 ORDER BY grp""".stripMargin,

    "cdc_action_filter" ->
      """SELECT event_id, event_type, round(value, 2) AS value_r
        |FROM events WHERE event_type IN ('click','purchase')
        |ORDER BY event_id""".stripMargin,

    "cdc_envelope" ->
      """SELECT event_id,
        |       to_json(struct_pack(
        |         before := CAST(NULL AS VARCHAR),
        |         after := struct_pack(
        |           event_id := CAST(event_id AS VARCHAR),
        |           event_type := event_type,
        |           props := props,
        |           user_id := CAST(user_id AS VARCHAR)),
        |         source := struct_pack("table" := 'events'))) AS envelope
        |FROM events ORDER BY event_id""".stripMargin,

    "cdc_type_norm_bool" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, (l_linenumber = 1) AS b
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "cdc_type_norm_date" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       strftime(date_trunc('day', l_shipdate), '%Y-%m-%dT%H:%M:%SZ') AS ship_rfc3339
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "cdc_type_norm_num" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |       CAST(l_linenumber AS BIGINT) AS ln_i64,
         |       CAST(l_quantity AS DOUBLE) AS qty_f64,
         |       ${RelationalQueries.moneySql("l_extendedprice * (1 - l_discount)")} AS net_r
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "cdc_type_norm_text" ->
      """SELECT c_custkey, c_name,
        |       decode(from_base64(base64(encode(c_name)))) AS dec,
        |       c_name AS raw
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "cdc_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "cdc_update_pairing" ->
      """SELECT event_id, user_id, round(value, 2) AS after_v,
        |       round(lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2) AS before_v
        |FROM events ORDER BY event_id""".stripMargin,

    "cdc_dedup_replay" ->
      """SELECT event_id, min(event_type) AS event_type,
        |       CAST(count(*) AS BIGINT) AS copies
        |FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
        |GROUP BY event_id ORDER BY event_id""".stripMargin,

    // Last-writer-wins per key (event_id is unique, so arg_max is
    // deterministic), then snapshot ⟗ compacted-log on pk.
    "cdc_schema_drift" ->
      """SELECT key,
        |       CAST(min(event_id) AS BIGINT) AS first_seen,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM (SELECT event_id, unnest(json_keys(props)) AS key FROM events)
        |GROUP BY 1 ORDER BY key""".stripMargin,

    "cdc_apply_changes" ->
      """WITH lastw AS (
        |  SELECT user_id AS pk,
        |         arg_max(struct_pack(op := event_type, v := value), event_id) AS w,
        |         count(*) AS n_changes
        |  FROM events GROUP BY 1
        |), last AS (
        |  SELECT pk, w.op AS op, w.v AS v, n_changes FROM lastw
        |)
        |SELECT COALESCE(c.c_custkey, l.pk) AS pk,
        |       CASE WHEN l.pk IS NULL THEN 'kept'
        |            WHEN l.op = 'error' THEN 'deleted'
        |            WHEN c.c_custkey IS NULL THEN 'inserted'
        |            ELSE 'updated' END AS action,
        |       round(CASE WHEN l.op = 'error' THEN NULL
        |                  WHEN l.pk IS NULL THEN c.c_acctbal
        |                  ELSE l.v END, 2) AS val_r,
        |       CAST(COALESCE(l.n_changes, 0) AS BIGINT) AS n_changes
        |FROM customer c FULL OUTER JOIN last l ON c.c_custkey = l.pk
        |ORDER BY pk""".stripMargin,

    "cdc_snapshot_checksum" -> {
      val foldedSql = (1 to 32).map(i => s"ascii(substr(h, $i, 1)) * $i").mkString(" + ")
      s"""WITH r AS (
         |  SELECT CAST(c_custkey // 100 AS BIGINT) AS bucket, c_custkey,
         |         md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_name,
         |               CAST(c_nationkey AS VARCHAR),
         |               CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR),
         |               c_mktsegment)) AS h
         |  FROM customer
         |)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
         |       min(c_custkey) AS key_min, max(c_custkey) AS key_max,
         |       CAST(sum($foldedSql) AS BIGINT) AS chk
         |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "cdc_scd2" ->
      """SELECT pk, version, valid_from, valid_to, op,
        |       round(CASE WHEN op = 'error' THEN NULL ELSE value END, 2) AS val_r,
        |       (valid_to IS NULL AND op <> 'error') AS is_current
        |FROM (
        |  SELECT user_id AS pk, event_id AS valid_from, event_type AS op, value,
        |         CAST(row_number() OVER w AS BIGINT) AS version,
        |         lead(event_id, 1) OVER w AS valid_to
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |)
        |ORDER BY pk, version""".stripMargin,

    "cdc_freshness" ->
      """WITH routed AS (
        |  SELECT CASE WHEN event_type IN ('click','view') THEN 'grp_engage'
        |              WHEN event_type IN ('purchase','signup') THEN 'grp_convert' END AS grp,
        |         epoch_us(ts) AS t
        |  FROM events
        |  WHERE event_type IN ('click','view','purchase','signup')
        |), head AS (SELECT max(t) AS t_head FROM routed)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n, max(t) AS t_last,
        |       CAST((SELECT t_head FROM head) - max(t) AS BIGINT) AS lag_us
        |FROM routed GROUP BY grp ORDER BY grp""".stripMargin,

    "cdc_time_travel" ->
      """WITH cut AS (
        |  SELECT CAST(floor(max(event_id) / 2) AS BIGINT) AS as_of FROM events
        |), lastw AS (
        |  SELECT user_id AS pk,
        |         arg_max(struct_pack(op := event_type, v := value), event_id) AS w,
        |         CAST(count(*) AS BIGINT) AS n_changes,
        |         max(event_id) AS last_event,
        |         min(c.as_of) AS as_of
        |  FROM events CROSS JOIN cut c
        |  WHERE event_id <= c.as_of
        |  GROUP BY 1
        |)
        |SELECT pk, w.op AS op, round(w.v, 2) AS val_r,
        |       n_changes, last_event, as_of
        |FROM lastw ORDER BY pk""".stripMargin,

    "cdc_ivm_agg" ->
      """SELECT user_id AS pk,
        |       CAST(sum(CASE WHEN event_id % 10 < 7 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_base,
        |       CAST(sum(CASE WHEN event_id % 10 >= 7 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_delta,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) AS BIGINT)
        |         AS net_n,
        |       sum(CASE WHEN event_type = 'error'
        |                THEN -CAST(floor(value * 100 + 0.5) AS BIGINT)
        |                ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END) / 100.0
        |         AS net_v_r
        |FROM events GROUP BY user_id ORDER BY pk""".stripMargin,

    "cdc_ivm_join" ->
      """SELECT c_nationkey AS nation,
        |       CAST(sum(CASE WHEN o_orderkey % 5 <> 0 AND c_custkey % 7 <> 0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        |       CAST(sum(CASE WHEN o_orderkey % 5 = 0 OR c_custkey % 7 = 0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
        |         AS sum_price_r
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // The oracle replays the identical total order (ts, site, event_id):
    // convergence means any engine computing max over that order agrees.
    "cdc_lww_register" ->
      """WITH w AS (
        |  SELECT user_id AS pk, event_id, ts, value,
        |         event_id % 3 AS site
        |  FROM events)
        |SELECT pk,
        |       max(struct_pack(ts := ts, site := site,
        |                       event_id := event_id, value := value))
        |         .event_id AS winner_event,
        |       CAST(max(struct_pack(ts := ts, site := site,
        |                            event_id := event_id, value := value))
        |            .site AS BIGINT) AS winner_site,
        |       round(max(struct_pack(ts := ts, site := site,
        |                             event_id := event_id, value := value))
        |             .value, 2) AS value_r,
        |       CAST(count(*) AS BIGINT) AS n_writes,
        |       CAST(bit_count(bit_or(1 << CAST(site AS INT)))
        |            AS BIGINT) AS n_sites
        |FROM w GROUP BY pk ORDER BY pk""".stripMargin,

    "cdc_tombstone_gc" ->
      """WITH wm AS (SELECT (max(event_id) * 3) // 4 AS wm FROM events),
        |agg AS (
        |  SELECT user_id AS pk,
        |         max(CASE WHEN event_type = 'error' THEN event_id END)
        |           AS last_delete,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_deletes,
        |         max(event_id) AS last_any
        |  FROM events GROUP BY user_id)
        |SELECT pk, last_delete, n_deletes,
        |       last_any > last_delete AS revived,
        |       CASE WHEN last_any > last_delete THEN 'keep_revived'
        |            WHEN last_delete <= wm THEN 'purge'
        |            ELSE 'retain' END AS gc_action,
        |       wm
        |FROM agg, wm
        |WHERE last_delete IS NOT NULL
        |ORDER BY pk""".stripMargin,

    "cdc_checksum_diff" -> {
      val foldedSql = (1 to 32).map(i => s"ascii(substr(h, $i, 1)) * $i").mkString(" + ")
      s"""WITH mrows AS (
         |  SELECT CAST(c_custkey // 100 AS BIGINT) AS bucket,
         |         md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_name,
         |               CAST(c_nationkey AS VARCHAR),
         |               CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR),
         |               c_mktsegment)) AS h
         |  FROM customer),
         |m AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_master,
         |             CAST(sum($foldedSql) AS BIGINT) AS chk_master
         |      FROM mrows GROUP BY bucket),
         |rrows AS (
         |  SELECT CAST(c_custkey // 100 AS BIGINT) AS bucket,
         |         md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_name,
         |               CAST(c_nationkey AS VARCHAR),
         |               CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
         |                    + CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END
         |                    AS VARCHAR),
         |               c_mktsegment)) AS h
         |  FROM customer WHERE c_custkey % 131 <> 0),
         |r AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_replica,
         |             CAST(sum($foldedSql) AS BIGINT) AS chk_replica
         |      FROM rrows GROUP BY bucket)
         |SELECT bucket, n_master, n_replica, chk_master, chk_replica,
         |       CASE WHEN n_master IS NULL THEN 'replica_only'
         |            WHEN n_replica IS NULL THEN 'master_only'
         |            WHEN n_master <> n_replica THEN 'count_mismatch'
         |            WHEN chk_master <> chk_replica THEN 'checksum_mismatch'
         |            ELSE 'ok' END AS status
         |FROM m FULL OUTER JOIN r USING (bucket)
         |ORDER BY bucket""".stripMargin
    })
}
