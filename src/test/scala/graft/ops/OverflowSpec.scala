package graft.ops

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Table-driven audit of every scaled-multiply site on the Long path —
  * the r12 verdict's ask #6, generalizing the `agg_moments` catch (a
  * `cents²`-family product that silently wrapped in Spark at sf0.1 while
  * DuckDB raised): any `× 10³⁺` that feeds a `div`-scaled integer column
  * must either ride DECIMAL(38,0)/HUGEINT/BigInt (wide arithmetic, caught
  * by the scan's same-line filter) or carry a STATED row-count/value
  * bound below which Long cannot wrap.
  *
  * The scan greps `src/main/scala` for `* 1000`-and-up multiplies not on
  * a wide-arithmetic line; every hit must match a table row, every table
  * row must still match a line (no stale entries), and every `bounded`
  * row's justification must state a numeric bound. A new scaled multiply
  * cannot land without declaring its overflow story here.
  *
  * r14 (the r13 verdict's ask #2): the literal scan has a structural
  * blind spot — a COLUMN×COLUMN Long product carries no `* 10³⁺` literal
  * to grep for, and exactly that class wrapped in `agg_raking`'s round-2
  * IPF (`w1 * tc`, both BIGINT columns; the sf0.1 sweep caught it, not
  * this spec). The second audit below therefore walks every declared
  * query's ANALYZED LOGICAL PLAN and flags each `Multiply` whose result
  * type is LongType with BOTH operands non-foldable (column-derived) —
  * the DECIMAL(38,0) lift changes the node's type and de-flags it, so
  * deleting one CAST in agg_raking fails THIS spec, not the sweep.
  */
class OverflowSpec extends graft.SparkSuite {

  /** classification:
    *  - "bounded"  Long math, safe below the STATED bound (must be numeric)
    *  - "double"   the product is double-path (precision, not wrap; operand
    *               magnitude keeps the product far below 2⁵³)
    *  - "bigint"   BigInt arithmetic
    *  - "nondata"  not row-data math (timestamps, config keys, display)
    */
  private case class Site(file: String, pattern: String, clazz: String, why: String)

  private val sites = Seq(
    Site("AnnSweep.scala", "math.rint(v * 1000) / 1000", "nondata",
      "display rounding of a recall fraction in a log line"),
    Site("ProductQuant.scala", "* 10000.0) / 10000.0", "double",
      "centroid component quantization; |x| ~ 1e0 doubles"),
    Site("CurationRules.scala", "($nStopCol * 10000) div $nToksCol", "bounded",
      "n_stop <= tokens per document; wraps past 9.2e14 tokens in ONE doc"),
    Site("DedupQueries.scala", "round(col(\"cos\") * 1000, 0)", "double",
      "cosine in [-1,1], double path, rounded to milli"),
    Site("DedupQueries.scala", "CAST(round(cos * 1000, 0) AS BIGINT)", "double",
      "oracle face of the cosine milli rounding"),
    Site("DedupQueries.scala", "round(col(\"jaccard\") * 1000, 0)", "double",
      "rate-curve milli threshold: jaccard in [0,1], double path"),
    Site("DedupQueries.scala", "* 1000, 0) AS BIGINT) AS milli", "double",
      "oracle face of the rate-curve milli threshold; ratio in [0,1]"),
    Site("GraphQueries.scala", "(n_common * 1000000L) div", "bounded",
      "n_common <= max degree; wraps past 9.2e12 common neighbors per pair"),
    Site("GraphQueries.scala", "(n_local_bridges * 1000000L) div n_edges", "bounded",
      "local-bridge ppm: n_local_bridges <= |E|; wraps past 9.2e12 edges"),
    Site("GraphQueries.scala", "WHERE a.u = x.u AND b.u = x.v)) * 1000000)", "bounded",
      "oracle face of the local-bridge ppm on HUGEINT; raises (never wraps) past 9.2e12"),
    Site("GraphQueries.scala", "(n_common * 1000000) //", "bounded",
      "oracle face; DuckDB additionally raises (never wraps) past 9.2e12"),
    Site("TextQueries.scala", "(sum_d * 1000000) div", "bounded",
      "MSTTR ppm: sum of per-segment distinct counts <= corpus tokens per lang; wraps past 9.2e12 tokens"),
    Site("TextQueries.scala", "(sum(d) * 1000000) // (25", "bounded",
      "oracle face of the MSTTR ppm; DuckDB raises (never wraps) past 9.2e12"),
    Site("TextQueries.scala", "(n_hapax * 1000000) div n_types", "bounded",
      "n_hapax <= distinct terms in ONE document; wraps past 9.2e12 types per doc"),
    Site("TextQueries.scala", "n_hapax * 1000000 // n_types", "bounded",
      "oracle face of the hapax ppm; raises (never wraps) past 9.2e12"),
    Site("MiningQueries.scala", "(support * 1000000L) div", "bounded",
      "support <= n_orders; wraps past 9.2e12 orders"),
    Site("MiningQueries.scala", "(support * 1000000) //", "bounded",
      "oracle face of the confidence ppm; raises (never wraps) past 9.2e12"),
    Site("MiningQueries.scala", "(n * 1000000L) div total", "bounded",
      "benford: n <= corpus rows; wraps past 9.2e12 rows per (group,digit)"),
    Site("MiningQueries.scala", "(n * 1000000) // total", "bounded",
      "oracle face of the benford ppm; raises past 9.2e12"),
    Site("MiningQueries.scala", "nv := -v)).d * 1000000", "bounded",
      "changepoint: d is a daily-ledger count; wraps past 9.2e12 rows/day"),
    Site("RelationalQueries.scala", "300L * 1000000L", "nondata",
      "compile-time constant: 5-minute as-of band in microseconds"),
    Site("RelationalQueries.scala", "abs(approx_parts - exact_parts) * 1000000", "bounded",
      "count difference <= distinct parts; wraps past 9.2e12 distinct keys"),
    Site("RetrievalQueries.scala", "floor(c * 10000.0 + 0.5) / 10000.0", "double",
      "score rounding helper; |c| ~ 1e0 doubles"),
    Site("RetrievalQueries.scala", "w_ns * 10000 div denom_ns", "bounded",
      "w_ns = round(sqrt(n_docs)*1e9); wraps past ~8.5e11 docs per source"),
    Site("RetrievalQueries.scala", "w_ns * 10000 // denom_ns", "bounded",
      "oracle face of the temperature-mix draws; raises past ~8.5e11 docs"),
    Site("RetrievalQueries.scala", "* 1000000.0", "double",
      "BM25/NDCG scores scaled on the DOUBLE path then cast; |score| ~ 1e2"),
    Site("RetrievalQueries.scala", "* 10000.0 + 0.5) / 10000.0", "double",
      "oracle face of the score rounding; double path"),
    Site("TextQueries.scala", "(degree * 1000) div freq", "bounded",
      "RAKE degree <= corpus tokens; wraps past 9.2e15 tokens for one word"),
    Site("TextQueries.scala", "(degree * 1000) // freq", "bounded",
      "oracle face of the RAKE score; raises past 9.2e15"),
    Site("TextQueries.scala", "(sum_gap * 1000) div n_gaps", "bounded",
      "sum_gap <= sum of in-doc positions per (source,term); wraps past 9.2e15 position-sum"),
    Site("TextQueries.scala", "(sum_gap * 1000) // n_gaps", "bounded",
      "oracle face of the mean gap milli; raises past 9.2e15"),
    Site("TextQueries.scala", "(n_gaps * sumsq_gap - sum_gap * sum_gap) * 1000", "bounded",
      "fano product; the query doc states the ~1e13 gap-pairs-per-stratum bound and the DECIMAL(38,0) escape"),
    Site("TextQueries.scala", "(sum_toks * 100000) div sum_chars", "bounded",
      "fertility: wraps past 9.2e13 tokens per (lang,source) stratum"),
    Site("TextQueries.scala", "len(string_split(text, ' '))) * 100000", "bounded",
      "oracle face of fertility; raises past 9.2e13 tokens per stratum"),
    Site("TextQueries.scala", "(sum(kept) * 10000) div count(*)", "bounded",
      "gopher keep-rate: kept <= docs; wraps past 9.2e14 docs"),
    Site("TextQueries.scala", "(n_stop * 10000) //", "bounded",
      "oracle face of the stopword bp; n_stop <= doc tokens, raises past 9.2e14"),
    Site("TextQueries.scala", "THEN 1 ELSE 0 END) * 10000", "bounded",
      "oracle accept-rate bp: accepted <= docs; raises past 9.2e14 docs"),
    Site("TimeWindowQueries.scala", "(n * 1000000) div tot", "bounded",
      "markov: n <= transitions per (src,dst); wraps past 9.2e12 rows"),
    Site("TimeWindowQueries.scala", "(n_turning * 1000000) div n_interior", "bounded",
      "turning-point ppm: n_turning <= interior triples per arm; wraps past 9.2e12 rows"),
    Site("TimeWindowQueries.scala", "(sum(turn) * 1000000) // count(*)", "bounded",
      "oracle face of the turning-point ppm; DuckDB raises (never wraps) past 9.2e12"),
    Site("TimeWindowQueries.scala", "(min(a.dec_cents) * 1000000) div min(a.tot)", "bounded",
      "pareto share ppm on the DECIMAL(38,0) path: decile cents * 1e6 <= ~1e19 <<< the 1e38 decimal ceiling"),
    Site("TimeWindowQueries.scala", "(sum(bc) * 1000000) div min(a.tot)", "bounded",
      "pareto cumulative share ppm, same DECIMAL(38,0) path; <= ~1e19 <<< 1e38"),
    Site("TimeWindowQueries.scala", "(n * 1000000) // (sum(n) OVER", "bounded",
      "oracle face of the markov ppm; raises past 9.2e12"),
    Site("VectorQueries.scala", "* 10000 + 0.5", "double",
      "embedding component quantization; |x| ~ 1e0 floats on the double path"),
    Site("VectorQueries.scala", "* 1000 + intConf", "nondata",
      "codebook cache key packing two small session confs"),
    Site("Demo.scala", "1700000000000L + s * 1000", "nondata",
      "demo timestamp construction"),
    Site("DriftMonitor.scala", "best * 1000000 / (bn1 * bn2)", "bigint",
      "KS ppm on BigInt cross products (the streaming face of agg_ks_drift)"),
    Site("DurableQueue.scala", "15 * 60 * 1000", "nondata",
      "15-minute stale-lease cutoff in milliseconds"),
    Site("Funnel.scala", "ts.getTime * 1000L", "bounded",
      "epoch micros from epoch millis; wraps in year 294471 (9.2e18 us)"),
    Site("PatternMatch.scala", "ts.getTime * 1000L", "bounded",
      "epoch micros from epoch millis; wraps in year 294471 (9.2e18 us)"),
    Site("RedisQueue.scala", "timeoutSec * 1000 + 10000", "nondata",
      "socket timeout in milliseconds"),
    Site("RedisQueue.scala", "idleTimeoutSec * 1000 + 10000", "nondata",
      "socket timeout in milliseconds"))

  private val hazard = """\*\s*1(0{3,})(L\b|\.0)?""".r
  // Wide arithmetic on the same line is the sanctioned escape (the
  // agg_moments rule): DECIMAL(38,0) on the Spark side, HUGEINT in the
  // oracle SQL, BigInt in driver/stream kernels.
  private val wide = """DECIMAL\(38|HUGEINT|BigInt""".r

  private def hazardLines: Seq[(String, Int, String)] = {
    val root = Paths.get("src/main/scala")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq.sortBy(_.toString)
      .flatMap { p: Path =>
        Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i)
              if hazard.findFirstIn(line).isDefined &&
                wide.findFirstIn(line).isEmpty &&
                !line.trim.startsWith("//") && !line.trim.startsWith("*") =>
            (p.getFileName.toString, i + 1, line)
        }
      }
  }

  test("every scaled multiply on the Long path is classified in the table") {
    val uncovered = hazardLines.filterNot { case (f, _, line) =>
      sites.exists(s => s.file == f && line.contains(s.pattern))
    }
    assert(uncovered.isEmpty,
      "unlisted scaled-multiply sites (classify in OverflowSpec.sites — " +
        "bounded with a stated bound, or route through DECIMAL(38,0)):\n" +
        uncovered.map { case (f, i, l) => s"  $f:$i: ${l.trim}" }.mkString("\n"))
  }

  test("every table row still matches a source line (no stale entries)") {
    val lines = hazardLines
    val stale = sites.filterNot(s =>
      lines.exists { case (f, _, line) => f == s.file && line.contains(s.pattern) })
    assert(stale.isEmpty,
      s"stale OverflowSpec rows:\n${stale.map(s => s"  ${s.file}: ${s.pattern}").mkString("\n")}")
  }

  test("every bounded row states a numeric bound") {
    val unbounded = sites.filter(_.clazz == "bounded")
      .filterNot(_.why.matches(""".*\d+(\.\d+)?e\d+.*|.*2⁶³.*|.*\d{4,}.*"""))
    assert(unbounded.isEmpty,
      s"bounded rows without a stated numeric bound:\n${unbounded.map(_.pattern).mkString("\n")}")
  }

  test("classifications are from the closed vocabulary") {
    val bad = sites.filterNot(s => Set("bounded", "double", "bigint", "nondata")(s.clazz))
    assert(bad.isEmpty, bad.map(_.pattern).mkString(","))
  }

  // ---------------------------------------------------------------------
  // Plan-level column×column audit (r14). Whitelist rows name the QUERY
  // and a substring of the flagged product's SQL form; like the literal
  // table, every flagged product must match a row AND every row must
  // still flag (no stale entries), and bounded rows state their bound.
  // ---------------------------------------------------------------------

  private case class PlanSite(query: String, pattern: String, why: String)

  private val planSites = Seq(
    PlanSite("agg_bootstrap_ci", "(element_at(ws, ",
      "Poisson replicate weight ws[i] ≤ ~20 × value cents c ≤ 49002; product ≤ ~1e6 per row, summed wide (oracle lifts to HUGEINT) — 32 array-slot sites, one per replicate (the r16 single-pass rewrite)"),
    PlanSite("text_vocab_chao1", "(f1 * (f1 - CAST(1 AS BIGINT)))",
      "Chao1 numerator: singleton-term count f1 ≤ vocabulary (Heaps-bounded); f1·(f1−1) wraps only past 3.03e9 singleton terms in ONE language"),
    PlanSite("agg_wilcoxon_signed_rank", "(n_pairs * (n_pairs + CAST(1 AS BIGINT)))",
      "expectation/variance terms over the calendar-bounded pair ledger: n_pairs ≤ days ≤ ~3000, so 2n(n+1)(2n+1) ~ 1.1e11"),
    PlanSite("agg_wilcoxon_signed_rank", "((CAST(2 AS BIGINT) * n_pairs) * (n_pairs + CAST(1 AS BIGINT)))",
      "the exact integer variance gate 2n(n+1)(2n+1) − tt; n_pairs ≤ days ≤ ~3000, product ~ 1.1e11"),
    PlanSite("agg_wilcoxon_signed_rank", "(tp * r2)",
      "rank-sum contribution: tp ≤ ties ≤ n_pairs ≤ ~3000 and 2r̄ = r2 ≤ 2n+1; product ≤ ~1.8e7"),
    PlanSite("agg_wilcoxon_signed_rank", "(t * t)",
      "tie-correction t³ term; tie count t ≤ n_pairs ≤ ~3000, t³ ~ 2.7e10"),
    PlanSite("agg_mann_kendall", "(n_days * (n_days - CAST(1 AS BIGINT)))",
      "variance term over the calendar-bounded daily ledger: n_days ≤ ~3000, so n³ ~ 2.7e10"),
    PlanSite("agg_mann_kendall", "(t * (t - CAST(1 AS BIGINT)))",
      "tie-correction term; tie count t ≤ n_days ≤ ~3000"),
    PlanSite("agg_ttest_welch", "(c * c)",
      "per-row cents square before the DECIMAL(38,0) sum; c ≤ 49002 in the fixture, wraps only past |value| ≥ $3.0e7 per row"),
    PlanSite("agg_cohens_d", "(c * c)",
      "the identical per-row cents square (shares the t-test's sufficient-statistics pass); same ≤ 49002 fixture bound, wraps only past |value| ≥ $3.0e7 per row"),
    PlanSite("profile_columns", "(d0 * element_at(array(1L, 10L,",
      "lex-order padding d·10^(18−len(d)): d has exactly len(d) digits so the product < 1e18 < Long.MAX (9.2e18) by construction (the power array tops out at 1e17)"),
    PlanSite("profile_columns", "(d1 * element_at(array(1L, 10L,",
      "same padding identity on the quantity-cents lane; product < 1e18 by construction"),
    PlanSite("profile_columns", "(d2 * element_at(array(1L, 10L,",
      "same padding identity on the price-cents lane; product < 1e18 by construction"),
    PlanSite("dedup_cluster_stats", "(sz * n_clusters)",
      "docs in one size class: sz·n_clusters ≤ corpus docs; wraps past 9.2e18 docs"),
    PlanSite("emb_kmeans", "(namedlambdavariable() - namedlambdavariable())",
      "per-component quantized-embedding distance: |q| ≤ 2e4 (1e4 quantizer of unit floats), diff² ≤ 1.6e9"),
    PlanSite("pipeline_cluster_sample", "(namedlambdavariable() - namedlambdavariable())",
      "same quantized k-means distance kernel as emb_kmeans; diff² ≤ 1.6e9"),
    PlanSite("events_rfm", "(pmod(nu, 5L) *",
      "RFM bucket compose: pmod ≤ 4 × (rank div 5 + 1) ≤ n_users + 1; wraps past 2.3e18 users"),
    PlanSite("graph_clustering_coeff", "(d * (d - CAST(1 AS BIGINT)))",
      "wedge count d·(d−1) per node; wraps past degree 3.03e9 on ONE node (degree ≤ |V|)"),
    PlanSite("graph_triangles", "(d * (d - CAST(1 AS BIGINT)))",
      "same per-node wedge-count bound; wraps past degree 3.03e9"),
    PlanSite("pipeline_length_outliers", "* v1)",
      "rank interpolation: weight (4 − r) ≤ 4 × char length; wraps past 2.3e18 chars in one doc"),
    PlanSite("pipeline_length_outliers", "(r * v2)",
      "rank interpolation: r ≤ 4 × char length; wraps past 2.3e18 chars"),
    PlanSite("pipeline_length_outliers", "(pq * (n - CAST(1 AS BIGINT)))",
      "percentile index: pq ≤ 4 (quartile id) × n docs; wraps past 2.3e18 docs per stratum"),
    PlanSite("text_burstiness", "(gap * gap)",
      "per-row token-gap square; gap ≤ doc tokens ≤ ~1e5, square ≤ 1e10"),
    PlanSite("text_burstiness", "(n_gaps * sumsq_gap)",
      "fano numerator; the query doc states the ~1e13 gap-pairs-per-stratum bound and the DECIMAL(38,0) escape beyond it"),
    PlanSite("text_burstiness", "(sum_gap * sum_gap)",
      "fano numerator's squared term; same stated ~1e13 bound"),
    PlanSite("text_burstiness", "(n_gaps * sum_gap)",
      "fano mean term; same stated ~1e13 bound as its siblings"),
    PlanSite("text_gopher_rules", "size(split(text, ' ', -1)) AS BIGINT) >= CAST(50",
      "conjunction of 0/1 rule indicators (each factor is a boolean cast); every operand ∈ {0, 1}, product bounded by 1e0"))

  /** Every `Multiply` in the query's analyzed plan (subqueries included)
    * whose RESULT stays LongType with both operands column-derived — the
    * exact class the literal grep cannot see. A DECIMAL(38,0) lift on
    * either operand widens the node's type and removes it from this set.
    */
  private def longColumnProducts(name: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Multiply, SubqueryExpression}
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.types.LongType
    val out = scala.collection.mutable.ListBuffer[String]()
    def fromExpr(e: Expression): Unit = e.foreach {
      case m: Multiply
          if m.dataType == LongType && !m.left.foldable && !m.right.foldable =>
        out += m.sql
      case sq: SubqueryExpression => fromPlan(sq.plan)
      case _ => ()
    }
    def fromPlan(p: LogicalPlan): Unit =
      p.foreach(node => node.expressions.foreach(fromExpr))
    fromPlan(graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.analyzed)
    out.toList.distinct
  }

  /** Query construction at sf0.001 (some entries build session artifacts
    * eagerly); a declared-gate refusal can't happen at this SF, so any
    * throw is a real failure of the audit's coverage.
    */
  private lazy val allLongProducts: Seq[(String, String)] =
    graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      longColumnProducts(name).map(name -> _)
    }

  test("no unlisted LongType column x column product in any declared query plan") {
    val uncovered = allLongProducts.filterNot { case (q, sql) =>
      planSites.exists(s => s.query == q && sql.contains(s.pattern))
    }
    assert(uncovered.isEmpty,
      "LongType column x column products (wrap-prone; lift to DECIMAL(38,0) " +
        "or whitelist in OverflowSpec.planSites with a stated bound):\n" +
        uncovered.map { case (q, sql) => s"  $q: $sql" }.mkString("\n"))
  }

  test("every plan-audit whitelist row still flags (no stale entries)") {
    val stale = planSites.filterNot(s =>
      allLongProducts.exists { case (q, sql) => q == s.query && sql.contains(s.pattern) })
    assert(stale.isEmpty,
      s"stale planSites rows:\n${stale.map(s => s"  ${s.query}: ${s.pattern}").mkString("\n")}")
  }

  test("every plan-audit whitelist row states a numeric bound") {
    val unbounded = planSites
      .filterNot(_.why.matches(""".*\d+(\.\d+)?e\d+.*|.*2⁶³.*|.*\d{4,}.*"""))
    assert(unbounded.isEmpty,
      s"planSites rows without a stated numeric bound:\n${unbounded.map(_.pattern).mkString("\n")}")
  }

  test("agg_raking's IPF products are all DECIMAL-lifted in the plan") {
    // The positive face of the audit: the three round-2 products the r13
    // sweep caught must appear in the analyzed plan as Decimal multiplies
    // (w1·tc, w2·tr, w3·tc after their CAST lifts), and the Long-typed
    // product set of the same plan must be empty.
    import org.apache.spark.sql.catalyst.expressions.{Multiply, SubqueryExpression}
    import org.apache.spark.sql.types.DecimalType
    val analyzed = graft.SparkEntry.queries("agg_raking")(spark, sfDir)
      .queryExecution.analyzed
    val decimalProducts = scala.collection.mutable.ListBuffer[String]()
    analyzed.foreach(node => node.expressions.foreach(_.foreach {
      case m: Multiply if m.dataType.isInstanceOf[DecimalType] &&
          !m.left.foldable && !m.right.foldable =>
        decimalProducts += m.sql
      case _ => ()
    }))
    val lifted = decimalProducts.toList
    assert(Seq("w1", "w2", "w3").forall(w => lifted.exists(_.contains(w))),
      s"expected the CAST-lifted w1/w2/w3 products in agg_raking's plan; got: $lifted")
    assert(longColumnProducts("agg_raking").isEmpty,
      "agg_raking must carry NO LongType column x column product")
  }
}
