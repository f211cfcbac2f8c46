package graft.ops

import graft.SparkEntry

/** Machine-checked verification-law ledger for the no-oracle queries (r15,
  * the r14 verdict's ask #6). Eleven queries are sketches/ANN/PCA whose
  * outputs the DuckDB gate cannot hash-compare; each is verified by a
  * property/recall law instead, but those laws lived scattered across
  * suites with nothing enforcing that EVERY no-oracle query has one. This
  * spec is the enforcement, same pattern as OverflowSpec's whitelist and
  * the streaming equivalence ledger:
  *
  *   - the no-oracle set (queries minus oracleSql keys) must EQUAL the
  *     declared ledger — a 12th no-oracle query cannot ship without a row
  *     here naming its law;
  *   - every declared law must point at a real test: the named suite is
  *     instantiated and must carry the named test (ScalaTest registers
  *     test names at construction, so this cannot drift silently);
  *   - every ANN entry must carry a recall floor in `RecallReport.floors`
  *     (the bench artifact and the spec gate share one computation).
  */
class NoOracleLawsSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** query -> (suite class, exact test name, one-line law statement). */
  private val laws: Map[String, (String, String, String)] = Map(
    "agg_approx_distinct" -> (("graft.ops.ApproxSpec",
      "approx_count_distinct within its published error bound",
      "HLL estimate within 4 sigma of exact countDistinct at rsd 0.05")),
    "agg_approx_percentile" -> (("graft.ops.ApproxSpec",
      "approx_percentile within 5% of the exact percentile",
      "sketch percentile within 5% relative error of the exact selection")),
    "agg_hll_union" -> (("graft.ops.ApproxSpec",
      "agg_hll_union: sharded-union estimate is merge-exact and inside the lgK=14 envelope",
      "sketch merge associativity (union == whole-table sketch) + error envelope")),
    "dedup_minhash_onepass" -> (("graft.ops.ApproxSpec",
      "one-pass MinHash banding: sound (subset of exhaustive) with real recall",
      "banding soundness vs the exhaustive pair set, with measured recall")),
    "dedup_simhash" -> (("graft.ops.ApproxSpec",
      "dedup_simhash reproduces the brute-force banded-Hamming pair set exactly",
      "exhaustive fixture reproduction: banded candidates + Hamming<=12 verify")),
    "emb_pca" -> (("graft.ops.ApproxSpec",
      "one-pass PCA matches a two-pass driver brute force",
      "distributed covariance/eigen pass equals the driver brute force")),
    "sim_ann_ivf" -> annLaw,
    "sim_ann_ivfpq" -> annLaw,
    "sim_ann_knn" -> annLaw,
    "sim_ann_lsh" -> annLaw,
    "sim_ann_pq" -> annLaw)

  private def annLaw: (String, String, String) = (
    "graft.ops.ApproxSpec",
    "every ANN variant clears its recall floor (RecallReport — the bench artifact path)",
    "recall@3 >= the declared floor vs the exact cosine ground truth")

  test("the no-oracle query set equals the declared law ledger") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undeclared = noOracle -- laws.keySet
    val stale = laws.keySet -- noOracle
    assert(undeclared.isEmpty,
      s"no-oracle queries shipped without a verification law: $undeclared")
    assert(stale.isEmpty,
      s"law ledger rows for queries that are gone or oracle-checked now: $stale")
  }

  test("every declared law names a test that actually exists in its suite") {
    laws.values.toSeq.distinct.groupBy(_._1).foreach { case (cls, rows) =>
      val suite = Class.forName(cls).getDeclaredConstructor()
        .newInstance().asInstanceOf[org.scalatest.Suite]
      val names = suite.testNames
      rows.foreach { case (_, testName, law) =>
        assert(names.contains(testName),
          s"law '$law' points at missing test '$testName' in $cls")
      }
    }
  }

  test("every ANN no-oracle query carries a recall floor") {
    val ann = laws.keySet.filter(_.startsWith("sim_ann_"))
    assert(RecallReport.floors.keySet == ann,
      s"floors=${RecallReport.floors.keySet} ann=$ann")
  }
}
