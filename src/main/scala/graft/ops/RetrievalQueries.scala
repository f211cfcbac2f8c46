package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval, linkage, and corpus-statistics queries (round 10).
  *
  * A curation engine that selects training data also has to FIND things in
  * it: score documents against a query (BM25 — the lexical-retrieval
  * baseline every hybrid search starts from), link near-identical keys
  * across vocabularies (edit-distance fuzzy join — record linkage's core
  * primitive), score documents with a cheap linear quality model (the
  * fastText-classifier shape used by CCNet/LLaMA-style pipelines), and set
  * per-source sampling temperatures (the multilingual α-sampling rule).
  * Each query is one declarative DataFrame plan with an exact DuckDB
  * oracle; every cross-engine float hazard is closed by fixed-point
  * integer summation (per-term rounding to micros/nanos BEFORE the sum, so
  * aggregation order — which Spark does not guarantee — cannot move the
  * result).
  *
  * Scale notes (100 TB):
  *   - BM25: the per-(doc,term) tf table is the only large intermediate;
  *     it shuffles once on term for df and once on doc_id for the final
  *     sum — both map-side-combined hash aggregates. The df and corpus
  *     stats are O(vocab)/O(1) broadcasts. This is exactly the inverted-
  *     index build an offline retrieval pass runs, minus the posting-list
  *     materialization.
  *   - Fuzzy join: candidate generation is an EQUI-join on length buckets
  *     (|len(a)-len(b)| ≤ 2 ⟹ adjacent `div 3` buckets, so a 3-bucket
  *     explode on one side covers every qualifying pair — lossless
  *     blocking, no nested loop). The expensive `levenshtein` runs only on
  *     candidates.
  *   - Classifier / temperature / entropy: narrow projections into tiny
  *     aggregates; nothing super-linear anywhere.
  */
object RetrievalQueries {

  private val toks = split(col("text"), " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 (Robertson/Spärck Jones; the Lucene `+1` idf variant so the
    // log argument stays > 1 and scores stay positive) for a fixed
    // 3-term query, top-20 documents. Per-(doc,term) scores are rounded
    // to integer MICROS before the per-doc sum — integer addition is
    // order-independent, so Spark's partial-aggregation order cannot
    // perturb the result the oracle hashes.
    "text_bm25_topk" -> { (s, dir) =>
      val (k1, b) = (1.2, 0.75)
      val docs = Tables.documents(s, dir)
      val dl = docs.select(col("doc_id"),
        size(toks).cast("double").as("dl"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val tf = docs.select(col("doc_id"), explode(toks).as("term"))
        .filter(col("term").isin("table", "spark", "merge"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).cast("double").as("tf"))
      val df_ = tf.groupBy("term")
        .agg(countDistinct(col("doc_id")).cast("double").as("df"))
      tf.join(broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("score_us",
          round(col("idf") * col("tf") * (k1 + 1.0) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))) *
            1000000.0).cast("long"))
        .groupBy("doc_id")
        .agg(sum(col("score_us")).as("bm25_us"),
          count(lit(1)).as("n_terms"))
        .orderBy(col("bm25_us").desc, col("doc_id"))
        .limit(20)
    },

    // Edit-distance fuzzy self-join over the corpus+catalog vocabulary
    // (document terms ∪ part-name tokens): all unordered pairs within
    // Levenshtein distance 2. Candidates come from a lossless length-
    // bucket equi-join — lev(a,b) ≤ 2 forces |len(a)−len(b)| ≤ 2, which
    // forces `len div 3` buckets to be equal or adjacent, so exploding
    // one side into its bucket±1 and equi-joining on the other side's
    // home bucket generates every qualifying pair exactly once (the
    // three exploded values are distinct). The oracle cross-joins naively
    // — the whole point of the check is that blocking loses nothing.
    // A user who writes the naive crossJoin+filter form gets this same
    // plan automatically: graft.functions.RewriteLevenshteinJoin performs
    // the identical rewrite as an optimizer rule (registered via
    // GraftExtensions); the query spells the blocking out so its shape is
    // self-contained and session-independent.
    "join_fuzzy_levenshtein" -> { (s, dir) =>
      val vocab = Tables.documents(s, dir)
        .select(explode(toks).as("w"))
        .union(Tables.part(s, dir)
          .select(explode(split(col("p_name"), " ")).as("w")))
        .distinct()
        .withColumn("l", length(col("w")))
      val probe = vocab.select(col("w"), col("l"),
        explode(array(expr("l div 3 - 1"), expr("l div 3"),
          expr("l div 3 + 1"))).as("bk"))
      val build = vocab.select(col("w").as("w2"), col("l").as("l2"),
        expr("l div 3").as("bk"))
      probe.join(build, "bk")
        .filter(col("w") < col("w2") &&
          abs(col("l") - col("l2")) <= 2 &&
          levenshtein(col("w"), col("w2")) <= 2)
        .select(col("w").as("wa"), col("w2").as("wb"),
          levenshtein(col("w"), col("w2")).as("dist"))
        .orderBy("wa", "wb")
    },

    // Linear quality classifier (the fastText/CCNet filter shape): four
    // cheap features — token count, type-token ratio, stopword ratio,
    // mean token length — through a fixed-weight logistic. One narrow
    // projection, no shuffle at all until the final orderBy; at 100 TB
    // this is the map-only scoring pass that precedes every filter.
    // Rounding is floor(x·10⁴ + 0.5)/10⁴ in BOTH engines: the features
    // are ratios of small integers, so z lands on exact decimal .xxxx5
    // boundaries systematically, and Spark's BigDecimal HALF_UP disagrees
    // with DuckDB's round() there — a shared floor-based convention is
    // deterministic because floor and the +,*,/ feeding it are exact IEEE.
    // DATA CARD (r13): the per-source release summary every curated
    // corpus ships with — documents, exact token total, mean tokens
    // (milli), language spread (count + dominant language with a
    // deterministic count-then-name tie-break), and the exact-duplicate
    // rate in basis points (docs whose md5(text) appears ≥ 2× within the
    // source). One row per source, assembled from three independent
    // per-source aggregates JOINED on the tiny source dimension — each
    // is one map-side-combined pass (the md5 leg keys on (source,
    // digest): fixed-width keys, no text shuffle), so the card costs
    // three linear scans and nothing quadratic at any corpus size. The
    // dominant language is min(struct(-cnt, lang)) — an aggregate, not a
    // window. Ratios ride DECIMAL(38,0).
    "pipeline_data_card" -> { (s, dir) =>
      val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
      val docs = Tables.documents(s, dir)
      val base = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks).cast(d38)).cast("long").as("n_tokens"))
      val langs = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_langs"),
          min(struct((-col("c")).as("nc"), col("lang"))).getField("lang")
            .as("top_lang"))
      val dups = docs.select(col("source"), md5(col("text")).as("h"))
        .groupBy("source", "h").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_docs"))
      base.join(langs, "source").join(dups, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000) div " +
            "CAST(n_docs AS DECIMAL(38,0)) AS BIGINT)").as("mean_tokens_milli"),
          col("n_langs"), col("top_lang"), col("n_dup_docs"),
          expr("CAST((CAST(n_dup_docs AS DECIMAL(38,0)) * 10000) div " +
            "CAST(n_docs AS DECIMAL(38,0)) AS BIGINT)").as("dup_bp"))
        .orderBy("source")
    },

    "pipeline_quality_classifier" -> { (s, dir) =>
      def r4(c: org.apache.spark.sql.Column) =
        floor(c * 10000.0 + 0.5) / 10000.0
      Tables.documents(s, dir)
        .withColumn("n_toks", size(toks).cast("double"))
        .withColumn("ttr",
          size(array_distinct(toks)).cast("double") / col("n_toks"))
        .withColumn("stop_ratio",
          CurationRules.stopCount(toks).cast("double") / col("n_toks"))
        .withColumn("mean_len",
          (length(col("text")) - (col("n_toks") - 1)) / col("n_toks"))
        .withColumn("z",
          lit(-2.0) + col("n_toks") * 0.01 + col("ttr") * 2.5 -
            col("stop_ratio") * 3.0 + col("mean_len") * 0.2)
        .select(col("doc_id"),
          r4(col("z")).as("z_r"),
          r4(lit(1.0) / (lit(1.0) + exp(-col("z")))).as("score_r"),
          (lit(1.0) / (lit(1.0) + exp(-col("z"))) >= 0.5).as("accept"))
        .orderBy("doc_id")
    },

    // Temperature-based mixture weights (the multilingual α-sampling
    // rule, α = 0.5): per-source draw shares ∝ count^α. The per-source
    // weight is rounded to integer NANOS before the denominator sum, so
    // the share is a ratio of exact integers in both engines; draws are
    // the integer part of share × 10 000.
    "pipeline_temperature_mix" -> { (s, dir) =>
      val w = Tables.documents(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w_ns",
          round(sqrt(col("n_docs").cast("double")) * 1e9).cast("long"))
      val denom = w.agg(sum(col("w_ns")).as("denom_ns"))
      w.crossJoin(broadcast(denom))
        .select(col("source"), col("n_docs"),
          round(col("w_ns").cast("double") / col("denom_ns"), 6)
            .as("share_r"),
          expr("w_ns * 10000 div denom_ns").as("draws_10k"))
        .orderBy("source")
    },

    // Per-source label-distribution dispersion: Shannon entropy and Gini
    // impurity of the language mix. Each p·ln(p) / p² term is rounded to
    // integer nanos before the sum (order-independent), so the iterative-
    // free aggregate is bit-exact cross-engine. Two stacked hash
    // aggregates, output O(sources).
    "agg_entropy_gini" -> { (s, dir) =>
      val byLang = Tables.documents(s, dir)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_sl"))
      val bySrc = byLang.groupBy("source").agg(sum(col("n_sl")).as("n_s"))
      byLang.join(bySrc, "source")
        .withColumn("p", col("n_sl").cast("double") / col("n_s"))
        .withColumn("ent_ns", round(-col("p") * log(col("p")) * 1e9).cast("long"))
        .withColumn("gini_ns", round(col("p") * col("p") * 1e9).cast("long"))
        .groupBy("source")
        .agg(countDistinct(col("lang")).as("n_langs"),
          sum(col("ent_ns")).as("entropy_ns"),
          (lit(1000000000L) - sum(col("gini_ns"))).as("gini_ns"))
        .orderBy("source")
    },

    // NDCG@10 (r12): the ranking-quality metric every retrieval eval
    // reports — here measuring, per query term, how well the length-
    // normalized tf-saturation ranking (the BM25 per-term kernel without
    // idf, which is constant within a term) recovers a raw-tf relevance
    // grade (rel = min(tf, 3), the 0-3 graded-judgment shape).
    // Determinism: the RANKING KEY is the integer-micros score with a
    // doc_id tie-break, so row_number is engine-portable; each position's
    // gain (2^rel − 1)/log₂(rank+1) is rounded to integer micros BEFORE
    // the per-term sum; NDCG is a ratio of two exact integers, rounded at
    // the very end. DCG uses the realized ranking, IDCG ranks the same
    // candidate set by rel (doc_id tie-break) — both windows partition by
    // term over df-bounded candidate sets (at 100 TB a hot term's
    // candidates are df-sized, and only top-10 survives; the bounded
    // top-k aggregate in functions/ is the drop-in if df itself explodes).
    "text_ndcg" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val dl = docs.select(col("doc_id"), size(toks).cast("double").as("dl"))
      val avg_ = dl.agg(avg(col("dl")).as("avgdl"))
      val tf = docs.select(col("doc_id"), explode(toks).as("term"))
        .filter(col("term").isin("table", "spark", "merge"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).cast("double").as("tf"))
      val scored = tf.join(dl, "doc_id").crossJoin(broadcast(avg_))
        .withColumn("score_us",
          round(col("tf") * 2.2 /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
            * 1000000.0).cast("long"))
        .withColumn("rel", least(col("tf"), lit(3.0)).cast("long"))
      val byScore = Window.partitionBy("term")
        .orderBy(col("score_us").desc, col("doc_id"))
      val byRel = Window.partitionBy("term")
        .orderBy(col("rel").desc, col("doc_id"))
      val gains = scored
        .withColumn("rk", row_number().over(byScore).cast("long"))
        .withColumn("irk", row_number().over(byRel).cast("long"))
        .withColumn("g_us", when(col("rk") <= 10,
          round((pow(lit(2.0), col("rel").cast("double")) - 1.0)
            / log2(col("rk").cast("double") + 1.0) * 1000000.0).cast("long"))
          .otherwise(lit(0L)))
        .withColumn("ig_us", when(col("irk") <= 10,
          round((pow(lit(2.0), col("rel").cast("double")) - 1.0)
            / log2(col("irk").cast("double") + 1.0) * 1000000.0).cast("long"))
          .otherwise(lit(0L)))
      gains.groupBy("term")
        .agg(sum(when(col("rk") <= 10, 1L).otherwise(0L)).as("n_ranked"),
          sum(col("g_us")).as("dcg_us"),
          sum(col("ig_us")).as("idcg_us"))
        .select(col("term"), col("n_ranked"), col("dcg_us"), col("idcg_us"),
          round(col("dcg_us").cast("double") / col("idcg_us"), 6).as("ndcg_r"))
        .orderBy("term")
    },
  )

  val oracles: Map[String, String] = Map(
    "text_bm25_topk" ->
      """WITH dl AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |  FROM documents
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
        |), tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents)
        |  WHERE term IN ('table', 'spark', 'merge')
        |  GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        |  FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id,
        |         CAST(round(
        |           ln((n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
        |           * tf.tf * 2.2
        |           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
        |           * 1000000.0) AS BIGINT) AS score_us
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
        |)
        |SELECT doc_id, CAST(sum(score_us) AS BIGINT) AS bm25_us,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM scored GROUP BY doc_id
        |ORDER BY bm25_us DESC, doc_id LIMIT 20""".stripMargin,

    "join_fuzzy_levenshtein" ->
      """WITH v AS (
        |  SELECT DISTINCT w FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |    UNION ALL
        |    SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
        |)
        |SELECT a.w AS wa, b.w AS wb,
        |       CAST(levenshtein(a.w, b.w) AS INT) AS dist
        |FROM v a JOIN v b ON a.w < b.w
        |WHERE levenshtein(a.w, b.w) <= 2
        |ORDER BY wa, wb""".stripMargin,

    "pipeline_data_card" ->
      """WITH base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |langs AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |         min(struct_pack(nc := -c, lang := lang)).lang AS top_lang
        |  FROM (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |        FROM documents GROUP BY 1, 2) GROUP BY 1),
        |dups AS (
        |  SELECT source,
        |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |           AS n_dup_docs
        |  FROM (SELECT source, md5(text) AS h, CAST(count(*) AS BIGINT) AS c
        |        FROM documents GROUP BY 1, 2) GROUP BY 1)
        |SELECT b.source, b.n_docs, b.n_tokens,
        |       CAST((CAST(b.n_tokens AS HUGEINT) * 1000) // b.n_docs AS BIGINT)
        |         AS mean_tokens_milli,
        |       l.n_langs, l.top_lang, d.n_dup_docs,
        |       CAST((CAST(d.n_dup_docs AS HUGEINT) * 10000) // b.n_docs
        |            AS BIGINT) AS dup_bp
        |FROM base b JOIN langs l ON b.source = l.source
        |JOIN dups d ON b.source = d.source
        |ORDER BY b.source""".stripMargin,

    "pipeline_quality_classifier" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_toks,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           AS n_dist,
        |         CAST(len(list_filter(string_split(text, ' '),
        |              t -> t IN ('a', 'the', 'of'))) AS DOUBLE) AS n_stop,
        |         CAST(len(text) AS DOUBLE) AS n_chars
        |  FROM documents
        |), z AS (
        |  SELECT doc_id,
        |         -2.0 + n_toks * 0.01 + (n_dist / n_toks) * 2.5
        |         - (n_stop / n_toks) * 3.0
        |         + ((n_chars - (n_toks - 1)) / n_toks) * 0.2 AS z
        |  FROM f)
        |SELECT doc_id, floor(z * 10000.0 + 0.5) / 10000.0 AS z_r,
        |       floor(1.0 / (1.0 + exp(-z)) * 10000.0 + 0.5) / 10000.0
        |         AS score_r,
        |       1.0 / (1.0 + exp(-z)) >= 0.5 AS accept
        |FROM z ORDER BY doc_id""".stripMargin,

    "pipeline_temperature_mix" ->
      """WITH w AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1e9) AS BIGINT)
        |           AS w_ns
        |  FROM documents GROUP BY source
        |), denom AS (SELECT sum(w_ns) AS denom_ns FROM w)
        |SELECT source, n_docs,
        |       round(CAST(w_ns AS DOUBLE) / denom_ns, 6) AS share_r,
        |       CAST(w_ns * 10000 // denom_ns AS BIGINT) AS draws_10k
        |FROM w, denom ORDER BY source""".stripMargin,

    "agg_entropy_gini" ->
      """WITH bl AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_sl
        |  FROM documents GROUP BY source, lang
        |), bs AS (
        |  SELECT source, sum(n_sl) AS n_s FROM bl GROUP BY source
        |), t AS (
        |  SELECT bl.source, bl.lang,
        |         CAST(bl.n_sl AS DOUBLE) / bs.n_s AS p
        |  FROM bl JOIN bs USING (source)
        |)
        |SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(sum(CAST(round(-p * ln(p) * 1e9) AS BIGINT)) AS BIGINT)
        |         AS entropy_ns,
        |       CAST(1000000000 - sum(CAST(round(p * p * 1e9) AS BIGINT))
        |         AS BIGINT) AS gini_ns
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "text_ndcg" ->
      """WITH dl AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |  FROM documents
        |), stats AS (SELECT avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents)
        |  WHERE term IN ('table', 'spark', 'merge')
        |  GROUP BY doc_id, term
        |), scored AS (
        |  SELECT tf.doc_id, tf.term,
        |         CAST(round(tf.tf * 2.2
        |           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
        |           * 1000000.0) AS BIGINT) AS score_us,
        |         CAST(least(tf.tf, 3.0) AS BIGINT) AS rel
        |  FROM tf JOIN dl USING (doc_id), stats
        |), ranked AS (
        |  SELECT term, rel,
        |         CAST(row_number() OVER (PARTITION BY term
        |           ORDER BY score_us DESC, doc_id) AS BIGINT) AS rk,
        |         CAST(row_number() OVER (PARTITION BY term
        |           ORDER BY rel DESC, doc_id) AS BIGINT) AS irk
        |  FROM scored
        |), gains AS (
        |  SELECT term,
        |         CASE WHEN rk <= 10 THEN CAST(round(
        |           (pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
        |           / log2(CAST(rk AS DOUBLE) + 1.0) * 1000000.0) AS BIGINT)
        |           ELSE 0 END AS g_us,
        |         CASE WHEN irk <= 10 THEN CAST(round(
        |           (pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
        |           / log2(CAST(irk AS DOUBLE) + 1.0) * 1000000.0) AS BIGINT)
        |           ELSE 0 END AS ig_us,
        |         CASE WHEN rk <= 10 THEN 1 ELSE 0 END AS in10
        |  FROM ranked)
        |SELECT term, CAST(sum(in10) AS BIGINT) AS n_ranked,
        |       CAST(sum(g_us) AS BIGINT) AS dcg_us,
        |       CAST(sum(ig_us) AS BIGINT) AS idcg_us,
        |       round(CAST(sum(g_us) AS DOUBLE) / sum(ig_us), 6) AS ndcg_r
        |FROM gains GROUP BY term ORDER BY term""".stripMargin,
  )
}
