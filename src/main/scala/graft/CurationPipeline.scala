package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation chain, composed from the same
  * operators the query inventory declares one-by-one — the "a user could
  * run their whole pipeline on this library" proof. Stages, each consuming
  * the previous stage's survivor set:
  *
  *   1 ingest          every document
  *   2 quality         the Gopher-ish integer rule set (pipeline_filter_funnel's stages)
  *   3 exact_dedup     min doc_id per sha256(text) (dedup_exact's policy)
  *   4 near_dedup      min surviving member per Jaccard-0.5 component
  *                     (the session-cached dedup_components labels)
  *   5 decontaminate   drop the eval slice and any doc sharing ≥50% of its
  *                     shingles with it (pipeline_contamination's screen)
  *   6 resample        DSIR-style stopword-ratio importance sampling
  *                     (pipeline_importance_resample's acceptance rule)
  *   7 split_train     the reproducible 98% train bucket
  *                     (pipeline_train_val_split's salted-md5 assignment)
  *   8 pack_256        packed 256-token training rows the survivors yield
  *                     (pipeline_pack_sequences' budget arithmetic)
  *
  * Every stage is keyed joins/aggregates over the doc grain (the dedup
  * stages reuse the session pair/component caches), so the chain's scale
  * shape is the sum of its parts — nothing here adds a shuffle the
  * stand-alone operators don't already pay. The ledger is deterministic:
  * all predicates are integer-exact or salted-hash decisions, so two runs
  * (or two engines) produce identical counts.
  *
  * Runnable: `sbt "runMain graft.CurationPipeline [sfDir]"` prints one
  * JSON line per stage; `CurationPipelineSpec` pins monotone attrition,
  * agreement with the stand-alone queries, and run-to-run determinism.
  */
object CurationPipeline {

  private def fold(prefix: String): Column = {
    val h = md5(concat(lit(prefix), col("doc_id").cast("string")))
    (1 to 32).map(i => ascii(substring(h, i, 1)) * lit(i))
      .reduce(_ + _).cast("long")
  }

  /** The per-stage survivor sets (name -> annotated survivors). */
  def stages(s: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    val toksCol = split(col("text"), " ")
    val ingest = Tables.documents(s, dir)
      .withColumn("nt", size(toksCol).cast("long"))
      .withColumn("nd", size(array_distinct(toksCol)).cast("long"))
      .withColumn("n_stop",
        size(filter(toksCol, t => t === "a" || t === "the" || t === "of"))
          .cast("long"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
        col("nt"), col("nd"), col("n_stop"))

    val quality = ingest.filter(col("nt") >= 20 && col("lang") === "en" &&
      col("nd") * 100 >= col("nt") * 55 && col("n_chars") <= 400)

    val exactReps = quality.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val exact = quality.join(exactReps.select("doc_id"), Seq("doc_id"), "left_semi")

    val comp = ops.DedupQueries.componentsJaccard(s, dir, 0.5)
      .select(col("id").as("doc_id"), col("comp"))
    val labeled = exact.join(comp, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("comp"), col("doc_id")))
    val nearKeep = labeled.groupBy("component").agg(min(col("doc_id")).as("doc_id"))
    val near = labeled.drop("comp", "component")
      .join(nearKeep.select("doc_id"), Seq("doc_id"), "left_semi")

    val sh = ops.DedupQueries.shingles(s, dir)
    val probes = sh.filter(col("doc_id") % 100 === 7).select("shingle").distinct()
    val card = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val overlap = sh.join(broadcast(probes), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_ov"))
    val contaminated = card.join(overlap, "doc_id")
      .filter(col("n_ov") * 2 >= col("n_sh")).select("doc_id")
    val clean = near.filter(col("doc_id") % 100 =!= 7)
      .join(contaminated, Seq("doc_id"), "left_anti")

    val resampled = clean
      .withColumn("hash_bp", pmod(fold("resample:"), lit(10000L)))
      .withColumn("accept_bp",
        expr("least(10000, 400 + 3 * ((n_stop * 10000) div nt))"))
      .filter(col("hash_bp") < col("accept_bp"))
      .drop("hash_bp", "accept_bp")

    val train = resampled.filter(pmod(fold("split:"), lit(100L)) < 98)

    Seq("ingest" -> ingest, "quality" -> quality, "exact_dedup" -> exact,
      "near_dedup" -> near, "decontaminate" -> clean,
      "resample" -> resampled, "split_train" -> train)
  }

  /** One row per stage: survivors + their token mass; the final `pack_256`
    * row reports the packed 256-token training rows the survivors yield.
    */
  def ledger(s: SparkSession, dir: String): DataFrame = {
    val sts = stages(s, dir)
    val rows = sts.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("nt")), lit(0L)).as("sum_toks"))
        .select(lit(i + 1).as("stage_no"), lit(name).as("stage"),
          col("n_docs"), col("sum_toks"))
    }
    val pack = sts.last._2
      .agg(coalesce(sum(col("nt")), lit(0L)).as("toks"))
      .select(lit(sts.size + 1).as("stage_no"), lit("pack_256").as("stage"),
        expr("toks div 256").as("n_docs"), col("toks").as("sum_toks"))
    rows.reduce(_.unionByName(_)).unionByName(pack).orderBy("stage_no")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    ledger(spark, dir).collect().foreach { r =>
      println(s"""{"stage_no":${r.getAs[Int]("stage_no")},""" +
        s""""stage":"${r.getAs[String]("stage")}",""" +
        s""""n_docs":${r.getAs[Long]("n_docs")},""" +
        s""""sum_toks":${r.getAs[Long]("sum_toks")}}""")
    }
    spark.stop()
  }
}
