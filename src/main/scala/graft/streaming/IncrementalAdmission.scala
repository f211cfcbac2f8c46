package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.{Tables, ops}

/** Streaming NEAR-DUP ADMISSION — the arrival-time form of the batch
  * `dedup_incremental_near` screen: documents arrive as a stream, and each
  * micro-batch is screened against the STANDING base-corpus index (the
  * session artifact built once per (session, baseDir)), emitting the same
  * `(doc_id, exact_dup, n_near_base, best_j, admitted)` verdicts. This is
  * the steady-state shape of corpus curation behind a CDC feed: the base
  * index never rebuilds, per-batch cost is ~|batch|·prefix, and verdicts
  * are a pure function of (doc, base) — independent of how arrivals split
  * into micro-batches.
  *
  * The probe side ranks its shingles by the BASE document frequencies
  * (unseen shingles take df = 0 — rarest — which cannot collide with the
  * base anyway), while the batch query ranks by whole-corpus frequencies.
  * The two orders differ, and it does not matter: the asymmetric prefix
  * filter is lossless under ANY consistent total order on the shared
  * token universe, and exact-Jaccard verification is order-independent,
  * so streamed verdicts equal the batch query's exactly —
  * `IncrementalAdmissionSpec` pins that equivalence under uneven
  * micro-batch splits.
  *
  * Delivery uses `foreachBatch` (the Structured Streaming idiom for
  * joining a stream against heavyweight static artifacts with full batch
  * APIs), so the screen itself is the SAME code path in both modes —
  * [[ops.DedupQueries.admissionScreen]].
  */
object IncrementalAdmission {

  /** The standing base index per (session, baseDir): rarity-ordered
    * hashed-shingle arrays (base-df order), the base df stats the probe
    * ranks against, and the base content-hash set. Built once,
    * `localCheckpoint`ed, reused by every micro-batch.
    */
  private val baseCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, DataFrame, DataFrame)]()

  private def baseIndex(s: SparkSession, baseDir: String): (DataFrame, DataFrame, DataFrame) = {
    baseCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    baseCache.computeIfAbsent((s, baseDir), _ => {
      // the base slice of the session shingle cache (the same cache every
      // dedup operator shares) — base = docs outside the arriving batch
      val sh = ops.DedupQueries.shingles(s, baseDir)
        .filter(col("doc_id") % 10 =!= 0)
      val df_ = sh.groupBy("shingle").agg(count(lit(1)).as("df")).localCheckpoint()
      val arrays = ops.DedupQueries.rarityArrays(
          sh.join(df_, "shingle").select(col("doc_id"), col("shingle").as("tok"), col("df")))
        .localCheckpoint()
      val hashes = Tables.documents(s, baseDir)
        .filter(col("doc_id") % 10 =!= 0)
        .select(sha2(col("text"), 256).as("h")).distinct()
        .localCheckpoint()
      (arrays, df_, hashes)
    })
  }

  /** Screen one (micro-)batch of incoming `(doc_id, text, …)` docs against
    * the standing base index. Pure function of (incoming, base) — shared
    * verbatim by every micro-batch and by the spec's batch-equivalence
    * check.
    */
  def screen(s: SparkSession, baseDir: String, incoming: DataFrame): DataFrame = {
    val (bArrays, bDf, bHashes) = baseIndex(s, baseDir)
    val pSh = ops.DedupQueries.explodedShingles(incoming)
    // Materialized because admissionScreen references the probe arrays
    // twice (candidate prefixes + the verify fetch-back) — uncheckpointed,
    // every micro-batch would pay the shingle explode + base-df join +
    // sort aggregate twice. Bounded: one small table per micro-batch,
    // released by GC + ContextCleaner with the batch.
    val pArrays = ops.DedupQueries.rarityArrays(
        pSh.join(bDf, Seq("shingle"), "left")
          .select(col("doc_id"), col("shingle").as("tok"),
            coalesce(col("df"), lit(0L)).as("df")))
      .localCheckpoint()
    ops.DedupQueries.admissionScreen(incoming, pArrays, bArrays, bHashes, 0.5)
  }

  /** The standing EMBEDDING-space base index per (session, baseDir): the
    * base corpus sign-banded (21×3-bit keys, embedding + norm carried for
    * inline verification), checkpointed once and joined by every arriving
    * micro-batch of vectors.
    */
  private val vecBaseCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def vecBaseIndex(s: SparkSession, baseDir: String): DataFrame = {
    vecBaseCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    vecBaseCache.computeIfAbsent((s, baseDir), _ =>
      ops.DedupQueries.signBanded(
        Tables.embeddings(s, baseDir)
          .filter(col("vec_id") % 10 =!= 0)
          .select(col("vec_id"), col("embedding"),
            graft.functions.VectorOps.norm(col("embedding")).as("nrm")))
        .localCheckpoint())
  }

  /** Screen one (micro-)batch of incoming `(vec_id, embedding)` vectors
    * against the standing banded base — the embedding-space analog of
    * [[screen]], same code path as the batch `dedup_incremental_cosine`
    * query ([[ops.DedupQueries.cosineAdmissionScreen]]).
    */
  def screenVectors(s: SparkSession, baseDir: String, incoming: DataFrame): DataFrame =
    ops.DedupQueries.cosineAdmissionScreen(
      incoming.select(col("vec_id"), col("embedding"),
        graft.functions.VectorOps.norm(col("embedding")).as("nrm")),
      vecBaseIndex(s, baseDir), 0.45)

  /** Start per-micro-batch vector screening (foreachBatch, like [[start]]). */
  def startVectors(s: SparkSession, baseDir: String, incoming: DataFrame)(
      sink: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(screenVectors(s, baseDir, batch))
        ()
      }
      .start()

  /** Unpersist the standing base indexes of `s` and drop the entries —
    * the eager-release contract `DedupQueries.clearCache` defines, for
    * long-lived services that screen against many base dirs.
    */
  def clearBaseIndex(s: SparkSession): Unit = {
    val it = baseCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        val (arrays, df_, hashes) = e.getValue
        Seq(arrays, df_, hashes).foreach { df =>
          org.apache.spark.sql.GraftColumnBridge.checkpointRdd(df)
            .foreach(r => try r.unpersist(blocking = false) catch { case _: Exception => () })
        }
        it.remove()
      }
    }
    val vt = vecBaseCache.entrySet().iterator()
    while (vt.hasNext) {
      val e = vt.next()
      if (e.getKey._1 eq s) {
        org.apache.spark.sql.GraftColumnBridge.checkpointRdd(e.getValue)
          .foreach(r => try r.unpersist(blocking = false) catch { case _: Exception => () })
        vt.remove()
      }
    }
  }

  /** Wire a streaming `(doc_id, text)` source to per-micro-batch screening:
    * each batch's verdicts go to `sink`. Caller starts/stops the query.
    */
  def stream(s: SparkSession, baseDir: String, incoming: DataFrame)(
      sink: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(screen(s, baseDir, batch))
        ()
      }

  /** Convenience: start with a processing-time trigger. */
  def start(s: SparkSession, baseDir: String, incoming: DataFrame)(
      sink: DataFrame => Unit): StreamingQuery =
    stream(s, baseDir, incoming)(sink).start()
}
