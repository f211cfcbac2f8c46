package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.functions.SimHash64

/** Ingest-side dedup — the streaming face of the batch dedup family
  * (`DedupQueries`): collapse duplicate documents AS THEY ARRIVE, with
  * state bounded by a watermark instead of a full-corpus join.
  *
  * Two collapse keys, composable because both run through
  * `dropDuplicatesWithinWatermark` (state pruned once the watermark
  * passes a key's last sighting — O(active window), not O(corpus)):
  *
  *   - exact: sha2-256 of the text (the streaming `dedup_exact`);
  *   - near: the 64-bit SimHash fingerprint over whitespace tokens —
  *     identical fingerprints are Hamming-0 near-duplicates (boilerplate
  *     re-crawls, trivial whitespace edits). TRUE banded near-dup (small
  *     Hamming distance) stays a batch job (`dedup_simhash`): collapsing
  *     on a band match without verification would over-delete, and
  *     verification needs the candidate's peer — a join, not a keyed
  *     filter. The honest streaming scope is fingerprint equality.
  *
  * At 100 TB/day of crawl: the state store holds one (key, ts) per
  * distinct in-window document, the collapse is a hash shuffle on the
  * fingerprint, and re-crawls beyond the window re-admit (dedup against
  * history is the batch pipeline's job over the lake, not the stream's).
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** Exact streaming dedup: first in-window copy of each text survives. */
  def exact(docs: Dataset[Doc], delay: String): DataFrame =
    docs.toDF()
      .withWatermark("ts", delay)
      .withColumn("content_key", sha2(col("text"), 256))
      .dropDuplicatesWithinWatermark("content_key")

  /** Fingerprint streaming dedup: first in-window doc per 64-bit SimHash
    * survives (Hamming-0 near-duplicates collapse).
    */
  def nearFingerprint(docs: Dataset[Doc], delay: String): DataFrame =
    docs.toDF()
      .withWatermark("ts", delay)
      .withColumn("fp",
        GraftColumnBridge.toColumn(SimHash64(
          GraftColumnBridge.toExpression(split(col("text"), "\\s+")))))
      .dropDuplicatesWithinWatermark("fp")
}
