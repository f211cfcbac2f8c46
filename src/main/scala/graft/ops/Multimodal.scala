package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode kernels are
  * DETERMINISTIC FAKES (clearly marked below) standing in for a real codec
  * call — simple byte arithmetic chosen so a DuckDB oracle can replay them.
  * Everything around the fake is the real Spark plumbing this family needs
  * at 100 TB: a typed `Dataset[MediaRow]` boundary, `mapPartitions` batch
  * processing (the Scala analog of `mapInPandas` — one iterator per
  * partition, so a real codec would amortize model/handle setup per
  * partition, not per row), binary-safe schemas, and narrow (shuffle-free)
  * execution.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. The payload is the
    * unit of 100 TB scale — partitioning is by file, metadata stays columnar
    * for pruning (a metadata-only query never touches `content`).
    */
  final case class MediaRow(
      media_id: Long, modality: String, mime: String,
      content: Array[Byte], n_bytes: Long)

  final case class DecodedMedia(
      media_id: Long, modality: String, width: Int, height: Int,
      channels: Int, duration_ms: Long)

  final case class MediaFeature(
      media_id: Long, feature: Array[Float])

  final case class MediaPhash(
      media_id: Long, modality: String, h1: Long, h2: Long)

  /** Deterministic media table derived from `documents` (the container has
    * no real media files): content = the UTF-8 text bytes, modality cycles
    * by doc_id. Real pipelines would `spark.read.format("binaryFile")` or
    * read (path, bytes) parquet — same schema from there on.
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val modality = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val mime = modality match {
          case "image" => "image/png"
          case "audio" => "audio/wav"
          case _ => "video/mp4"
        }
        MediaRow(id, modality, mime, bytes, bytes.length.toLong)
      }
  }

  // ---- decode kernels -------------------------------------------------------
  // STUB: deterministic fakes for the codec calls. A real deployment swaps
  // the bodies for e.g. ImageIO / ffmpeg bindings; signatures, batching and
  // schemas stay identical.

  /** STUB image/av header decode: dimensions derived from the first bytes. */
  def decodeStub(m: MediaRow): DecodedMedia = {
    val b0 = if (m.content.nonEmpty) m.content(0) & 0xff else 0
    val b1 = if (m.content.length > 1) m.content(1) & 0xff else 0
    DecodedMedia(
      m.media_id, m.modality,
      width = (b0 % 64) + 1,
      height = (b1 % 64) + 1,
      channels = 3,
      duration_ms = if (m.modality == "image") 0L else m.n_bytes * 10)
  }

  /** STUB feature extraction: 4-bin byte histogram (raw counts — small ints,
    * exactly representable in Float) — stands in for an embedding model;
    * same `Array[Float]` column shape. L1-normalize with
    * `transform(feature, f -> f / n_bytes)` when a unit vector is wanted.
    */
  def featureStub(m: MediaRow): MediaFeature = {
    val bins = new Array[Float](4)
    m.content.foreach(b => bins((b & 0xff) % 4) += 1f)
    MediaFeature(m.media_id, bins)
  }

  /** STUB perceptual hash (r19): a 60-bit SimHash over byte 8-grams —
    * stands in for a real pHash/aHash (DCT of a decoded image); the
    * SimHash structure is the real part: near-identical payloads agree on
    * most grams, so their fingerprints sit a small hamming distance
    * apart, and a banded equi-join can generate candidate pairs without
    * a cartesian (see `mm_phash_neardup`). Byte-exact replayable in SQL:
    * the per-gram hash is the EXACT integer polynomial
    * Σ_{j=0..7} byte[i+j] · 131^j (max 255·Σ131^j < 1.4e18 < Long.MAX —
    * no modulus, no wrap, so DuckDB computes the identical value), bit k
    * of the fingerprint is sign(Σ_grams ±1) over that hash bit, packed
    * as two 30-bit halves (h1 = bits 0–29, h2 = bits 30–59) to keep
    * every value comfortably positive in both engines. Payloads shorter
    * than the 8-byte window carry no fingerprint (filtered upstream).
    */
  def phashStub(m: MediaRow): MediaPhash = {
    val b = m.content
    val n = b.length
    val acc = new Array[Int](60)
    var i = 0
    while (i + 8 <= n) {
      var h = 0L
      var j = 7
      while (j >= 0) { h = h * 131L + (b(i + j) & 0xff); j -= 1 }
      var k = 0
      while (k < 60) {
        if (((h >>> k) & 1L) == 1L) acc(k) += 1 else acc(k) -= 1
        k += 1
      }
      i += 1
    }
    var h1 = 0L
    var h2 = 0L
    var k = 0
    while (k < 30) {
      if (acc(k) > 0) h1 |= (1L << k)
      if (acc(k + 30) > 0) h2 |= (1L << k)
      k += 1
    }
    MediaPhash(m.media_id, m.modality, h1, h2)
  }

  def phashes(media: Dataset[MediaRow]): Dataset[MediaPhash] = {
    import media.sparkSession.implicits._
    media.filter(_.n_bytes >= 8).mapPartitions(_.map(phashStub))
  }

  /** Decode a partition: iterator-in/iterator-out so codec setup happens
    * once per partition (the mapInPandas batch shape).
    */
  def decodePartition(rows: Iterator[MediaRow]): Iterator[DecodedMedia] = {
    // a real impl would open the codec/model handle here, once
    rows.map(decodeStub)
  }

  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decodePartition)
  }

  def features(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(featureStub))
  }

  /** Resize plan: halve each dimension, floor at 1 (pure column arithmetic
    * over the decoded metadata — no payload touch, so it's metadata-pruned).
    */
  def resizePlan(decoded: DataFrame, factor: Int = 2): DataFrame =
    decoded
      .withColumn("out_w", greatest(lit(1), (col("width") / factor).cast("int")))
      .withColumn("out_h", greatest(lit(1), (col("height") / factor).cast("int")))

  /** STUB payload resize: keep every `factor`-th byte (the downsampling
    * analog); a real impl swaps the body for a codec call with the same
    * per-partition iterator shape. The payload genuinely shrinks — this is
    * the byte-level stage, distinct from `resizePlan`'s metadata planning.
    */
  def resizeBytes(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val out = m.content.indices.collect {
        case i if i % factor == 0 => m.content(i)
      }.toArray
      m.copy(content = out, n_bytes = out.length.toLong)
    })
  }

  /** STUB frame sampling for video: every k-th byte is "a frame"; returns
    * frame count + first/last sampled byte. Real impl: ffmpeg keyframe pull
    * with the same per-partition iterator shape.
    */
  def frameSample(media: Dataset[MediaRow], k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video")
      .map { m =>
        val frames = m.content.indices.collect { case i if i % k == 0 => m.content(i) & 0xff }
        (m.media_id, frames.length, frames.headOption.getOrElse(-1), frames.lastOption.getOrElse(-1))
      }
      .toDF("media_id", "n_frames", "first_frame", "last_frame")
  }
}
