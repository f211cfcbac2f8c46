package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Multimodal plumbing beyond the oracle queries: ingestion through Spark's
  * standard `binaryFile` source (the real 100 TB entry path for media), and
  * kernel properties of the stub codecs.
  */
class MultimodalSpec extends SparkSuite {

  test("binaryFile ingestion: opaque payloads with columnar metadata") {
    val dir = Files.createTempDirectory("graft_media")
    Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.wav"), Array[Byte](9, 8, 7))
    val df = spark.read.format("binaryFile").load(dir.toString)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val rows = df.select(col("path"), col("length"), col("content"))
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1))).sorted
    assert(rows.toSeq == Seq(("a.png", 4L), ("b.wav", 3L)))
    // metadata-only projection never deserializes content (pushdown prunes)
    val meta = spark.read.format("binaryFile").load(dir.toString).select("length")
    assert(!meta.queryExecution.executedPlan.toString.contains("content"))
  }

  test("feature histogram counts sum to the payload length") {
    Multimodal.mediaTable(spark, sfDir).collect().take(50).foreach { m =>
      val f = Multimodal.featureStub(m)
      assert(f.feature.map(_.toDouble).sum == m.n_bytes.toDouble)
      assert(f.feature.length == 4)
    }
  }

  test("resizeBytes shrinks payloads by the factor and keeps metadata consistent") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val resized = Multimodal.resizeBytes(media, 3)
    val pairs = media.collect().map(m => m.media_id -> m.n_bytes).toMap
    resized.collect().take(50).foreach { m =>
      val orig = pairs(m.media_id)
      assert(m.n_bytes == (orig + 2) / 3, s"id=${m.media_id} orig=$orig got=${m.n_bytes}")
      assert(m.content.length.toLong == m.n_bytes)
    }
  }

  test("phash: near-identical payloads sit close, banding finds exactly the <=3 ball") {
    // locality: one byte edit moves at most 8 gram hashes of ~n, so the
    // fingerprint hamming stays small
    val base = "the quick brown fox jumps over the lazy dog again and again".getBytes("UTF-8")
    val edit = base.clone(); edit(10) = 'X'.toByte
    def ph(b: Array[Byte]) =
      Multimodal.phashStub(Multimodal.MediaRow(0L, "image", "image/png", b, b.length.toLong))
    val (a, b) = (ph(base), ph(edit))
    def ham(x: Multimodal.MediaPhash, y: Multimodal.MediaPhash) =
      java.lang.Long.bitCount(x.h1 ^ y.h1) + java.lang.Long.bitCount(x.h2 ^ y.h2)
    assert(ham(a, a) == 0)
    assert(ham(a, b) < 15, s"one-byte edit moved ${ham(a, b)} of 60 bits")
    // pigeonhole exhaustiveness: the banded join's result equals the
    // brute-force <=3 ball on the real corpus
    val hashes = Multimodal.phashes(Multimodal.mediaTable(spark, sfDir)).collect()
    val brute = (for {
      x <- hashes; y <- hashes
      if x.modality == y.modality && x.media_id < y.media_id
      if ham(x, y) <= 3
    } yield (x.modality, x.media_id, y.media_id)).toSet
    val banded = graft.SparkEntry.queries("mm_phash_neardup")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} diff=${(banded diff brute) ++ (brute diff banded)}")
    assert(brute.nonEmpty, "corpus should contain near-dup media pairs")
  }

  test("decode stub is total: empty payloads get floor dimensions") {
    val d = Multimodal.decodeStub(
      Multimodal.MediaRow(0L, "image", "image/png", Array.empty[Byte], 0L))
    assert(d.width == 1 && d.height == 1 && d.channels == 3 && d.duration_ms == 0L)
  }
}
