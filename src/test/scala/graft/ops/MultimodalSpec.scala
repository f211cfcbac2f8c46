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

  test("decode stub is total: empty payloads get floor dimensions") {
    val d = Multimodal.decodeStub(
      Multimodal.MediaRow(0L, "image", "image/png", Array.empty[Byte], 0L))
    assert(d.width == 1 && d.height == 1 && d.channels == 3 && d.duration_ms == 0L)
  }
}
