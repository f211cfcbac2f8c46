package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkEntry, SparkSuite, Tables}

/** Batch/stream equivalence for incremental near-dup admission: streaming
  * the new-doc batch in ANY micro-batch split through the standing base
  * index must produce exactly the batch `dedup_incremental_near` verdicts.
  * This also pins the losslessness-invariance argument the design leans
  * on — the streaming probe ranks shingles by BASE document frequency
  * while the batch query ranks by whole-corpus frequency, and the
  * verdicts must agree anyway (prefix filtering is lossless under any
  * consistent order; exact verification is order-independent).
  */
class IncrementalAdmissionSpec extends SparkSuite {

  private def key(r: Row): (Long, (Boolean, Long, Option[Double], Boolean)) =
    r.getAs[Long]("doc_id") -> ((r.getAs[Boolean]("exact_dup"),
      r.getAs[Long]("n_near_base"),
      Option(r.getAs[java.lang.Double]("best_j")).map(_.doubleValue()),
      r.getAs[Boolean]("admitted")))

  test("screen() on the whole batch equals the batch query") {
    val expected = SparkEntry.queries("dedup_incremental_near")(spark, sfDir)
      .collect().map(key).toMap
    val incoming = Tables.documents(spark, sfDir).filter(col("doc_id") % 10 === 0)
    val got = IncrementalAdmission.screen(spark, sfDir, incoming)
      .collect().map(key).toMap
    assert(got == expected,
      s"diff=${(got.toSet diff expected.toSet).take(3)} | ${(expected.toSet diff got.toSet).take(3)}")
  }

  test("streamed admission over uneven micro-batch splits equals the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val expected = SparkEntry.queries("dedup_incremental_near")(spark, sfDir)
      .collect().map(key).toMap
    assert(expected.nonEmpty)

    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val verdicts = new ConcurrentHashMap[Long, (Boolean, Long, Option[Double], Boolean)]()
    val q = IncrementalAdmission.start(spark, sfDir,
      mem.toDF().toDF("doc_id", "text")) { out =>
      out.collect().foreach { r => val (k, v) = key(r); verdicts.put(k, v) }
    }
    try {
      val splits = Seq(docs.length / 5, docs.length / 2, docs.length * 4 / 5, docs.length)
      var from = 0
      splits.foreach { to =>
        if (to > from) mem.addData(docs.slice(from, to).toSeq: _*)
        from = math.max(from, to)
        q.processAllAvailable()
      }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val got = verdicts.asScala.toMap
    assert(got == expected,
      s"stream=${got.size} batch=${expected.size} " +
        s"diff=${(got.toSet diff expected.toSet).take(3)} | ${(expected.toSet diff got.toSet).take(3)}")
    // the fixture must exercise both verdicts, or the equivalence is vacuous
    assert(expected.values.exists(_._4) && expected.values.exists(!_._4))
  }

  private def vkey(r: Row): (Long, (Long, Option[Double], Boolean)) =
    r.getAs[Long]("vec_id") -> ((r.getAs[Long]("n_near_base"),
      Option(r.getAs[java.lang.Double]("best_cos")).map(_.doubleValue()),
      r.getAs[Boolean]("admitted")))

  test("streamed EMBEDDING admission over micro-batch splits equals the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val expected = SparkEntry.queries("dedup_incremental_cosine")(spark, sfDir)
      .collect().map(vkey).toMap
    assert(expected.nonEmpty)

    val vecs = Tables.embeddings(spark, sfDir).filter(col("vec_id") % 10 === 0)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, Array[Float])]
    val verdicts = new ConcurrentHashMap[Long, (Long, Option[Double], Boolean)]()
    val q = IncrementalAdmission.startVectors(spark, sfDir,
      mem.toDF().toDF("vec_id", "embedding")) { out =>
      out.collect().foreach { r => val (k, v) = vkey(r); verdicts.put(k, v) }
    }
    try {
      val splits = Seq(vecs.length / 3, vecs.length * 2 / 3, vecs.length)
      var from = 0
      splits.foreach { to =>
        if (to > from) mem.addData(vecs.slice(from, to).toSeq: _*)
        from = math.max(from, to)
        q.processAllAvailable()
      }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val got = verdicts.asScala.toMap
    assert(got == expected,
      s"stream=${got.size} batch=${expected.size} " +
        s"diff=${(got.toSet diff expected.toSet).take(3)} | ${(expected.toSet diff got.toSet).take(3)}")
  }
}
