package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

/** The reference's queue is a Redis list that survives process death
  * (`main.go:36-39`): events enqueued by the direct path are still there for
  * the drain worker after a crash/restart. These specs prove the FileQueue
  * gives the same guarantee — and that enqueue is executor-side (no driver
  * collect) while remaining atomic per partition segment.
  */
class DurableQueueSpec extends SparkSuite {

  private val cfg = CdcConfig(Map("orders" -> "grp_sales", "customer" -> "grp_dim"))
  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private val fixture = Seq(
    ChangeEvent("orders", "insert", null, Map("id" -> "1", "total" -> "10.5"), ts(0)),
    ChangeEvent("orders", "update", Map("id" -> "1", "total" -> "10.5"),
      Map("id" -> "1", "total" -> "12.0"), ts(1)),
    ChangeEvent("customer", "insert", null, Map("id" -> "7"), ts(3)))

  test("file queue survives restart: enqueue, drop all handles, drain from a fresh instance") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val server = new DebugSink
    val qdir = Files.createTempDirectory("graft_fq").toString
    try {
      val mem = MemoryStream[ChangeEvent]
      mem.addData(fixture: _*)
      val env = CdcPipeline.transform(mem.toDF(), cfg)
      val ckpt = Files.createTempDirectory("graft_ckpt").toString
      Sinks.runToCompletion(
        Sinks.dualSink(env, server.url, ckpt, q = FileQueue(qdir)))

      // Queued durably: segments on disk, nothing riding JVM state.
      assert(FileQueue(qdir).pending == 3)
      val segs = Files.list(Paths.get(qdir)).iterator().asScala.toSeq
      assert(segs.nonEmpty && segs.forall(_.getFileName.toString.startsWith("q-")),
        s"half-written temp segment visible: $segs")

      // "Restart": a brand-new handle built from config alone (as a fresh
      // process would) sees and drains everything the dead process queued.
      val before = server.captured.size
      val drained = Sinks.drainQueue(server.url, cfg.tableToGroup, q = FileQueue(qdir))
      assert(drained == 3)
      assert(server.captured.size == before + 3)
      assert(FileQueue(qdir).pending == 0)
    } finally server.stop()
  }

  test("crash mid-drain replays the whole segment (at-least-once)") {
    val qdir = Files.createTempDirectory("graft_fq2").toString
    val q = FileQueue(qdir)
    val c = q.client()
    (1 to 4).foreach(i => c.enqueue("g", s"""{"i":$i}"""))
    c.close()
    assert(q.pending == 4)

    // Consumer dies after the first two items: segment must NOT be deleted.
    var seen = 0
    intercept[RuntimeException] {
      q.drain { (_, _) => seen += 1; if (seen == 2) throw new RuntimeException("crash") }
    }
    assert(q.pending == 4, "partially-drained segment was dropped")

    // Next drain redelivers all four — at-least-once, like the reference's
    // crash-replay window (main.go:287-306).
    var redelivered = 0
    q.drain { (_, _) => redelivered += 1 }
    assert(redelivered == 4 && q.pending == 0)
  }

  test("queueStream drains segments as a streaming source, exactly once per segment") {
    val qdir = Files.createTempDirectory("graft_fq4").toString
    val ckpt = Files.createTempDirectory("graft_fq4_ckpt").toString
    val q = FileQueue(qdir)
    val c1 = q.client()
    c1.enqueue("grp_sales", """{"i":1}"""); c1.enqueue("grp_dim", """{"i":2}""")
    c1.close()

    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    def drainOnce(): Unit = {
      val qy = Sinks.queueStream(spark, qdir).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => got.add((r.getString(0), r.getString(1))))
          ()
        }.start()
      qy.awaitTermination()
    }
    drainOnce()
    assert(got.toArray(Array.empty[(String, String)]).toSet ==
      Set(("grp_sales", """{"i":1}"""), ("grp_dim", """{"i":2}""")))

    // A later segment: the restarted query (same checkpoint) reads ONLY it —
    // the engine checkpoint is the segment ledger, no destructive pop needed.
    val c2 = q.client()
    c2.enqueue("grp_sales", """{"i":3}""")
    c2.close()
    got.clear()
    drainOnce()
    assert(got.toArray(Array.empty[(String, String)]).toSeq ==
      Seq(("grp_sales", """{"i":3}""")))
  }

  test("a failed partition task publishes nothing (abort discards the half segment)") {
    import spark.implicits._
    val qdir = Files.createTempDirectory("graft_fq5").toString
    val q = FileQueue(qdir)
    val batch = CdcPipeline.transform(fixture.toDF(), cfg)
      .withColumn("payload",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("table") === "customer",
          org.apache.spark.sql.functions.lit(null).cast("string"))
          .otherwise(org.apache.spark.sql.functions.col("payload")))
      .coalesce(1) // one partition → the null row fails THE task that also
                   // enqueued the two valid rows before it
    intercept[Exception] { Sinks.queueDeliverBatch(batch, q) }
    // the failed attempt's partial segment must NOT be visible
    assert(q.pending == 0, "failed task published a partial segment")
    val leftovers = Files.list(Paths.get(qdir)).iterator().asScala.toSeq
    assert(leftovers.forall(!_.getFileName.toString.startsWith("q-")), leftovers.toString)
  }

  test("empty partitions publish no segments; enqueue is partition-local") {
    import spark.implicits._
    val qdir = Files.createTempDirectory("graft_fq3").toString
    val q = FileQueue(qdir)
    // 8 partitions, 3 rows: most partitions are empty and must leave no files.
    val batch = fixture.toDF()
    val env = CdcPipeline.transform(batch, cfg).repartition(8)
    Sinks.queueDeliverBatch(env, q)
    assert(q.pending == 3)
    val files = Files.list(Paths.get(qdir)).iterator().asScala.toSeq
    assert(files.forall(_.getFileName.toString.startsWith("q-")),
      s"leftover temp files: $files")
  }
}
