package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** TEMPORARY probe: how do pushed filters render in batch plans, and does
  * the micro-batch path invoke pushFilters at all in Spark 4.1?
  */
class PushdownProbeSpec extends SparkSuite {

  private def line(table: String, op: String, id: Int): String =
    s"""{"table":"$table","op":"$op","after":{"id":"$id"},"ts":"2024-01-01T00:00:0$id"}"""

  private def append(p: Path, lines: String*): Unit =
    Files.write(p, (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("probe batch plan rendering") {
    val log = Files.createTempFile("cdc_probe", ".jsonl")
    append(log, line("orders", "insert", 1), line("orders", "delete", 2),
      line("other", "insert", 3))
    val df = spark.read.format(classOf[CdcFileSource].getName)
      .option("path", log.toString).load()
      .filter(col("line").contains("\"op\":\"insert\""))
    println("=== executedPlan ===")
    println(df.queryExecution.executedPlan.toString)
    println("=== formatted ===")
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    println("=== count=" + df.count())
  }

  test("probe streaming pushdown") {
    val log = Files.createTempFile("cdc_probe_s", ".jsonl")
    append(log, line("orders", "insert", 1), line("orders", "delete", 2))
    val q = spark.readStream.format(classOf[CdcFileSource].getName)
      .option("path", log.toString).load()
      .filter(col("line").contains("\"op\":\"insert\""))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("probe_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
      .start()
    q.awaitTermination()
    val le = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution
    println("=== streaming executedPlan ===")
    println(le.executedPlan.toString)
  }
}
