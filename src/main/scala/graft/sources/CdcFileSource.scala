package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 micro-batch source tailing an append-only change-log file —
  * the structural analog of the reference's binlog tail (reference
  * `main.go:459-485`): a remote log with a monotone position, resumed from a
  * persisted offset (`main.go:257-306` — here the engine's checkpoint log
  * plays the role of the reference's Redis/file position store).
  *
  * Wire format: one serialized change event per line (the envelope JSON or
  * any line-oriented encoding); schema is `line STRING, pos BIGINT` like the
  * kafka/socket sources — the CDC pipeline parses with `from_json`
  * downstream. Offset = line count, serialized as `{"pos":N}` mirroring the
  * reference's `{name, pos}` position JSON (`main.go:41-44`).
  *
  * Usage: `spark.readStream.format("graft.sources.CdcFileSource")
  *   .option("path", file).load()`
  * Also supports batch reads of the whole log (same schema).
  */
class CdcFileSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcFileSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcFileTable(properties.get("path"))
}

object CdcFileSource {
  val schema: StructType = StructType(Seq(
    StructField("line", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** Open a lazy reader over lines [from, until) of the log. Streams the
    * file (constant memory regardless of log size) and carries its own
    * close handle — a tail over a growing log stays O(batch), not O(file).
    */
  def openLines(path: String, from: Long, until: Long): LineRange = {
    val stream = Files.lines(Paths.get(path), StandardCharsets.UTF_8)
      .skip(from).limit(math.max(0L, until - from))
    new LineRange(stream, from)
  }

  /** Eagerly materialized range — test/utility surface over [[openLines]]. */
  def readLines(path: String, from: Long, until: Long): Seq[(String, Long)] = {
    val r = openLines(path, from, until)
    try r.iterator.toVector finally r.close()
  }

  def lineCount(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.lines(p, StandardCharsets.UTF_8)
      try s.count() finally s.close()
    }
  }

  final class LineRange(stream: java.util.stream.Stream[String], from: Long)
      extends AutoCloseable {
    val iterator: Iterator[(String, Long)] =
      stream.iterator().asScala.zipWithIndex.map { case (l, i) => (l, from + i) }
    override def close(): Unit = stream.close()
  }
}

final case class CdcOffset(pos: Long) extends Offset {
  override def json(): String = s"""{"pos":$pos}"""
}

class CdcFileTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"cdc-file($path)"
  override def schema(): StructType = CdcFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      private val maxLines = Option(options.get("maxLinesPerBatch")).map(_.toLong)
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = CdcFileSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcFileMicroBatchStream(path, maxLines)
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            Array(CdcRangePartition(path, 0L, CdcFileSource.lineCount(path)))
          override def createReaderFactory(): PartitionReaderFactory = CdcReaderFactory
        }
      }
    }
}

/** Offsets advance to the log's current end at each batch; ranges are served
  * as a single ordered partition (the binlog is inherently serial per
  * server — parallelism comes from the downstream shuffle, as in the
  * reference's single-consumer topology, `k8s/deployment.yaml:8`).
  */
class CdcFileMicroBatchStream(path: String, maxLinesPerBatch: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: pin the end offset once so all batches of the
  // trigger drain exactly the log-as-of-start, then the query terminates.
  private var pinnedEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    pinnedEnd = Some(CdcFileSource.lineCount(path))

  override def initialOffset(): Offset = CdcOffset(0L)
  override def latestOffset(): Offset =
    CdcOffset(pinnedEnd.getOrElse(CdcFileSource.lineCount(path)))

  /** Admission control (backpressure): honor `maxLinesPerBatch` so a large
    * backlog drains in bounded micro-batches instead of one giant one —
    * the knob that keeps recovery-from-far-behind from OOMing a batch.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val end = latestOffset().asInstanceOf[CdcOffset].pos
    limit match {
      case m: ReadMaxRows =>
        CdcOffset(math.min(end, start.asInstanceOf[CdcOffset].pos + m.maxRows()))
      case _ => CdcOffset(end)
    }
  }
  override def getDefaultReadLimit: ReadLimit =
    maxLinesPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
  override def reportLatestOffset(): Offset = latestOffset()
  override def deserializeOffset(json: String): Offset = {
    val pos = """"pos"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json"))
    CdcOffset(pos)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[CdcOffset].pos, end.asInstanceOf[CdcOffset].pos)
    if (e <= s) Array.empty else Array(CdcRangePartition(path, s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory = CdcReaderFactory
  override def commit(end: Offset): Unit = () // nothing to ack; the log is a file
  override def stop(): Unit = ()
}

final case class CdcRangePartition(path: String, from: Long, until: Long)
    extends InputPartition

object CdcReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcRangePartition]
    new PartitionReader[InternalRow] {
      private val range = CdcFileSource.openLines(p.path, p.from, p.until)
      private val it = range.iterator
      private var cur: (String, Long) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(cur._1), cur._2)
      override def close(): Unit = range.close()
    }
  }
}
