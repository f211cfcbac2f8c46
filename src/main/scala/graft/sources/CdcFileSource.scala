package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.Filter
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

  /** Incremental tail over the growing log: a stateful line counter that
    * reads only the bytes appended since its previous poll, so a
    * long-running stream does O(new data) per micro-batch instead of
    * re-scanning the file (O(file) per poll, O(file²) cumulative — the r2
    * complexity bug). Mirrors the reference's O(1) position bookkeeping
    * (`main.go:119-123`): it keeps a byte position, not a line recount.
    *
    * CONTRACT — the log is '\n'-framed UTF-8 (JSONL: a raw CR inside a JSON
    * string is impossible, it must be escaped), and ONLY terminated lines
    * are offered as offsets: a partial trailing line that a writer is still
    * appending is invisible until its '\n' lands, so a batch can never read
    * a torn prefix of an in-flight record (and the record is delivered
    * whole by a later batch — counting the partial would permanently skip
    * its completion). This is why `bytePos` is always publishable: the
    * offset boundary is by construction a line boundary.
    *
    * Truncation (size < last seen position) resets the state and rescans.
    * In-place rotation to an equal-or-larger file is NOT detectable by
    * size alone (that needs inode-level monitoring, as `tail -F` does) —
    * out of scope for this file-log analog of the binlog, where positions
    * only grow.
    */
  final class Tail(path: String) {
    private var completeLines = 0L // lines terminated by '\n'
    private var byteAfterNl = 0L   // offset just past the last '\n' seen
    private var scanned = 0L       // total bytes ever read (test/diagnostic surface)

    def bytesScanned: Long = scanned

    /** Current end of the log as (terminated-line count, byte offset just
      * past the last terminator — where line N starts).
      */
    def poll(): (Long, Long) = synchronized {
      val p = Paths.get(path)
      if (!Files.exists(p)) return (0L, 0L)
      val size = Files.size(p)
      if (size < byteAfterNl) { completeLines = 0L; byteAfterNl = 0L } // truncated
      if (size > byteAfterNl) {
        val in = Files.newInputStream(p)
        try {
          var toSkip = byteAfterNl
          while (toSkip > 0) {
            val s = in.skip(toSkip)
            if (s <= 0) toSkip = 0 else toSkip -= s
          }
          val buf = new Array[Byte](64 * 1024)
          var readPos = byteAfterNl
          var n = in.read(buf)
          while (n > 0) {
            var i = 0
            while (i < n) {
              if (buf(i) == '\n') { completeLines += 1; byteAfterNl = readPos + i + 1 }
              i += 1
            }
            scanned += n
            readPos += n
            n = in.read(buf)
          }
        } finally in.close()
      }
      (completeLines, byteAfterNl)
    }
  }

  /** Byte offset just past the `n`th '\n' at or after `fromByte` — maps an
    * admission-capped line offset back to a byte position so every batch of
    * a large backlog drain seeks instead of line-skipping from the file
    * head (which would be O(backlog²) cumulative). Returns -1 if fewer
    * than `n` newlines exist past `fromByte`.
    */
  def byteAfterNewlines(path: String, fromByte: Long, n: Long): Long = {
    if (n <= 0) return fromByte
    val in = Files.newInputStream(Paths.get(path))
    try {
      var toSkip = fromByte
      while (toSkip > 0) {
        val s = in.skip(toSkip)
        if (s <= 0) toSkip = 0 else toSkip -= s
      }
      val buf = new Array[Byte](64 * 1024)
      var readPos = fromByte
      var seen = 0L
      var r = in.read(buf)
      while (r > 0) {
        var i = 0
        while (i < r) {
          if (buf(i) == '\n') {
            seen += 1
            if (seen == n) return readPos + i + 1
          }
          i += 1
        }
        readPos += r
        r = in.read(buf)
      }
      -1L
    } finally in.close()
  }

  /** Open a lazy reader over lines [from, until) starting at a known byte
    * offset — a seek replaces the O(from) line skip of [[openLines]], so
    * reading the tail of a long log costs O(batch), not O(position).
    */
  def openLinesAt(path: String, from: Long, until: Long, fromByte: Long): LineRange = {
    val in = Files.newInputStream(Paths.get(path))
    var toSkip = fromByte
    while (toSkip > 0) {
      val s = in.skip(toSkip)
      if (s <= 0) toSkip = 0 else toSkip -= s
    }
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
    val stream = reader.lines().limit(math.max(0L, until - from))
    new LineRange(stream, from) {
      override def close(): Unit = { super.close(); reader.close() }
    }
  }

  class LineRange(stream: java.util.stream.Stream[String], from: Long)
      extends AutoCloseable {
    val iterator: Iterator[(String, Long)] =
      stream.iterator().asScala.zipWithIndex.map { case (l, i) => (l, from + i) }
    override def close(): Unit = stream.close()
  }
}

/** Log position: line count, plus (when known) the byte offset where line
  * `pos` starts, so the next batch's reader can seek instead of re-skipping
  * `pos` lines. `bytePos` is -1 when unknown (legacy checkpoint JSON,
  * admission-capped offsets, partial trailing line) — readers then fall
  * back to the line skip. Mirrors the reference's `{name, pos}` position
  * JSON (`main.go:41-44`), which is likewise a byte position.
  */
final case class CdcOffset(pos: Long, bytePos: Long = -1L) extends Offset {
  override def json(): String =
    if (bytePos >= 0) s"""{"pos":$pos,"bytePos":$bytePos}"""
    else s"""{"pos":$pos}"""
}

object CdcOffset {
  /** The single wire-format parser — used by both the engine checkpoint
    * restore and the dual-written position mirror, so the format cannot
    * drift between the two.
    */
  def parse(json: String): Option[CdcOffset] = {
    val pos = """"pos"\s*:\s*(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
    val bytePos = """"bytePos"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(-1L)
    pos.map(CdcOffset(_, bytePos))
  }
}

class CdcFileTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"cdc-file($path)"
  override def schema(): StructType = CdcFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters {
      private val maxLines = Option(options.get("maxLinesPerBatch")).map(_.toLong)
      private val positionDir = Option(options.get("positionDir"))
      private var pushed: Array[Filter] = Array.empty
      // Accept raw-column predicates (string ops on `line`, comparisons on
      // `pos`) for source-side row skipping, but report EVERY filter back
      // as residual — Spark re-applies the exact predicates, so pushdown
      // can only drop rows the query would drop anyway.
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters.filter(LineFilters.supported(_, Set("line", "pos")))
        filters
      }
      override def pushedFilters(): Array[Filter] = pushed
      private val guards = LineFilters.guardFilters(k => Option(options.get(k)))
      override def build(): Scan = new Scan {
        private val fs = pushed.toSeq ++ guards
        override def readSchema(): StructType = CdcFileSource.schema
        override def description(): String =
          s"cdc-file($path), PushedFilters: ${pushed.mkString("[", ", ", "]")}" +
            (if (guards.nonEmpty) s", LineGuards: ${guards.mkString("[", ", ", "]")}" else "")
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcFileMicroBatchStream(path, maxLines, positionDir, fs)
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            Array(CdcRangePartition(path, 0L, CdcFileSource.lineCount(path),
              filters = fs))
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
class CdcFileMicroBatchStream(path: String, maxLinesPerBatch: Option[Long] = None,
    positionDir: Option[String] = None, filters: Seq[Filter] = Nil)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // Optional operational position mirror (option `positionDir`): committed
  // offsets dual-write to two files there, surviving loss of either copy —
  // the reference's Redis+file degraded-mode checkpoint (`main.go:287-306`)
  // alongside the engine's canonical offset/commit log. The engine invokes
  // `commit(end)` when the batch AFTER `end` starts ("safe to discard"
  // semantics), so the mirror trails the in-flight batch — exactly as the
  // reference's position file trails the event being forwarded.
  private val positions: Option[DualPositionStore] = positionDir.map { d =>
    val base = Paths.get(d)
    new DualPositionStore(base.resolve("position.json"),
      base.resolve("position.backup.json"))
  }

  // Incremental tail: each poll reads only bytes appended since the last
  // one, so a long-running stream's offset discovery is O(new data), not
  // O(file) — the r2 version re-counted the whole log every micro-batch.
  private val tail = new CdcFileSource.Tail(path)

  /** Bytes this stream has ever scanned for offset discovery — lets specs
    * assert that polling an unchanged log reads nothing.
    */
  def bytesScanned: Long = tail.bytesScanned

  // Trigger.AvailableNow: pin the end offset once so all batches of the
  // trigger drain exactly the log-as-of-start, then the query terminates.
  private var pinnedEnd: Option[CdcOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    val (pos, byte) = tail.poll()
    pinnedEnd = Some(CdcOffset(pos, byte))
  }

  override def initialOffset(): Offset = CdcOffset(0L, 0L)
  override def latestOffset(): Offset =
    pinnedEnd.getOrElse { val (pos, byte) = tail.poll(); CdcOffset(pos, byte) }

  /** Admission control (backpressure): honor `maxLinesPerBatch` so a large
    * backlog drains in bounded micro-batches instead of one giant one —
    * the knob that keeps recovery-from-far-behind from OOMing a batch.
    * The capped offset's byte position is recovered by scanning just the
    * capped span from the start offset's byte — every batch of a backlog
    * drain stays a seek + O(batch) read, not a line skip from the file
    * head (which would be O(backlog²) cumulative across the drain).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val end = latestOffset().asInstanceOf[CdcOffset]
    val s = start.asInstanceOf[CdcOffset]
    limit match {
      case m: ReadMaxRows if s.pos + m.maxRows() < end.pos =>
        val cappedByte =
          if (s.bytePos >= 0)
            CdcFileSource.byteAfterNewlines(path, s.bytePos, m.maxRows())
          else -1L // legacy checkpoint without byte position: reader line-skips
        CdcOffset(s.pos + m.maxRows(), cappedByte)
      case _ => end
    }
  }
  override def getDefaultReadLimit: ReadLimit =
    maxLinesPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
  override def reportLatestOffset(): Offset = latestOffset()
  override def deserializeOffset(json: String): Offset =
    CdcOffset.parse(json)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json"))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[CdcOffset], end.asInstanceOf[CdcOffset])
    if (e.pos <= s.pos) Array.empty
    // Offsets always cover the UNFILTERED line count (positions must stay
    // stable under any filter set); only row emission is filtered.
    else Array(CdcRangePartition(path, s.pos, e.pos, s.bytePos, filters))
  }
  override def createReaderFactory(): PartitionReaderFactory = CdcReaderFactory
  // The log itself needs no ack; the commit hook feeds the optional
  // dual-written position mirror (degraded-mode ops surface).
  override def commit(end: Offset): Unit =
    positions.foreach(_.save(end.asInstanceOf[CdcOffset]))
  override def stop(): Unit = ()
}

final case class CdcRangePartition(path: String, from: Long, until: Long,
    fromByte: Long = -1L, filters: Seq[Filter] = Nil) extends InputPartition

object CdcReaderFactory extends PartitionReaderFactory {

  /** Shared partition-reader body for the single-file and directory
    * sources: seek when a byte position is known, line-skip otherwise.
    * Pushed filters are applied per line BEFORE row materialization — a
    * skipped line never becomes an InternalRow and never reaches the
    * downstream `from_json` decode.
    */
  private[sources] def rangeReader(path: String, from: Long, until: Long,
      fromByte: Long, filters: Seq[Filter] = Nil, file: String = "")(
      toRow: (String, Long) => InternalRow): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val range =
        if (fromByte >= 0) CdcFileSource.openLinesAt(path, from, until, fromByte)
        else CdcFileSource.openLines(path, from, until)
      private val it = range.iterator
      private var cur: (String, Long) = _
      override def next(): Boolean = {
        while (it.hasNext) {
          val c = it.next()
          if (filters.isEmpty || LineFilters.evalAll(filters, c._1, c._2, file)) {
            cur = c
            return true
          }
        }
        false
      }
      override def get(): InternalRow = toRow(cur._1, cur._2)
      override def close(): Unit = range.close()
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcRangePartition]
    rangeReader(p.path, p.from, p.until, p.fromByte, p.filters) { (line, pos) =>
      InternalRow(UTF8String.fromString(line), pos)
    }
  }
}
