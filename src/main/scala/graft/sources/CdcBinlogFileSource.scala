package graft.sources

import java.io.{BufferedInputStream, InputStream}
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.BinlogWire

/** DataSource V2 micro-batch source tailing an append-only RAW BINLOG file —
  * the wire-format sibling of [[CdcFileSource]]: where that source frames by
  * '\n', this one frames by the MySQL binlog v4 `event_size` field
  * ([[graft.functions.BinlogWire]]), so the bytes a real server writes (or a
  * `mysqlbinlog --read-from-remote-server --raw` archiver mirrors) stream
  * straight into the engine with no intermediate JSONL hop. Together with
  * the `binlog_header`/`binlog_rotate` decode expressions this leaves ONLY
  * the live replication-protocol client between the engine and the
  * reference's canal tail (`main.go:459-485`).
  *
  * Schema: `event BINARY, pos BIGINT` — `pos` is the event's starting BYTE
  * offset, i.e. exactly the `pos` of the reference's `{name, pos}` position
  * JSON (`main.go:41-44`), which is a byte position in MySQL too. Decode
  * happens downstream (`binlog_header(event)`), mirroring how the line
  * source defers JSON parsing to `from_json`.
  *
  * Torn-write safety mirrors the line source's terminated-line contract:
  * ONLY complete events (header + full `event_size` bytes present) are
  * offered as offsets — a partially-appended event is invisible until its
  * last byte lands, and offset boundaries are by construction event
  * boundaries. Offset discovery is O(new bytes) per poll (it reads the
  * 19-byte header per new event and SKIPS payloads), and the reader seeks
  * — a long tail never re-scans the file.
  *
  * Usage: `spark.readStream.format("graft.sources.CdcBinlogFileSource")
  *   .option("path", file).load()`; options `maxEventsPerBatch` (admission
  * control) and `positionDir` (dual-written position mirror,
  * [[DualPositionStore]]) as in the line source. Batch reads of the whole
  * log are supported with the same schema.
  */
class CdcBinlogFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcBinlogFileSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcBinlogFileTable(properties.get("path"))
}

object CdcBinlogFileSource {
  val schema: StructType = StructType(Seq(
    StructField("event", BinaryType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  private val Magic = Array[Byte](0xfe.toByte, 'b', 'i', 'n')

  private def skipFully(in: InputStream, n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() >= 0) left -= 1
      else return false
    }
    true
  }

  /** Read exactly `n` bytes; null if the stream ends first. */
  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) return null
      off += r
    }
    buf
  }

  private def eventSize(header: Array[Byte]): Long =
    (header(9) & 0xffL) | ((header(10) & 0xffL) << 8) |
      ((header(11) & 0xffL) << 16) | ((header(12) & 0xffL) << 24)

  /** Byte offset where event data starts: past the magic when present. */
  def dataStart(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p) || Files.size(p) < 4) return 0L
    val in = Files.newInputStream(p)
    try {
      val head = readFully(in, 4)
      if (head != null && head.sameElements(Magic)) 4L else 0L
    } finally in.close()
  }

  /** Walk complete events from `fromByte`, returning (count, byte offset
    * past the last COMPLETE event, at most `max` events). Reads headers,
    * skips payloads — O(new events), not O(new payload bytes) of copying.
    */
  def walkEvents(path: String, fromByte: Long, max: Long = Long.MaxValue): (Long, Long) = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return (0L, fromByte)
    val size = Files.size(p)
    if (size <= fromByte) return (0L, fromByte)
    val in = new BufferedInputStream(Files.newInputStream(p))
    try {
      if (!skipFully(in, fromByte)) return (0L, fromByte)
      var off = fromByte
      var n = 0L
      var done = false
      while (!done && n < max) {
        if (size - off < BinlogWire.HeaderLen) done = true
        else {
          val header = readFully(in, BinlogWire.HeaderLen)
          if (header == null) done = true
          else {
            val es = eventSize(header)
            // A size smaller than a header is corruption, not a partial
            // write — stop offering offsets past it rather than spinning.
            if (es < BinlogWire.HeaderLen || off + es > size) done = true
            else if (!skipFully(in, es - BinlogWire.HeaderLen)) done = true
            else { off += es; n += 1 }
          }
        }
      }
      (n, off)
    } finally in.close()
  }

  /** Lazy reader over events with byte positions in [fromByte, untilByte) —
    * carries its own close handle, like [[CdcFileSource.LineRange]].
    */
  final class EventRange(path: String, fromByte: Long, untilByte: Long)
      extends AutoCloseable {
    private val in = new BufferedInputStream(Files.newInputStream(Paths.get(path)))
    private val seeked = skipFully(in, fromByte)
    val iterator: Iterator[(Array[Byte], Long)] = new Iterator[(Array[Byte], Long)] {
      private var off = fromByte
      override def hasNext: Boolean = seeked && off < untilByte
      override def next(): (Array[Byte], Long) = {
        // Offset discovery proved these bytes existed, but the file can
        // shrink (truncation, rotation mishap) between planning and read —
        // fail with the file and byte range, not an NPE from readFully.
        def torn(what: String): Nothing = throw new java.io.IOException(
          s"$path: $what at byte $off (expected events through byte $untilByte); " +
            "file truncated since offsets were planned?")
        val header = readFully(in, BinlogWire.HeaderLen)
        if (header == null) torn("truncated event header")
        val es = eventSize(header).toInt
        if (es < BinlogWire.HeaderLen || off + es > untilByte)
          torn(s"corrupt event_size $es")
        val body = readFully(in, es - BinlogWire.HeaderLen)
        if (body == null) torn(s"truncated event body ($es-byte event)")
        val ev = new Array[Byte](es)
        System.arraycopy(header, 0, ev, 0, BinlogWire.HeaderLen)
        System.arraycopy(body, 0, ev, BinlogWire.HeaderLen, es - BinlogWire.HeaderLen)
        val at = off
        off += es
        (ev, at)
      }
    }
    override def close(): Unit = in.close()
  }

  /** Eagerly materialized range — test/utility surface over [[EventRange]]. */
  def readEvents(path: String, fromByte: Long, untilByte: Long): Seq[(Array[Byte], Long)] = {
    val r = new EventRange(path, fromByte, untilByte)
    try r.iterator.toVector finally r.close()
  }

  /** Incremental tail: byte position past the last complete event, advanced
    * by scanning only bytes appended since the previous poll (header reads +
    * payload skips). Truncation resets, as in [[CdcFileSource.Tail]].
    */
  final class Tail(path: String) {
    private var end = -1L    // byte past last complete event; -1 = magic unprobed
    private var events = 0L
    private var scanned = 0L // bytes advanced over, ever (test/diagnostic surface)

    def bytesScanned: Long = scanned

    def poll(): (Long, Long) = synchronized {
      val p = Paths.get(path)
      if (!Files.exists(p)) return (0L, 0L)
      if (end < 0 || Files.size(p) < end) { end = dataStart(path); events = 0L }
      val (n, newEnd) = walkEvents(path, end)
      events += n
      scanned += newEnd - end
      end = newEnd
      (events, end)
    }
  }
}

class CdcBinlogFileTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"cdc-binlog($path)"
  override def schema(): StructType = CdcBinlogFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters {
      private val maxEvents = Option(options.get("maxEventsPerBatch")).map(_.toLong)
      private val positionDir = Option(options.get("positionDir"))
      private var pushed: Array[Filter] = Array.empty
      // Same contract as the line sources: accept pos-range predicates for
      // source-side event skipping (an archived-binlog "resume from
      // position" scan), report everything residual — pushdown only drops
      // events the query would drop anyway. `line` isn't a raw column here
      // (the payload is binary), so only pos predicates qualify.
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters.filter(LineFilters.supported(_, Set("pos")))
        filters
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def build(): Scan = new Scan {
        private val fs = pushed.toSeq
        override def readSchema(): StructType = CdcBinlogFileSource.schema
        override def description(): String =
          s"cdc-binlog($path), PushedFilters: ${pushed.mkString("[", ", ", "]")}"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcBinlogMicroBatchStream(path, maxEvents, positionDir, fs)
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            val start = CdcBinlogFileSource.dataStart(path)
            val (_, end) = CdcBinlogFileSource.walkEvents(path, start)
            Array(CdcBinlogRangePartition(path, start, end, fs))
          }
          override def createReaderFactory(): PartitionReaderFactory =
            CdcBinlogReaderFactory
        }
      }
    }
}

/** Offsets are byte positions past the last complete event (MySQL's own
  * `log_pos` unit). Served as a single ordered partition — the binlog is
  * serial per server; parallelism comes from the downstream shuffle.
  */
class CdcBinlogMicroBatchStream(path: String, maxEventsPerBatch: Option[Long] = None,
    positionDir: Option[String] = None, filters: Seq[Filter] = Nil)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val positions: Option[DualPositionStore] = positionDir.map { d =>
    val base = Paths.get(d)
    new DualPositionStore(base.resolve("position.json"),
      base.resolve("position.backup.json"))
  }

  private val tail = new CdcBinlogFileSource.Tail(path)

  private var pinnedEnd: Option[CdcOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    val (_, byte) = tail.poll()
    pinnedEnd = Some(CdcOffset(byte, byte))
  }

  // pos doubles as the byte position — initial offset is the data start
  // (past the magic), so a checkpointed first offset equals what a MySQL
  // client would publish for an empty log (position 4).
  override def initialOffset(): Offset = {
    val s = CdcBinlogFileSource.dataStart(path)
    CdcOffset(s, s)
  }
  override def latestOffset(): Offset =
    pinnedEnd.getOrElse { val (_, byte) = tail.poll(); CdcOffset(byte, byte) }

  /** Admission control: cap a backlog drain at `maxEventsPerBatch` complete
    * events by walking headers from the start offset — each capped batch is
    * a seek + O(batch) header walk.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val end = latestOffset().asInstanceOf[CdcOffset]
    val s = start.asInstanceOf[CdcOffset]
    limit match {
      case m: ReadMaxRows =>
        val (n, capped) = CdcBinlogFileSource.walkEvents(path, s.pos, m.maxRows())
        if (n >= m.maxRows() && capped < end.pos) CdcOffset(capped, capped) else end
      case _ => end
    }
  }
  override def getDefaultReadLimit: ReadLimit =
    maxEventsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
  override def reportLatestOffset(): Offset = latestOffset()
  override def deserializeOffset(json: String): Offset =
    CdcOffset.parse(json)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json"))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[CdcOffset], end.asInstanceOf[CdcOffset])
    if (e.pos <= s.pos) Array.empty
    // Offsets always cover the UNFILTERED byte range (positions must stay
    // stable under any filter set); only row emission is filtered.
    else Array(CdcBinlogRangePartition(path, s.pos, e.pos, filters))
  }
  override def createReaderFactory(): PartitionReaderFactory = CdcBinlogReaderFactory
  override def commit(end: Offset): Unit =
    positions.foreach(_.save(end.asInstanceOf[CdcOffset]))
  override def stop(): Unit = ()
}

final case class CdcBinlogRangePartition(path: String, fromByte: Long, untilByte: Long,
    filters: Seq[Filter] = Nil) extends InputPartition

object CdcBinlogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcBinlogRangePartition]
    new PartitionReader[InternalRow] {
      private val range =
        new CdcBinlogFileSource.EventRange(p.path, p.fromByte, p.untilByte)
      private val it = range.iterator
      private var cur: (Array[Byte], Long) = _
      override def next(): Boolean = {
        while (it.hasNext) {
          val c = it.next()
          if (p.filters.isEmpty || LineFilters.evalAll(p.filters, "", c._2, "")) {
            cur = c
            return true
          }
        }
        false
      }
      override def get(): InternalRow = InternalRow(cur._1, cur._2)
      override def close(): Unit = range.close()
    }
  }
}
