package graft.sources

import java.nio.file.Paths
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Rotating RAW binlog directory source — the exact shape the reference
  * checkpoints against: `{name, pos}` over `mysql-bin.000001`, `000002`, …
  * (reference `main.go:41-44`), where `pos` is a BYTE position. This is
  * [[CdcLogDirSource]]'s contract transplanted onto the wire format of
  * [[CdcBinlogFileSource]]:
  *
  *  - lexicographic file order IS rotation order; the writer appends only
  *    to the greatest name; a sealed file's trailing partial event
  *    (possible only on writer crash) is ignored — sealed ends are the
  *    byte past the last COMPLETE event, computed once per file;
  *  - only the newest file is tailed incrementally (O(new bytes) per
  *    poll); a partially-appended event is invisible until complete;
  *  - offset = `{"name":<file>,"pos":<byte>}` — byte-for-byte the
  *    position JSON a MySQL client would publish.
  *
  * Schema: `event BINARY, pos BIGINT, file STRING` — ordering across
  * rotations is (file, pos), and `binlog_rotate` events inside the stream
  * carry the same transitions for audit.
  *
  * Usage: `spark.readStream.format("graft.sources.CdcBinlogDirSource")
  *   .option("path", dir).load()`; options `maxEventsPerBatch`,
  * `positionDir` as in the single-file source. Batch reads cover every
  * complete event in the directory.
  */
class CdcBinlogDirSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcBinlogDirSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcBinlogDirTable(properties.get("path"))
}

object CdcBinlogDirSource {
  val schema: StructType = StructType(Seq(
    StructField("event", BinaryType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("file", StringType, nullable = false)))
}

class CdcBinlogDirTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"cdc-binlogdir($dir)"
  override def schema(): StructType = CdcBinlogDirSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters {
      private val maxEvents = Option(options.get("maxEventsPerBatch")).map(_.toLong)
      private val positionDir = Option(options.get("positionDir"))
      private var pushed: Array[Filter] = Array.empty
      // pos-range + file predicates, everything reported residual; a
      // file-only conjunct prunes WHOLE binlog files from the plan —
      // skipping even their one-time end-of-complete-events walk.
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters.filter(LineFilters.supported(_, Set("pos", "file")))
        filters
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def build(): Scan = new Scan {
        private val fs = pushed.toSeq
        private val (fileFs, _) = LineFilters.fileOnly(fs)
        override def readSchema(): StructType = CdcBinlogDirSource.schema
        override def description(): String =
          s"cdc-binlogdir($dir), PushedFilters: ${pushed.mkString("[", ", ", "]")}"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcBinlogDirMicroBatchStream(dir, maxEvents, positionDir, fs)
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            CdcLogDirSource.listLogs(dir)
              .filterNot(LineFilters.prunesFile(fileFs, _))
              .flatMap { f =>
                val path = s"$dir/$f"
                val start = CdcBinlogFileSource.dataStart(path)
                val (_, end) = CdcBinlogFileSource.walkEvents(path, start)
                if (end <= start) None
                else Some(CdcBinlogDirRangePartition(dir, f, start, end, fs): InputPartition)
              }.toArray
          override def createReaderFactory(): PartitionReaderFactory =
            CdcBinlogDirReaderFactory
        }
      }
    }
}

/** One ordered partition per file in the batch range — sealed files read in
  * parallel, each a seek + sequential event scan.
  */
class CdcBinlogDirMicroBatchStream(dir: String, maxEventsPerBatch: Option[Long] = None,
    positionDir: Option[String] = None, filters: Seq[Filter] = Nil)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // File-only conjuncts prune whole files from streaming plans below;
  // offset bookkeeping stays on the UNFILTERED stream.
  private val fileOnlyFilters = LineFilters.fileOnly(filters)._1

  private val positions: Option[DualPositionStore] = positionDir.map { d =>
    val base = Paths.get(d)
    new DualPositionStore(base.resolve("position.json"),
      base.resolve("position.backup.json"))
  }

  // Sealed files' end byte (past the last complete event) — computed once;
  // lazily rebuilt after driver restart. The newest file gets the
  // incremental tail.
  private val sealedEnds = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private var current: Option[(String, CdcBinlogFileSource.Tail)] = None
  private var scannedSealed = 0L

  /** Total bytes ever scanned for offset discovery (test surface). */
  def bytesScanned: Long = synchronized {
    scannedSealed + current.map(_._2.bytesScanned).getOrElse(0L)
  }

  private def sealedEnd(name: String): Long = synchronized {
    sealedEnds.computeIfAbsent(name, { n =>
      val path = s"$dir/$n"
      val start = CdcBinlogFileSource.dataStart(path)
      val (_, end) = CdcBinlogFileSource.walkEvents(path, start)
      scannedSealed += end - start
      end
    })
  }

  /** Data start of `name` (past the magic) — where a fresh range begins. */
  private def fileStart(name: String): Long =
    CdcBinlogFileSource.dataStart(s"$dir/$name")

  private def pollEnd(): CdcDirOffset = synchronized {
    val files = CdcLogDirSource.listLogs(dir)
    if (files.isEmpty) return CdcDirOffset("", 0L)
    val newest = files.last
    current match {
      case Some((name, tail)) if name == newest =>
        val (_, byte) = tail.poll()
        CdcDirOffset(name, byte)
      case cur =>
        // rotation: seal the previously-current file at its final end
        cur.foreach { case (name, tail) =>
          val (_, byte) = tail.poll()
          scannedSealed += tail.bytesScanned
          sealedEnds.put(name, byte)
        }
        val tail = new CdcBinlogFileSource.Tail(s"$dir/$newest")
        current = Some((newest, tail))
        val (_, byte) = tail.poll()
        CdcDirOffset(newest, byte)
    }
  }

  private var pinnedEnd: Option[CdcDirOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = pinnedEnd = Some(pollEnd())

  override def initialOffset(): Offset = CdcDirOffset("", 0L)
  override def latestOffset(): Offset = pinnedEnd.getOrElse(pollEnd())

  /** Cap a backlog drain at `maxRows` complete events, walking file
    * boundaries by header (seek + O(batch) per capped batch).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val end = latestOffset().asInstanceOf[CdcDirOffset]
    val s = start.asInstanceOf[CdcDirOffset]
    limit match {
      case m: ReadMaxRows => cappedEnd(s, end, m.maxRows())
      case _ => end
    }
  }

  private def cappedEnd(start: CdcDirOffset, end: CdcDirOffset, maxRows: Long): CdcDirOffset = {
    if (end.name.isEmpty) return end
    var remaining = maxRows
    val files = CdcLogDirSource.listLogs(dir)
      .filter(f => (start.name.isEmpty || f >= start.name) && f <= end.name)
    var fromByte = if (files.headOption.contains(start.name)) start.pos else -1L
    for (f <- files) {
      val from = if (fromByte >= 0) fromByte else fileStart(f)
      val fileEnd = if (f == end.name) end.pos else sealedEnd(f)
      if (from < fileEnd) {
        val (n, capped) =
          CdcBinlogFileSource.walkEvents(s"$dir/$f", from, remaining)
        if (n >= remaining && capped < fileEnd) return CdcDirOffset(f, capped)
        remaining -= n
      }
      fromByte = -1L
    }
    end
  }

  override def getDefaultReadLimit: ReadLimit =
    maxEventsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
  override def reportLatestOffset(): Offset = latestOffset()
  override def deserializeOffset(json: String): Offset =
    CdcDirOffset.parse(json)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json"))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcDirOffset]
    val e = end.asInstanceOf[CdcDirOffset]
    if (e.name.isEmpty || !s.isBefore(e)) return Array.empty
    val files = CdcLogDirSource.listLogs(dir)
      .filter(f => (s.name.isEmpty || f >= s.name) && f <= e.name)
      .filterNot(LineFilters.prunesFile(fileOnlyFilters, _))
    files.flatMap { f =>
      val from = if (f == s.name) s.pos else fileStart(f)
      val until = if (f == e.name) e.pos else sealedEnd(f)
      if (until <= from) None
      else Some(CdcBinlogDirRangePartition(dir, f, from, until, filters): InputPartition)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = CdcBinlogDirReaderFactory
  override def commit(end: Offset): Unit =
    positions.foreach { p =>
      // Full {name, pos} — byte positions reset per file, so the name is
      // load-bearing after a rotation (reference checkpoints both,
      // main.go:41-44); loadDir restores by (name, pos) rotation order.
      p.saveDir(end.asInstanceOf[CdcDirOffset])
    }
  override def stop(): Unit = ()
}

final case class CdcBinlogDirRangePartition(dir: String, file: String,
    fromByte: Long, untilByte: Long, filters: Seq[Filter] = Nil) extends InputPartition

object CdcBinlogDirReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcBinlogDirRangePartition]
    val fileName = UTF8String.fromString(p.file)
    new PartitionReader[InternalRow] {
      private val range = new CdcBinlogFileSource.EventRange(
        s"${p.dir}/${p.file}", p.fromByte, p.untilByte)
      private val it = range.iterator
      private var cur: (Array[Byte], Long) = _
      override def next(): Boolean = {
        while (it.hasNext) {
          val c = it.next()
          if (p.filters.isEmpty || LineFilters.evalAll(p.filters, "", c._2, p.file)) {
            cur = c
            return true
          }
        }
        false
      }
      override def get(): InternalRow = InternalRow(cur._1, cur._2, fileName)
      override def close(): Unit = range.close()
    }
  }
}
