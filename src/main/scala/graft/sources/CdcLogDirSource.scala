package graft.sources

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

/** Rotating change-log directory source — the faithful analog of the
  * reference's binlog position, which is `{name, pos}` over a ROTATING file
  * set (`mysql-bin.000001`, `000002`, …; reference `main.go:41-44`), not a
  * single file. Contract (binlog semantics):
  *
  *  - files rotate by name: lexicographic order IS rotation order, the
  *    writer only appends to the lexicographically greatest file, and
  *    rotation happens on a record boundary (a sealed file's unterminated
  *    trailing bytes, possible only on writer crash, are ignored);
  *  - sealed files are immutable — each is line-counted exactly once and
  *    never re-scanned; only the newest file is tailed incrementally
  *    (O(new bytes) per poll, like [[CdcFileSource.Tail]]).
  *
  * Offset = `{"name":<file>,"pos":N,"bytePos":B}` — line N of file `name`,
  * exactly the reference's position JSON plus the seek hint. Schema adds a
  * `file` column so downstream ordering is (file, pos) across rotations.
  *
  * Usage: `spark.readStream.format("graft.sources.CdcLogDirSource")
  *   .option("path", dir).load()`; batch reads of the whole directory too.
  */
class CdcLogDirSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcLogDirSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcLogDirTable(properties.get("path"))
}

object CdcLogDirSource {
  val schema: StructType = StructType(Seq(
    StructField("line", StringType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("file", StringType, nullable = false)))

  /** Regular files of the directory in rotation (lexicographic) order. */
  def listLogs(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .map(_.getFileName.toString)
        .filterNot(_.startsWith(".")) // temp/hidden files are not logs
        .toVector.sorted
      finally s.close()
    }
  }
}

final case class CdcDirOffset(name: String, pos: Long, bytePos: Long = -1L)
    extends Offset {
  override def json(): String = {
    val n = CdcDirOffset.escape(name)
    if (bytePos >= 0) s"""{"name":"$n","pos":$pos,"bytePos":$bytePos}"""
    else s"""{"name":"$n","pos":$pos}"""
  }

  /** Rotation order: by file name, then line. */
  def isBefore(o: CdcDirOffset): Boolean =
    name < o.name || (name == o.name && pos < o.pos)
}

object CdcDirOffset {
  // File names are arbitrary POSIX strings — a quote or backslash in one
  // must survive the checkpoint JSON round trip or a restart resumes from
  // a truncated name (re-reading or skipping whole files).
  private[sources] def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  def parse(json: String): Option[CdcDirOffset] = {
    val name = """"name"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json)
      .map(m => unescape(m.group(1)))
    val pos = """"pos"\s*:\s*(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
    val bytePos = """"bytePos"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(-1L)
    for (n <- name; p <- pos) yield CdcDirOffset(n, p, bytePos)
  }
}

class CdcLogDirTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"cdc-logdir($dir)"
  override def schema(): StructType = CdcLogDirSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters {
      private val maxLines = Option(options.get("maxLinesPerBatch")).map(_.toLong)
      private var pushed: Array[Filter] = Array.empty
      // Same contract as CdcFileTable: accept raw-column predicates for
      // source-side skipping, keep everything residual. A filter on `file`
      // alone additionally prunes WHOLE log files from the plan — the
      // rotating source's partition pruning.
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters.filter(LineFilters.supported(_, Set("line", "pos", "file")))
        filters
      }
      override def pushedFilters(): Array[Filter] = pushed
      private val guards = LineFilters.guardFilters(k => Option(options.get(k)))
      override def build(): Scan = new Scan {
        private val fs = pushed.toSeq ++ guards
        private val (fileFs, _) = LineFilters.fileOnly(fs)
        override def readSchema(): StructType = CdcLogDirSource.schema
        override def description(): String =
          s"cdc-logdir($dir), PushedFilters: ${pushed.mkString("[", ", ", "]")}" +
            (if (guards.nonEmpty) s", LineGuards: ${guards.mkString("[", ", ", "]")}" else "")
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcLogDirMicroBatchStream(dir, maxLines, fs)
        override def toBatch: Batch = new Batch {
          // Whole-file batch reads need no line counts: an unbounded range
          // lets each executor read its file to EOF, so the driver never
          // pre-scans the data just to plan (batch semantics match
          // CdcFileSource's: the file at rest, trailing partial included).
          override def planInputPartitions(): Array[InputPartition] =
            CdcLogDirSource.listLogs(dir)
              .filterNot(LineFilters.prunesFile(fileFs, _))
              .map { f =>
                CdcDirRangePartition(dir, f, 0L, Long.MaxValue, 0L, fs): InputPartition
              }.toArray
          override def createReaderFactory(): PartitionReaderFactory =
            CdcDirReaderFactory
        }
      }
    }
}

/** One ordered partition per log file in the batch range — sealed files
  * read in parallel, each a seek + sequential scan.
  */
class CdcLogDirMicroBatchStream(dir: String, maxLinesPerBatch: Option[Long] = None,
    filters: Seq[Filter] = Nil)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // File-only conjuncts prune whole files from batch plans below — and for
  // sealed files, skip even the one-time line count, since no row of a
  // pruned file can survive. Offset bookkeeping (pollEnd/cappedEnd) stays
  // on the UNFILTERED stream: positions must not depend on the filter set.
  private val fileOnlyFilters = LineFilters.fileOnly(filters)._1

  // Terminated-line counts of SEALED (no-longer-newest) files — each
  // counted exactly once; survives only for this stream instance, and is
  // lazily rebuilt by sealedCount() after a driver restart.
  private val sealedCounts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  // The newest file's incremental tail.
  private var current: Option[(String, CdcFileSource.Tail)] = None
  private var scannedSealed = 0L

  /** Total bytes ever scanned for offset discovery (test surface). */
  def bytesScanned: Long = synchronized {
    scannedSealed + current.map(_._2.bytesScanned).getOrElse(0L)
  }

  // Synchronized like pollEnd: planInputPartitions/cappedEnd also call
  // this, and scannedSealed/current must not tear against a concurrent
  // progress-reporting poll.
  private def sealedCount(name: String): Long = synchronized {
    sealedCounts.computeIfAbsent(name, { n =>
      val t = new CdcFileSource.Tail(s"$dir/$n")
      val (lines, _) = t.poll()
      scannedSealed += t.bytesScanned
      lines
    })
  }

  private def pollEnd(): CdcDirOffset = synchronized {
    val files = CdcLogDirSource.listLogs(dir)
    if (files.isEmpty) return CdcDirOffset("", 0L, 0L)
    val newest = files.last
    current match {
      case Some((name, tail)) if name == newest =>
        val (pos, byte) = tail.poll()
        CdcDirOffset(name, pos, byte)
      case cur =>
        // rotation: seal the previously-current file at its final count
        cur.foreach { case (name, tail) =>
          val (lines, _) = tail.poll()
          scannedSealed += tail.bytesScanned
          sealedCounts.put(name, lines)
        }
        // files that appeared and were already rotated past: seal lazily
        val tail = new CdcFileSource.Tail(s"$dir/$newest")
        current = Some((newest, tail))
        val (pos, byte) = tail.poll()
        CdcDirOffset(newest, pos, byte)
    }
  }

  private var pinnedEnd: Option[CdcDirOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = pinnedEnd = Some(pollEnd())

  override def initialOffset(): Offset = CdcDirOffset("", 0L, 0L)
  override def latestOffset(): Offset = pinnedEnd.getOrElse(pollEnd())

  /** Cap the batch at `maxRows` lines, walking file boundaries; the capped
    * offset keeps a byte position so the drain of a deep backlog is a seek
    * per batch, never a cumulative line-skip.
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
      .filter(f => f >= start.name && f <= end.name)
    var fromPos = if (files.headOption.contains(start.name)) start.pos else 0L
    var fromByte = if (files.headOption.contains(start.name)) start.bytePos else 0L
    for (f <- files) {
      val fileEnd = if (f == end.name) end.pos else sealedCount(f)
      val avail = fileEnd - fromPos
      if (avail >= remaining) {
        val byte =
          if (remaining == avail && f == end.name && end.bytePos >= 0) end.bytePos
          else if (fromByte >= 0)
            CdcFileSource.byteAfterNewlines(s"$dir/$f", fromByte, remaining)
          else -1L
        return CdcDirOffset(f, fromPos + remaining, byte)
      }
      remaining -= avail
      fromPos = 0L
      fromByte = 0L
    }
    end
  }

  override def getDefaultReadLimit: ReadLimit =
    maxLinesPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
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
      val from = if (f == s.name) s.pos else 0L
      val fromByte = if (f == s.name) s.bytePos else 0L
      val until = if (f == e.name) e.pos else sealedCount(f)
      if (until <= from) None
      else Some(CdcDirRangePartition(dir, f, from, until, fromByte, filters): InputPartition)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = CdcDirReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class CdcDirRangePartition(dir: String, file: String, from: Long,
    until: Long, fromByte: Long = -1L, filters: Seq[Filter] = Nil)
    extends InputPartition

object CdcDirReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcDirRangePartition]
    val fileName = UTF8String.fromString(p.file)
    CdcReaderFactory.rangeReader(s"${p.dir}/${p.file}", p.from, p.until, p.fromByte,
        p.filters, p.file) {
      (line, pos) => InternalRow(UTF8String.fromString(line), pos, fileName)
    }
  }
}
