package graft.sources

import java.nio.ByteBuffer
import java.nio.ByteOrder.LITTLE_ENDIAN

/** A MySQL GTID set — `server_uuid:1-5:7,other_uuid:1-3` — the modern
  * replication position: instead of one `{name, pos}` byte cursor, the
  * replica names every transaction it already has and the master streams
  * only the complement. The reference's canal dependency exposes exactly
  * this dual (position-based and GTID-based tailing); this is the
  * GTID half.
  *
  * Everything here is the PUBLIC protocol surface: the text format
  * (`@@gtid_executed`, inclusive intervals) and the binary encoding
  * carried by `COM_BINLOG_DUMP_GTID` (all little-endian: u64 sid count,
  * then per sid a 16-byte UUID, u64 interval count, and u64
  * start/end pairs with EXCLUSIVE ends — the one place the two formats
  * disagree, handled here so callers never see it).
  *
  * Intervals are kept normalized (sorted, coalesced, inclusive), so
  * `text`/`encode` are deterministic for any construction order.
  */
final case class GtidSet(sids: Map[String, Vector[(Long, Long)]]) {

  def isEmpty: Boolean = sids.isEmpty

  def contains(uuid: String, gno: Long): Boolean =
    sids.getOrElse(uuid.toLowerCase, Vector.empty)
      .exists { case (a, b) => a <= gno && gno <= b }

  /** This set plus one transaction id (normalizing as it goes). */
  def add(uuid: String, gno: Long): GtidSet = {
    val key = uuid.toLowerCase
    GtidSet(sids.updated(key,
      GtidSet.normalize(sids.getOrElse(key, Vector.empty) :+ (gno, gno))))
  }

  /** `@@gtid_executed` text form; sids sorted so the rendering is stable. */
  def text: String =
    sids.toSeq.sortBy(_._1).map { case (sid, ivs) =>
      sid + ":" + ivs.map { case (a, b) => if (a == b) s"$a" else s"$a-$b" }
        .mkString(":")
    }.mkString(",")

  /** The `COM_BINLOG_DUMP_GTID` payload encoding (exclusive ends). */
  def encode: Array[Byte] = {
    val ordered = sids.toSeq.sortBy(_._1)
    val size = 8 + ordered.map { case (_, ivs) => 16 + 8 + ivs.size * 16 }.sum
    val b = ByteBuffer.allocate(size).order(LITTLE_ENDIAN)
    b.putLong(ordered.size.toLong)
    ordered.foreach { case (sid, ivs) =>
      b.put(GtidSet.uuidBytes(sid))
      b.putLong(ivs.size.toLong)
      ivs.foreach { case (a, bEnd) => b.putLong(a).putLong(bEnd + 1) }
    }
    b.array()
  }
}

object GtidSet {

  val Empty: GtidSet = GtidSet(Map.empty)

  /** Parse the text form (inclusive intervals; empty string → empty set). */
  def parse(s: String): GtidSet = {
    if (s == null || s.trim.isEmpty) return Empty
    GtidSet(s.split(',').map(_.trim).filter(_.nonEmpty).map { part =>
      val pieces = part.split(':')
      require(pieces.length >= 2, s"malformed GTID '$part'")
      val ivs = pieces.tail.toVector.map { iv =>
        iv.split('-') match {
          case Array(a) => (a.toLong, a.toLong)
          case Array(a, b) => (a.toLong, b.toLong)
          case _ => throw new IllegalArgumentException(s"malformed interval '$iv'")
        }
      }
      pieces.head.toLowerCase -> normalize(ivs)
    }.toMap)
  }

  /** Decode the binary form (the fake master's side of the conversation —
    * and any tool reading a dump command back).
    */
  def decode(bytes: Array[Byte]): GtidSet = {
    val b = ByteBuffer.wrap(bytes).order(LITTLE_ENDIAN)
    val nSids = b.getLong.toInt
    GtidSet((0 until nSids).map { _ =>
      val sid = new Array[Byte](16)
      b.get(sid)
      val nIvs = b.getLong.toInt
      val ivs = Vector.fill(nIvs) {
        val start = b.getLong; val endExcl = b.getLong
        (start, endExcl - 1)
      }
      uuidText(sid) -> normalize(ivs)
    }.toMap)
  }

  /** Sort + coalesce overlapping/adjacent inclusive intervals. */
  private[sources] def normalize(ivs: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    val sorted = ivs.sortBy(_._1)
    sorted.foldLeft(Vector.empty[(Long, Long)]) { (acc, iv) =>
      acc.lastOption match {
        case Some((a, b)) if iv._1 <= b + 1 => acc.init :+ (a, math.max(b, iv._2))
        case _ => acc :+ iv
      }
    }
  }

  private[sources] def uuidBytes(sid: String): Array[Byte] = {
    val hex = sid.replace("-", "")
    require(hex.length == 32, s"malformed server UUID '$sid'")
    Array.tabulate(16)(i =>
      Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  private[sources] def uuidText(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      sb.append(f"${bytes(i) & 0xff}%02x")
      i += 1
    }
    sb.toString
  }
}

/** A MariaDB GTID position — `domain-server-seq`, comma-separated with at
  * most one entry per replication domain (`@@gtid_slave_pos` form): unlike
  * MySQL's interval sets, MariaDB's position IS the latest sequence per
  * domain, so the set is a map and `contains` is a ≤ check. This is the
  * other half of the reference's `DB_FLAVOR=mysql|mariadb` surface
  * (`/root/reference/main.go:463`): the resume state a MariaDB replica
  * hands the master via `SET @slave_connect_state='…'` before
  * `COM_BINLOG_DUMP` (MariaDB has no separate GTID dump command).
  */
final case class MariaGtidSet(domains: Map[Long, (Long, Long)]) {

  def isEmpty: Boolean = domains.isEmpty

  /** Held iff the domain's recorded sequence has reached `seq` — MariaDB
    * sequences are monotone per domain, so the position subsumes every
    * earlier transaction of that domain.
    */
  def contains(domain: Long, seq: Long): Boolean =
    domains.get(domain).exists(_._2 >= seq)

  /** Advance a domain to (server, seq) if it moves forward. */
  def add(domain: Long, server: Long, seq: Long): MariaGtidSet =
    if (contains(domain, seq)) this
    else MariaGtidSet(domains.updated(domain, (server, seq)))

  /** `@@gtid_slave_pos` text; domains sorted so the rendering is stable. */
  def text: String =
    domains.toSeq.sortBy(_._1)
      .map { case (d, (s, q)) => s"$d-$s-$q" }.mkString(",")
}

object MariaGtidSet {

  val Empty: MariaGtidSet = MariaGtidSet(Map.empty)

  /** Parse the text form (empty string → empty set). */
  def parse(s: String): MariaGtidSet = {
    if (s == null || s.trim.isEmpty) return Empty
    MariaGtidSet(s.split(',').map(_.trim).filter(_.nonEmpty).map { part =>
      part.split('-') match {
        case Array(d, srv, seq) => d.toLong -> (srv.toLong, seq.toLong)
        case _ => throw new IllegalArgumentException(s"malformed MariaDB GTID '$part'")
      }
    }.toMap)
  }
}
