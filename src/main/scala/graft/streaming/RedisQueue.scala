package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal RESP (REdis Serialization Protocol) client — the reference's
  * queue is LITERALLY a Redis list (`RPush` onto `cdc_events`,
  * `/root/reference/main.go:38,95`; the drain worker pops it,
  * `main.go:383-419`), so a drop-in replacement user needs the engine to
  * speak RESP, not only the file-backed analog. Everything here is the
  * public protocol (redis.io/docs/reference/protocol-spec): commands are
  * arrays of bulk strings, replies are simple strings (`+`), errors
  * (`-`), integers (`:`), bulk strings (`$`, length-prefixed — binary
  * safe, so JSON payloads with any bytes round-trip), and arrays (`*`).
  *
  * One client per partition task / drain worker — the same
  * connection-per-worker shape as [[FastHttp]]'s pooling; RESP pipelining
  * is unnecessary at the queue's batch sizes.
  */
final class RespClient(host: String, port: Int, timeoutMs: Int = 10000)
    extends AutoCloseable {

  private val socket = new Socket()
  socket.setTcpNoDelay(true)
  socket.connect(new InetSocketAddress(host, port), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val in = new BufferedInputStream(socket.getInputStream)
  private val out = new BufferedOutputStream(socket.getOutputStream)

  /** Send one command, read one reply. Throws on `-ERR` replies and
    * protocol violations — queue delivery treats any of it as the sink
    * being down (at-least-once handles the retry).
    */
  def command(args: String*): RespReply = {
    out.write(s"*${args.size}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      val bytes = a.getBytes(UTF_8)
      out.write(s"$$${bytes.length}\r\n".getBytes(UTF_8))
      out.write(bytes)
      out.write('\r'); out.write('\n')
    }
    out.flush()
    readReply() match {
      case RespErr(msg) => throw new IOException(s"redis error: $msg")
      case r => r
    }
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var b = in.read()
    while (b != '\r') {
      if (b < 0) throw new EOFException("connection closed mid-reply")
      sb.append(b.toChar)
      b = in.read()
    }
    if (in.read() != '\n') throw new IOException("malformed RESP line terminator")
    sb.toString()
  }

  private def readBulk(len: Int): Array[Byte] = {
    val buf = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val r = in.read(buf, off, len - off)
      if (r < 0) throw new EOFException("connection closed mid-bulk")
      off += r
    }
    if (in.read() != '\r' || in.read() != '\n')
      throw new IOException("malformed RESP bulk terminator")
    buf
  }

  private def readReply(): RespReply = (in.read(): @unchecked) match {
    case '+' => RespStr(readLine())
    case '-' => RespErr(readLine())
    case ':' => RespInt(readLine().toLong)
    case '$' =>
      val len = readLine().toInt
      if (len < 0) RespNil else RespStr(new String(readBulk(len), UTF_8))
    case '*' =>
      val n = readLine().toInt
      if (n < 0) RespNil else RespArr(Vector.fill(n)(readReply()))
    case -1 => throw new EOFException("connection closed")
    case other => throw new IOException(s"unexpected RESP type byte $other")
  }

  override def close(): Unit = {
    try socket.close() catch { case _: IOException => () }
  }
}

sealed trait RespReply
case object RespNil extends RespReply
final case class RespStr(value: String) extends RespReply
final case class RespInt(value: Long) extends RespReply
final case class RespErr(message: String) extends RespReply
final case class RespArr(items: Vector[RespReply]) extends RespReply

/** The reference's queue VERBATIM: one Redis list (`cdc_events`,
  * `main.go:38`), `RPUSH` on delivery (`main.go:95`), popped by the drain
  * worker (`main.go:383-419`). Items frame as `group \t payload` — the
  * same unambiguous framing [[FileQueue]] uses (payloads are single-line
  * JSON).
  *
  * Durability semantics match the reference, not [[FileQueue]]: an RPUSH
  * is visible immediately, so a failed partition task's retry surfaces as
  * at-least-once duplicates (the delivery contract already tolerates
  * them) rather than being unpublished — Redis has no cross-connection
  * atomic multi-push segment. That is exactly the reference's behavior on
  * a mid-batch crash.
  */
final case class RedisQueue(host: String, port: Int,
    key: String = "cdc_events", password: String = "") extends DurableQueue {

  private def connect(): RespClient = {
    val conn = new RespClient(host, port)
    // the reference authenticates through its client options
    // (`main.go:347-352`); empty password = the unauthenticated default
    if (password.nonEmpty) conn.command("AUTH", password)
    conn
  }

  override def client(): QueueClient = new QueueClient {
    private var conn: RespClient = _
    override def enqueue(group: String, payload: String): Unit = {
      if (conn == null) conn = connect()
      conn.command("RPUSH", key, group + "\t" + payload)
      ()
    }
    override def close(): Unit = if (conn != null) conn.close()
    override def abort(): Unit = if (conn != null) conn.close()
  }

  override def drain(handle: (String, String) => Unit): Long = {
    val conn = connect()
    try {
      var n = 0L
      var done = false
      while (!done) {
        conn.command("LPOP", key) match {
          case RespStr(item) =>
            val tab = item.indexOf('\t')
            if (tab >= 0) { handle(item.substring(0, tab), item.substring(tab + 1)); n += 1 }
          case _ => done = true
        }
      }
      n
    } finally conn.close()
  }

  override def pending: Long = {
    val conn = connect()
    try conn.command("LLEN", key) match {
      case RespInt(n) => n
      case _ => 0L
    } finally conn.close()
  }
}

/** The reference's OTHER Redis surface: the binlog position checkpointed
  * under `binlog_position` via plain GET/SET (`main.go:37,260-306`). Pairs
  * with `sources/DualPositionStore` as the remote half of the dual-write —
  * store the same JSON the file mirror holds; a failed save returns false
  * (degraded mode: the file copy carries on, like the reference when Redis
  * is down, `main.go:354-360`).
  */
final case class RedisPositionStore(host: String, port: Int,
    key: String = "binlog_position", password: String = "") {

  private def connect(): RespClient = {
    val conn = new RespClient(host, port)
    if (password.nonEmpty) conn.command("AUTH", password)
    conn
  }

  def save(json: String): Boolean =
    try {
      val conn = connect()
      try { conn.command("SET", key, json); true } finally conn.close()
    } catch { case _: java.io.IOException => false }

  def load(): Option[String] =
    try {
      val conn = connect()
      try conn.command("GET", key) match {
        case RespStr(v) => Some(v)
        case _ => None
      } finally conn.close()
    } catch { case _: java.io.IOException => None }
}
