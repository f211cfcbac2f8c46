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
final class RespClient(host: String, port: Int, timeoutMs: Int = 10000,
    soTimeoutMs: Int = 10000) extends AutoCloseable {

  private val socket = new Socket()
  socket.setTcpNoDelay(true)
  socket.connect(new InetSocketAddress(host, port), timeoutMs)
  // 0 = no read deadline — required for a BLPOP that blocks indefinitely
  socket.setSoTimeout(soTimeoutMs)
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
  * `main.go:38`), `RPUSH` of the BARE JSON payload on delivery
  * (`main.go:95`), popped by the drain worker which re-derives the routing
  * group from the payload itself (`extractTableNameFromPayload` +
  * `getGroupForTable`, `main.go:403-406,421-430`). No extra framing: a
  * reference worker drains items this engine pushed and vice versa — the
  * mixed-deployment interop a drop-in replacement owes its user. The
  * `group` the enqueue side already resolved is therefore NOT stored
  * (drain re-resolves it, exactly like the reference), and [[drain]] hands
  * consumers `("", payload)` — [[Sinks.drainQueue]] ignores the group slot
  * and extracts table→group from the payload either way.
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

  private def connect(soTimeoutMs: Int = 10000): RespClient = {
    val conn = new RespClient(host, port, soTimeoutMs = soTimeoutMs)
    // the reference authenticates through its client options
    // (`main.go:347-352`); empty password = the unauthenticated default
    if (password.nonEmpty) conn.command("AUTH", password)
    conn
  }

  override def client(): QueueClient = new QueueClient {
    private var conn: RespClient = _
    override def enqueue(group: String, payload: String): Unit = {
      if (conn == null) conn = connect()
      conn.command("RPUSH", key, payload) // bare payload, main.go:95
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
          case RespStr(payload) => handle("", payload); n += 1
          case _ => done = true
        }
      }
      n
    } finally conn.close()
  }

  /** One BLOCKING pop — the reference worker's exact command
    * (`BLPop(redisCtx, 0, redisQueueKey)`, `main.go:392`): parks the
    * connection server-side until an item lands or `timeoutSec` expires
    * (`0` = block indefinitely, the reference's setting). Reply is a
    * two-element array `[key, value]`, or nil on timeout.
    */
  def blockingPop(timeoutSec: Int): Option[String] = {
    // the socket read deadline must outlast the server-side block
    val so = if (timeoutSec == 0) 0 else timeoutSec * 1000 + 10000
    val conn = connect(soTimeoutMs = so)
    try conn.command("BLPOP", key, timeoutSec.toString) match {
      case RespArr(Vector(_, RespStr(payload))) => Some(payload)
      case _ => None
    } finally conn.close()
  }

  /** The reference's drain-worker loop shape (`main.go:383-419`): block on
    * the list, handle each item as it lands, stop once the queue stays
    * empty for `idleTimeoutSec` (the reference blocks forever; a bounded
    * idle timeout is what makes the worker testable and schedulable).
    * Destructive like the reference — an item popped right before a crash
    * is lost; the non-destructive exactly-once alternative is the
    * [[Sinks.queueStream]] file-source path.
    */
  def drainBlocking(handle: (String, String) => Unit, idleTimeoutSec: Int): Long = {
    val so = if (idleTimeoutSec == 0) 0 else idleTimeoutSec * 1000 + 10000
    val conn = connect(soTimeoutMs = so)
    try {
      var n = 0L
      var done = false
      while (!done) {
        conn.command("BLPOP", key, idleTimeoutSec.toString) match {
          case RespArr(Vector(_, RespStr(payload))) => handle("", payload); n += 1
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
