package graft.streaming

import java.io.{BufferedInputStream, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket, URI}
import java.nio.charset.StandardCharsets

/** Minimal keep-alive HTTP/1.1 POST client for the delivery hot path.
  *
  * The JDK http client stalls ~40ms per small POST on loopback (headers and
  * body leave in separate TCP segments; Nagle + the peer's delayed ACK
  * serialize them — measured 22 POSTs/sec). This client sets TCP_NODELAY,
  * assembles the entire request into ONE write, and keeps one pooled
  * connection per (thread, host:port) — the right shape for `foreachBatch`
  * partitions, where each task thread streams many posts to few hosts.
  */
object FastHttp {

  private final class Conn(host: String, port: Int) {
    val socket = new Socket()
    socket.setTcpNoDelay(true)
    socket.connect(new InetSocketAddress(host, port), 5000)
    socket.setSoTimeout(10000)
    val out: OutputStream = socket.getOutputStream
    val in: InputStream = new BufferedInputStream(socket.getInputStream)
    def close(): Unit = try socket.close() catch { case _: Exception => }
  }

  private val conns = new ThreadLocal[scala.collection.mutable.HashMap[String, Conn]] {
    override def initialValue() = scala.collection.mutable.HashMap.empty
  }

  /** POST `body` to `url`; returns the status code, or -1 on transport
    * failure (one silent reconnect attempt per call).
    */
  def post(url: String, body: String): Int = {
    val u = URI.create(url)
    val port = if (u.getPort >= 0) u.getPort else 80
    val key = s"${u.getHost}:$port"
    val pool = conns.get()

    def attempt(c: Conn): Int = {
      val payload = body.getBytes(StandardCharsets.UTF_8)
      val head =
        (s"POST ${u.getRawPath} HTTP/1.1\r\n" +
          s"Host: $key\r\n" +
          "Content-Type: application/json\r\n" +
          s"Content-Length: ${payload.length}\r\n" +
          "\r\n").getBytes(StandardCharsets.US_ASCII)
      val req = new Array[Byte](head.length + payload.length)
      System.arraycopy(head, 0, req, 0, head.length)
      System.arraycopy(payload, 0, req, head.length, payload.length)
      c.out.write(req) // one write → one segment → no delayed-ACK stall
      c.out.flush()
      readResponse(c.in)
    }

    def fresh(): Conn = {
      val c = new Conn(u.getHost, port)
      pool.put(key, c)
      c
    }

    try attempt(pool.getOrElse(key, fresh()))
    catch {
      case _: Exception =>
        pool.remove(key).foreach(_.close())
        try attempt(fresh())
        catch {
          case _: Exception =>
            pool.remove(key).foreach(_.close())
            -1
        }
    }
  }

  /** Read one HTTP/1.1 response (status line + headers + Content-Length
    * body), leaving the stream positioned for the next response.
    */
  private def readResponse(in: InputStream): Int = {
    val sb = new StringBuilder
    var prev = 0
    var b = in.read()
    while (b != -1 && !(prev == '\r' && b == '\n' && sb.endsWith("\r\n\r"))) {
      sb.append(b.toChar)
      prev = b
      b = in.read()
    }
    if (b == -1) throw new java.io.EOFException("connection closed mid-response")
    val head = sb.toString()
    val status = head.split(" ", 3)(1).toInt
    val len = "(?i)content-length:\\s*(\\d+)".r.findFirstMatchIn(head)
      .map(_.group(1).toInt).getOrElse(0)
    var remaining = len
    val buf = new Array[Byte](8192)
    while (remaining > 0) {
      val n = in.read(buf, 0, math.min(buf.length, remaining))
      if (n < 0) throw new java.io.EOFException("short body")
      remaining -= n
    }
    status
  }

  /** Close this thread's pooled connections (tests / shutdown). */
  def closeAll(): Unit = {
    conns.get().values.foreach(_.close())
    conns.get().clear()
  }
}
