package graft.streaming

import java.io.BufferedInputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, Executors}

/** The reference's debug sink (reference `logger/logger.go:11-32`) as an
  * in-process component: an HTTP server that accepts any request, records
  * method/path/body, and replies `{"status":"ok"}`. Used as the dev-loop
  * delivery target and as the Tier C test fixture (FIXTURES.md §4).
  *
  * Hand-rolled over sockets rather than com.sun.net.httpserver: that server
  * writes response headers and body as separate TCP segments, and Nagle +
  * the peer's delayed ACK stall every keep-alive request ~40ms (measured
  * 22 req/s from ANY client). Here: TCP_NODELAY + the whole response in one
  * write → wire-speed on loopback.
  */
final class DebugSink {
  final case class Captured(method: String, path: String, body: String)

  val captured: ConcurrentLinkedQueue[Captured] = new ConcurrentLinkedQueue()
  @volatile var respondStatus: Int = 200 // set 500 to exercise hazard H4
  @volatile private var running = true

  private val server = new ServerSocket(0, 256, InetAddress.getByName("127.0.0.1"))
  private val pool = Executors.newCachedThreadPool()

  private def statusLine(code: Int): String = code match {
    case 200 => "200 OK"
    case 500 => "500 Internal Server Error"
    case c => s"$c Status"
  }

  private def handle(sock: Socket): Unit = {
    try {
      sock.setTcpNoDelay(true)
      sock.setSoTimeout(30000)
      val in = new BufferedInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      var keepAlive = true
      while (keepAlive && running) {
        // read one request: header block, then Content-Length body bytes
        val head = new StringBuilder
        var prev = 0
        var b = in.read()
        if (b == -1) return
        while (b != -1 && !(prev == '\r' && b == '\n' && head.endsWith("\r\n\r"))) {
          head.append(b.toChar)
          prev = b
          b = in.read()
        }
        if (b == -1) return
        val headStr = head.toString()
        val reqLine = headStr.takeWhile(_ != '\r').split(" ")
        val len = "(?i)content-length:\\s*(\\d+)".r.findFirstMatchIn(headStr)
          .map(_.group(1).toInt).getOrElse(0)
        val body = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val n = in.read(body, off, len - off)
          if (n < 0) return
          off += n
        }
        keepAlive = !"(?i)connection:\\s*close".r.findFirstIn(headStr).isDefined
        captured.add(Captured(reqLine(0), reqLine(1),
          new String(body, StandardCharsets.UTF_8)))

        val resp = """{"status":"ok"}""".getBytes(StandardCharsets.UTF_8)
        val full =
          (s"HTTP/1.1 ${statusLine(respondStatus)}\r\n" +
            "Content-Type: application/json\r\n" +
            s"Content-Length: ${resp.length}\r\n" +
            "\r\n").getBytes(StandardCharsets.US_ASCII) ++ resp
        out.write(full) // one write → no Nagle/delayed-ACK stall
        out.flush()
      }
    } catch {
      case _: Exception => // connection reset / timeout — drop it
    } finally {
      try sock.close() catch { case _: Exception => }
    }
  }

  pool.execute(() => {
    while (running) {
      try {
        val s = server.accept()
        pool.execute(() => handle(s))
      } catch {
        case _: Exception => // closed during accept
      }
    }
  })

  def url: String = s"http://127.0.0.1:${server.getLocalPort}"

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: Exception => }
    pool.shutdownNow()
    ()
  }
}
