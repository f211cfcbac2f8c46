package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference's debug sink (reference `logger/logger.go:11-32`) as an
  * in-process component: an HTTP server that accepts any request, records
  * method/path/body, and replies 200 `{"status":"ok"}`. Used as the dev-loop
  * delivery target and as the Tier C test fixture (FIXTURES.md §4).
  */
final class DebugSink {
  final case class Captured(method: String, path: String, body: String)

  val captured: ConcurrentLinkedQueue[Captured] = new ConcurrentLinkedQueue()
  @volatile var respondStatus: Int = 200 // set 500 to exercise hazard H4

  private val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    captured.add(Captured(ex.getRequestMethod, ex.getRequestURI.getPath, body))
    val resp = """{"status":"ok"}""".getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(respondStatus, resp.length)
    ex.getResponseBody.write(resp)
    ex.close()
  })
  server.setExecutor(null)
  server.start()

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
}
