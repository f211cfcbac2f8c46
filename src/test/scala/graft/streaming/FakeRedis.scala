package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/** Fake Redis: RESP arrays in, list semantics over a shared map. One
  * thread per connection — RPUSH from parallel partition tasks must
  * interleave safely, like a real server.
  */
final class FakeRedis(requirePass: String = "") extends AutoCloseable {
  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort
  val lists = new ConcurrentHashMap[String, ConcurrentLinkedQueue[String]]()
  val strings = new ConcurrentHashMap[String, String]()

  private def listFor(key: String): ConcurrentLinkedQueue[String] =
    lists.computeIfAbsent(key, _ => new ConcurrentLinkedQueue[String]())

  private val acceptThread = new Thread(() => {
    try {
      while (!server.isClosed) {
        val sock = server.accept()
        new Thread(() => {
          try {
            sock.setTcpNoDelay(true)
            val in = new BufferedInputStream(sock.getInputStream)
            val out = new BufferedOutputStream(sock.getOutputStream)
            def line(): String = {
              val sb = new StringBuilder
              var b = in.read()
              if (b < 0) throw new EOFException
              while (b != '\r') { sb.append(b.toChar); b = in.read() }
              in.read() // \n
              sb.toString()
            }
            def reply(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.flush() }
            var authed = requirePass.isEmpty
            while (true) {
              val head = line()
              assert(head.startsWith("*"), s"expected array, got $head")
              val n = head.substring(1).toInt
              val args = (0 until n).map { _ =>
                val bulk = line()
                assert(bulk.startsWith("$"))
                val len = bulk.substring(1).toInt
                val buf = new Array[Byte](len)
                var off = 0
                while (off < len) {
                  val r = in.read(buf, off, len - off)
                  if (r < 0) throw new EOFException
                  off += r
                }
                in.read(); in.read() // \r\n
                new String(buf, UTF_8)
              }
              args.head.toUpperCase match {
                case "AUTH" =>
                  if (args(1) == requirePass) { authed = true; reply("+OK\r\n") }
                  else reply("-WRONGPASS invalid password\r\n")
                case _ if !authed =>
                  reply("-NOAUTH Authentication required.\r\n")
                case "SET" =>
                  strings.put(args(1), args(2))
                  reply("+OK\r\n")
                case "GET" =>
                  val v = strings.get(args(1))
                  if (v == null) reply("$-1\r\n")
                  else {
                    val bytes = v.getBytes(UTF_8)
                    out.write(s"$$${bytes.length}\r\n".getBytes(UTF_8))
                    out.write(bytes); out.write('\r'); out.write('\n'); out.flush()
                  }
                case "RPUSH" =>
                  val l = listFor(args(1))
                  args.drop(2).foreach(l.add)
                  reply(s":${l.size}\r\n")
                case "LPOP" =>
                  val v = listFor(args(1)).poll()
                  if (v == null) reply("$-1\r\n")
                  else {
                    val bytes = v.getBytes(UTF_8)
                    out.write(s"$$${bytes.length}\r\n".getBytes(UTF_8))
                    out.write(bytes); out.write('\r'); out.write('\n'); out.flush()
                  }
                case "BLPOP" =>
                  // BLPOP key timeout — block until an item lands or the
                  // timeout (seconds, 0 = forever) expires; reply is the
                  // two-element [key, value] array or a nil array
                  val timeoutSec = args(2).toDouble
                  val deadline =
                    if (timeoutSec == 0) Long.MaxValue
                    else System.nanoTime() + (timeoutSec * 1e9).toLong
                  var v: String = null
                  while (v == null && System.nanoTime() < deadline && !server.isClosed) {
                    v = listFor(args(1)).poll()
                    if (v == null) Thread.sleep(5)
                  }
                  if (v == null) reply("*-1\r\n")
                  else {
                    val kb = args(1).getBytes(UTF_8)
                    val vb = v.getBytes(UTF_8)
                    out.write("*2\r\n".getBytes(UTF_8))
                    out.write(s"$$${kb.length}\r\n".getBytes(UTF_8))
                    out.write(kb); out.write('\r'); out.write('\n')
                    out.write(s"$$${vb.length}\r\n".getBytes(UTF_8))
                    out.write(vb); out.write('\r'); out.write('\n')
                    out.flush()
                  }
                case "LLEN" => reply(s":${listFor(args(1)).size}\r\n")
                case other => reply(s"-ERR unknown command '$other'\r\n")
              }
            }
          } catch { case _: Exception => () } // connection closed
          finally sock.close()
        }).start()
      }
    } catch { case _: Exception => () } // server closed
  })
  acceptThread.start()
  override def close(): Unit = { server.close(); acceptThread.join(5000) }
}
