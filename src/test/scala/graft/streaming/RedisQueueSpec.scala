package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

/** The reference's queue is literally a Redis list (`RPUSH cdc_events`,
  * `main.go:38,95`). These specs prove [[RedisQueue]] speaks real RESP
  * against an in-process fake Redis that implements the list commands over
  * the actual wire protocol — multi-connection (executor tasks connect
  * concurrently), binary-safe bulk strings, nil replies — and that the
  * dual-sink delivery topology runs unchanged with the Redis backend
  * swapped in for the file one.
  */
class RedisQueueSpec extends SparkSuite {

  /** Fake Redis: RESP arrays in, list semantics over a shared map. One
    * thread per connection — RPUSH from parallel partition tasks must
    * interleave safely, like a real server.
    */
  private final class FakeRedis(requirePass: String = "") extends AutoCloseable {
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

  private val cfg = CdcConfig(Map("orders" -> "grp_sales", "customer" -> "grp_dim"))
  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private val fixture = Seq(
    ChangeEvent("orders", "insert", null, Map("id" -> "1", "total" -> "10.5"), ts(0)),
    ChangeEvent("orders", "update", Map("id" -> "1", "total" -> "10.5"),
      Map("id" -> "1", "total" -> "12.0"), ts(1)),
    ChangeEvent("customer", "insert", null, Map("id" -> "7"), ts(3)))

  test("RESP client round-trip: integers, bulk strings with CRLF bytes, nil") {
    val redis = new FakeRedis
    try {
      val c = new RespClient("127.0.0.1", redis.port)
      try {
        // bulk strings are length-prefixed: payloads containing the very
        // CRLF framing bytes round-trip untouched
        val tricky = "line1\r\nline2\t{\"k\": \"v\"}"
        assert(c.command("RPUSH", "k", tricky) == RespInt(1))
        assert(c.command("LLEN", "k") == RespInt(1))
        assert(c.command("LPOP", "k") == RespStr(tricky))
        assert(c.command("LPOP", "k") == RespNil)
        intercept[java.io.IOException] { c.command("BOGUS") }
      } finally c.close()
    } finally redis.close()
  }

  test("AUTH: a password-protected server accepts the right password only") {
    val redis = new FakeRedis(requirePass = "hunter2")
    try {
      val q = RedisQueue("127.0.0.1", redis.port, password = "hunter2")
      val c = q.client()
      c.enqueue("g", "payload")
      c.close()
      assert(q.pending == 1)
      assert(q.drain((_, _) => ()) == 1)
      // wrong password surfaces the server's error, unauthenticated is refused
      intercept[java.io.IOException] {
        RedisQueue("127.0.0.1", redis.port, password = "wrong").pending
      }
      intercept[java.io.IOException] {
        RedisQueue("127.0.0.1", redis.port).pending
      }
    } finally redis.close()
  }

  test("position store: SET/GET the reference's binlog_position key") {
    val redis = new FakeRedis
    try {
      val store = RedisPositionStore("127.0.0.1", redis.port)
      assert(store.load().isEmpty)
      val json = """{"name":"mysql-bin.000007","pos":1234}"""
      assert(store.save(json))
      assert(store.load().contains(json))
      assert(redis.strings.get("binlog_position") == json)
      // degraded mode: a dead server fails soft, never throws
      val dead = RedisPositionStore("127.0.0.1", 1)
      assert(!dead.save(json) && dead.load().isEmpty)
    } finally redis.close()
  }

  test("dual sink delivers through a real RESP conversation, drain empties the list") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val server = new DebugSink
    val redis = new FakeRedis
    try {
      val mem = MemoryStream[ChangeEvent]
      mem.addData(fixture: _*)
      val env = CdcPipeline.transform(mem.toDF(), cfg)
      val ckpt = Files.createTempDirectory("graft_redis_ckpt").toString
      val q = RedisQueue("127.0.0.1", redis.port)
      Sinks.runToCompletion(Sinks.dualSink(env, server.url, ckpt, q = q))

      // queued on the server (the reference's cdc_events list), not in
      // any JVM-local state
      assert(q.pending == 3)
      assert(redis.lists.get("cdc_events").size == 3)

      // a brand-new handle (fresh process) drains everything over RESP
      val before = server.captured.size
      val drained = Sinks.drainQueue(server.url, cfg.tableToGroup,
        q = RedisQueue("127.0.0.1", redis.port))
      assert(drained == 3)
      assert(server.captured.size == before + 3)
      assert(q.pending == 0)
    } finally { redis.close(); server.stop() }
  }
}
