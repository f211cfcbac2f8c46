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

  test("reference interop: the list holds BARE payloads, both directions drain") {
    val redis = new FakeRedis
    try {
      val q = RedisQueue("127.0.0.1", redis.port)
      val payload = """{"before":null,"after":{"id":"1"},"source":{"table":"orders"}}"""
      val c = q.client()
      c.enqueue("grp_sales", payload)
      c.close()
      // what sits in cdc_events is the bare JSON the reference's own drain
      // worker parses (main.go:403-406) — no group prefix, no framing
      assert(redis.lists.get("cdc_events").peek() == payload)
      // and an item the REFERENCE pushed (bare JSON) drains symmetrically:
      // the group slot is empty, the consumer re-derives it from the payload
      val seen = scala.collection.mutable.Buffer[(String, String)]()
      assert(q.drain((g, p) => { seen += ((g, p)); () }) == 1)
      assert(seen.toSeq == Seq(("", payload)))
    } finally redis.close()
  }

  test("BLPOP: a blocking drain parks until a concurrent RPUSH lands") {
    val redis = new FakeRedis
    try {
      val q = RedisQueue("127.0.0.1", redis.port)
      // empty queue + 1s timeout → nil, no throw
      assert(q.blockingPop(1).isEmpty)
      // a parked worker wakes when another connection RPUSHes
      val popped = new java.util.concurrent.atomic.AtomicReference[String]()
      val worker = new Thread(() => popped.set(q.blockingPop(10).orNull))
      worker.start()
      Thread.sleep(300)
      assert(popped.get == null, "worker must still be blocked on the empty list")
      val c = q.client(); c.enqueue("g", "late-item"); c.close()
      worker.join(10000)
      assert(popped.get == "late-item")
      // the worker-loop form consumes everything, returns on idle timeout
      val c2 = q.client(); c2.enqueue("g", "a"); c2.enqueue("g", "b"); c2.close()
      val got = scala.collection.mutable.Buffer[String]()
      assert(q.drainBlocking((_, p) => { got += p; () }, idleTimeoutSec = 1) == 2)
      assert(got.toSeq == Seq("a", "b"))
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
