package graft.sources

import java.io.IOException
import java.net.ServerSocket
import java.nio.ByteBuffer
import java.nio.ByteOrder.LITTLE_ENDIAN
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.security.MessageDigest
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.functions.{BinlogTestData, BinlogWire}

/** Proves the replication-protocol conversation against an in-process fake
  * MySQL server that speaks the same public wire bytes a real master does:
  * protocol-v10 handshake with a challenge seed, SERVER-side verification
  * of the `mysql_native_password` scramble (the server check is
  * `SHA1(response XOR SHA1(seed ++ stored)) == stored` with
  * `stored = SHA1(SHA1(password))` — an independent derivation, so a broken
  * client scramble cannot pass by construction), `COM_BINLOG_DUMP` parsing,
  * the synthetic-ROTATE/FDE stream preamble, checksummed events, rotation,
  * mid-file resume, and ERR packets. On top sits the end-to-end proof:
  * fake master → [[BinlogSpoolClient]] spool → [[CdcBinlogDirSource]]
  * streaming read → decoded headers.
  */
class MySqlReplClientSpec extends SparkSuite {

  import BinlogTestData.{event, rotateBody}
  import MySqlRepl._


  // ---- fixture binlog chain (CRC32-checksummed, like a modern master) ----

  private def crc(bytes: Array[Byte]): Array[Byte] = {
    val c = new java.util.zip.CRC32
    c.update(bytes)
    ByteBuffer.allocate(4).order(LITTLE_ENDIAN).putInt(c.getValue.toInt).array()
  }

  /** Event with a real CRC32 trailer (event_size covers the 4 CRC bytes). */
  private def cev(ts: Long, tpe: Int, logPos: Long, body: Array[Byte]): Array[Byte] = {
    val sized = event(ts, tpe, 1, logPos, 0, body ++ Array[Byte](0, 0, 0, 0))
    val payload = sized.dropRight(4)
    payload ++ crc(payload)
  }

  /** FDE body declaring CRC32 (alg byte + its own CRC at the tail). */
  private def fdeEvent(logPos: Long): Array[Byte] = {
    val body = Array.fill[Byte](52)(0) ++ Array[Byte](1) // ... alg = CRC32
    cev(1700000000L, 15, logPos, body)
  }

  private val f1 = {
    val fde = fdeEvent(120)
    val w1 = cev(1700000001L, 30, 200, Array[Byte](1, 1, 1, 1))
    val w2 = cev(1700000002L, 30, 300, Array[Byte](2, 2))
    val rot = cev(1700000003L, 4, 0, rotateBody(4L, "fake-bin.000002"))
    "fake-bin.000001" -> Seq(fde, w1, w2, rot)
  }
  private val f2 = {
    val fde = fdeEvent(120)
    val w3 = cev(1700000004L, 30, 200, Array[Byte](3, 3, 3))
    "fake-bin.000002" -> Seq(fde, w3)
  }

  private def tsOf(ev: Array[Byte]): Int =
    (BinlogWire.decodeHeader(ev).getLong(0) - 1700000000L).toInt

  // ---- GTID-transactional chain: every write is its own group, each
  // group COMMIT-terminated by an XID event (as InnoDB row transactions
  // are), and every file carries the PREVIOUS_GTIDS preamble event
  // (type 35) a real 5.6+ binlog starts with — the resume logic must
  // neither count an unterminated group as held nor re-append preamble
  // events when the master re-streams a partially-spooled file. ----

  private val SidText = "00010203-0405-0607-0809-0a0b0c0d0e0f"

  /** GTID event: commit flag + 16-byte SID + u64 LE GNO (checksummed). */
  private def gev(ts: Long, logPos: Long, gno: Long): Array[Byte] = {
    val body = ByteBuffer.allocate(1 + 16 + 8).order(LITTLE_ENDIAN)
    body.put(1.toByte).put(GtidSet.uuidBytes(SidText)).putLong(gno)
    cev(ts, 33, logPos, body.array())
  }

  /** XID event (type 16): the u64 transaction id that commits a group. */
  private def xev(ts: Long, xid: Long): Array[Byte] =
    cev(ts, 16, 0, ByteBuffer.allocate(8).order(LITTLE_ENDIAN).putLong(xid).array())

  /** Query event (type 2, checksummed): 13-byte post-header (thread, exec
    * time, schema len, error code, status-vars len), schema + NUL, SQL —
    * the STATEMENT/MIXED-format group payload.
    */
  private def qev(ts: Long, sql: String): Array[Byte] = {
    val schema = "shop".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val body = Array[Byte](7, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0) ++
      Array[Byte](schema.length.toByte) ++ Array[Byte](0, 0) ++
      Array[Byte](0, 0) ++ schema ++ Array[Byte](0) ++
      sql.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    cev(ts, 2, 0, body)
  }

  /** PREVIOUS_GTIDS event (type 35): the gtid-set payload after the FDE. */
  private def pgev(ts: Long, prior: GtidSet): Array[Byte] =
    cev(ts, 35, 0, prior.encode)

  private val g1 = {
    val fde = fdeEvent(120)
    val evs = Seq(fde, pgev(1700000000L, GtidSet.Empty),
      gev(1700000001L, 0, 1L), cev(1700000001L, 30, 0, Array[Byte](1, 1)),
      xev(1700000001L, 11L),
      gev(1700000002L, 0, 2L), cev(1700000002L, 30, 0, Array[Byte](2, 2)),
      xev(1700000002L, 12L),
      cev(1700000003L, 4, 0, rotateBody(4L, "fake-bin.000002")))
    "fake-bin.000001" -> evs
  }
  private val g2 = {
    val fde = fdeEvent(120)
    "fake-bin.000002" -> Seq(fde, pgev(1700000003L, GtidSet.parse(s"$SidText:1-2")),
      gev(1700000004L, 0, 3L), cev(1700000004L, 30, 0, Array[Byte](3, 3)),
      xev(1700000004L, 13L))
  }
  /** g2 after the master moved on: one more transaction appended. */
  private val g2grown = g2._1 -> (g2._2 ++ Seq(
    gev(1700000005L, 0, 4L), cev(1700000005L, 30, 0, Array[Byte](4, 4)),
    xev(1700000005L, 14L)))
  /** g2grown with the stream dead mid-group: transaction 4 never commits. */
  private val g2torn = g2._1 -> (g2._2 ++ Seq(
    gev(1700000005L, 0, 4L), cev(1700000005L, 30, 0, Array[Byte](4, 4))))

  // ---- MariaDB GTID chain: domain-server-seq identities, GTID_LIST
  // preambles, XID-committed groups ----

  /** MariaDB GTID event (type 162): u64 LE seq, u32 LE domain, u8 flags. */
  private def mgev(ts: Long, domain: Long, seqNo: Long): Array[Byte] = {
    val body = ByteBuffer.allocate(8 + 4 + 1).order(LITTLE_ENDIAN)
    body.putLong(seqNo).putInt(domain.toInt).put(0.toByte)
    cev(ts, 162, 0, body.array())
  }

  /** MariaDB GTID_LIST event (type 163): u32 count + (domain, server, seq)
    * triples — the file preamble naming the state at rotation.
    */
  private def mglev(ts: Long, entries: Seq[(Long, Long, Long)]): Array[Byte] = {
    val body = ByteBuffer.allocate(4 + entries.size * 16).order(LITTLE_ENDIAN)
    body.putInt(entries.size)
    entries.foreach { case (d, s, q) =>
      body.putInt(d.toInt).putInt(s.toInt).putLong(q)
    }
    cev(ts, 163, 0, body.array())
  }

  private val h1 = {
    val evs = Seq(fdeEvent(120), mglev(1700000000L, Seq.empty),
      mgev(1700000001L, 0L, 1L), cev(1700000001L, 30, 0, Array[Byte](1, 1)),
      xev(1700000001L, 21L),
      mgev(1700000002L, 0L, 2L), cev(1700000002L, 30, 0, Array[Byte](2, 2)),
      xev(1700000002L, 22L),
      cev(1700000003L, 4, 0, rotateBody(4L, "maria-bin.000002")))
    "maria-bin.000001" -> evs
  }
  private val h2 = {
    "maria-bin.000002" -> Seq(fdeEvent(120), mglev(1700000003L, Seq((0L, 1L, 2L))),
      mgev(1700000004L, 0L, 3L), cev(1700000004L, 30, 0, Array[Byte](3, 3)),
      xev(1700000004L, 23L))
  }
  private val h2grown = h2._1 -> (h2._2 ++ Seq(
    mgev(1700000005L, 0L, 4L), cev(1700000005L, 30, 0, Array[Byte](4, 4)),
    xev(1700000005L, 24L)))

  test("scramble round-trip: the server's own check accepts the client token") {
    val seed = Array.tabulate[Byte](20)(i => (i * 31 + 1).toByte)
    val token = nativePasswordScramble("s3cret", seed)
    assert(token.length == 20)
    // server side, derived independently: SHA1(token XOR SHA1(seed++stored)) == stored
    val d = MessageDigest.getInstance("SHA-1")
    val stored = d.digest(d.digest("s3cret".getBytes(UTF_8)))
    d.update(seed); d.update(stored)
    val mask = d.digest()
    val recovered = token.zip(mask).map { case (a, b) => (a ^ b).toByte }
    assert(d.digest(recovered).sameElements(stored))
    assert(nativePasswordScramble("", seed).isEmpty)
  }

  test("handshake decode: version, 20-byte seed, plugin, capabilities") {
    val m = new FakeMySqlMaster("u", "p", Seq(f1))
    try {
      val sock = new java.net.Socket("127.0.0.1", m.port)
      try {
        val io = new PacketIO(sock.getInputStream, sock.getOutputStream)
        val (seq, payload) = io.read()
        assert(seq == 0)
        val hs = decodeHandshake(payload)
        assert(hs.serverVersion == "8.0.99-fake")
        assert(hs.seed.length == 20)
        assert(hs.authPlugin == NativePasswordPlugin)
        assert((hs.capabilities & ClientSecureConnection) != 0)
      } finally sock.close()
    } finally m.close()
  }

  test("full tail: auth, dump from {'',4}, spool follows rotation byte-exactly") {
    val m = new FakeMySqlMaster("repl", "hunter2", Seq(f1, f2))
    val spool = Files.createTempDirectory("repl_spool")
    try {
      val client = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m.port, "repl", "hunter2", serverId = 4242L), spool)
      val n = try client.run() finally client.close()
      assert(m.authFailure == null, s"auth rejected: ${m.authFailure}")
      assert(n == 6, s"spooled $n events")
      // the master saw the reference's fresh-start position {'' , 4}
      val dump = m.dumps.poll()
      assert(dump == DumpRequest("", 4L, 4242L), dump.toString)
      // spool files are byte-identical to the master's binlogs
      assert(Files.readAllBytes(spool.resolve("fake-bin.000001")).sameElements(
        BinlogTestData.magic ++ f1._2.reduce(_ ++ _)))
      assert(Files.readAllBytes(spool.resolve("fake-bin.000002")).sameElements(
        BinlogTestData.magic ++ f2._2.reduce(_ ++ _)))
    } finally m.close()
  }

  test("heartbeats (27 and 41) are wire-only: never spooled, spool stays byte-exact") {
    // an idle master with MASTER_HEARTBEAT_PERIOD set interleaves synthetic
    // HEARTBEAT (27) / HEARTBEAT_V2 (41, 8.0.27+) events into the dump
    // stream; they exist only on the wire — spooling one would shift every
    // later {name,pos} byte offset off the master's real binlog file
    val fde = fdeEvent(120)
    val w1 = cev(1700000001L, 30, 200, Array[Byte](1, 1, 1, 1))
    val hb = cev(1700000009L, 27, 300, "hb-bin.000001".getBytes(UTF_8))
    val hb2 = cev(1700000009L, 41, 300, Array[Byte](0, 1, 2))
    val w2 = cev(1700000002L, 30, 300, Array[Byte](2, 2))
    val m = new FakeMySqlMaster("repl", "",
      Seq("fake-bin.000001" -> Seq(fde, w1, hb, hb2, w2)))
    val spool = Files.createTempDirectory("repl_hb")
    try {
      val client = new BinlogSpoolClient(ReplConfig("127.0.0.1", m.port, "repl"), spool)
      val n = try client.run() finally client.close()
      assert(n == 3, s"spooled $n events") // fde + w1 + w2; both heartbeats dropped
      assert(Files.readAllBytes(spool.resolve("fake-bin.000001")).sameElements(
        BinlogTestData.magic ++ fde ++ w1 ++ w2))
    } finally m.close()
  }

  test("resume: a second run dumps from the spool end, appends only the delta") {
    val m1 = new FakeMySqlMaster("repl", "", Seq(f1))
    val spool = Files.createTempDirectory("repl_resume")
    try {
      val c1 = new BinlogSpoolClient(ReplConfig("127.0.0.1", m1.port, "repl"), spool)
      try c1.run() finally c1.close()
    } finally m1.close()
    val before = Files.readAllBytes(spool.resolve("fake-bin.000001"))
    // master has moved on: file 2 exists now; replica must resume mid-chain
    val m2 = new FakeMySqlMaster("repl", "", Seq(f1, f2))
    try {
      val c2 = new BinlogSpoolClient(ReplConfig("127.0.0.1", m2.port, "repl"), spool)
      val n = try c2.run() finally c2.close()
      val dump = m2.dumps.poll()
      // resumed exactly past f1's last complete event (rotate included)
      assert(dump.name == "fake-bin.000001", dump.toString)
      assert(dump.pos == 4L + f1._2.map(_.length).sum, dump.toString)
      // file 1 untouched (the re-sent descriptive FDE was not re-spooled)
      assert(Files.readAllBytes(spool.resolve("fake-bin.000001")).sameElements(before))
      assert(n == 2, s"delta was $n events") // f2: FDE + w3
      assert(Files.readAllBytes(spool.resolve("fake-bin.000002")).sameElements(
        BinlogTestData.magic ++ f2._2.reduce(_ ++ _)))
    } finally m2.close()
  }

  test("bad credentials surface the server's ERR, not a hang") {
    val m = new FakeMySqlMaster("repl", "right", Seq(f1))
    val spool = Files.createTempDirectory("repl_badauth")
    try {
      val client = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m.port, "repl", "wrong"), spool)
      val err = intercept[IOException] { try client.run() finally client.close() }
      assert(err.getMessage.contains("Access denied"), err.getMessage)
      assert(CdcLogDirSource.listLogs(spool.toString).isEmpty)
    } finally m.close()
  }

  test("caching_sha2_password fast auth: scramble accepted, dump proceeds") {
    // MySQL 8.0's default plugin — the first thing a real modern server
    // asks for. The fake's check recovers SHA256(password) from the token
    // (an independent derivation), replies 0x01 0x03 fast-auth-success,
    // then OK; the stream must proceed as with native auth.
    val m = new FakeMySqlMaster("repl", "hunter2", Seq(f1, f2),
      authPlugin = CachingSha2Plugin)
    val spool = Files.createTempDirectory("repl_sha2_fast")
    try {
      val client = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m.port, "repl", "hunter2"), spool)
      val n = try client.run() finally client.close()
      assert(m.authFailure == null, s"auth rejected: ${m.authFailure}")
      assert(!m.sawFullAuth, "fast auth must not fall back to full auth")
      assert(n == 6, s"spooled $n events")
      assert(Files.readAllBytes(spool.resolve("fake-bin.000002")).sameElements(
        BinlogTestData.magic ++ f2._2.reduce(_ ++ _)))
    } finally m.close()
  }

  test("caching_sha2_password full auth: RSA key exchange over a plain socket") {
    // cache miss: the server demands full authentication (0x01 0x04); the
    // client requests the RSA public key (0x02), receives the PEM, and
    // sends XOR(password||NUL, nonce) under RSA-OAEP. The fake decrypts
    // with its private key and compares — the whole non-TLS fallback path.
    val m = new FakeMySqlMaster("repl", "s3cret!", Seq(f1),
      authPlugin = CachingSha2Plugin, sha2Cached = false)
    val spool = Files.createTempDirectory("repl_sha2_full")
    try {
      val client = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m.port, "repl", "s3cret!"), spool)
      val n = try client.run() finally client.close()
      assert(m.authFailure == null, s"auth rejected: ${m.authFailure}")
      assert(m.sawFullAuth, "server never entered full auth")
      assert(n == 4, s"spooled $n events")
      assert(Files.readAllBytes(spool.resolve("fake-bin.000001")).sameElements(
        BinlogTestData.magic ++ f1._2.reduce(_ ++ _)))
    } finally m.close()
  }

  test("auth switch: server demands a different plugin with a fresh nonce") {
    // the account's plugin differs from the advertised one: the server
    // replies 0xFE + mysql_native_password + a NEW 20-byte nonce; the
    // client must answer with a native scramble over THAT nonce
    val m = new FakeMySqlMaster("repl", "pw!", Seq(f1), authPlugin = CachingSha2Plugin)
    m.switchToNative = true
    val spool = Files.createTempDirectory("repl_switch")
    try {
      val client = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m.port, "repl", "pw!"), spool)
      val n = try client.run() finally client.close()
      assert(m.authFailure == null, s"auth rejected: ${m.authFailure}")
      assert(n == 4, s"spooled $n events")
    } finally m.close()
  }

  test("caching_sha2_password rejects a wrong password on both paths") {
    val fast = new FakeMySqlMaster("repl", "right", Seq(f1),
      authPlugin = CachingSha2Plugin)
    try {
      val spool = Files.createTempDirectory("repl_sha2_badfast")
      val c = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", fast.port, "repl", "wrong"), spool)
      val err = intercept[IOException] { try c.run() finally c.close() }
      assert(err.getMessage.contains("Access denied"), err.getMessage)
    } finally fast.close()
    val full = new FakeMySqlMaster("repl", "right", Seq(f1),
      authPlugin = CachingSha2Plugin, sha2Cached = false)
    try {
      val spool = Files.createTempDirectory("repl_sha2_badfull")
      val c = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", full.port, "repl", "wrong"), spool)
      val err = intercept[IOException] { try c.run() finally c.close() }
      assert(err.getMessage.contains("Access denied"), err.getMessage)
      assert(full.sawFullAuth)
    } finally full.close()
  }

  test("end-to-end: fake master → spool → CdcBinlogDirSource → decoded events") {
    val m = new FakeMySqlMaster("repl", "", Seq(f1, f2))
    val spool = Files.createTempDirectory("repl_e2e")
    val ckpt = Files.createTempDirectory("repl_e2e_ckpt").toString
    try {
      val client = new BinlogSpoolClient(ReplConfig("127.0.0.1", m.port, "repl"), spool)
      try client.run() finally client.close()
      // the proven rotating dir source serves the spool with {name,pos} offsets
      val got = new ConcurrentLinkedQueue[(Int, String)]()
      val q = spark.readStream.format(classOf[CdcBinlogDirSource].getName)
        .option("path", spool.toString).load()
        .select(BinlogWire.binlog_header(col("event")).getField("ts_sec").as("ts"),
          col("file"))
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r =>
            got.add(((r.getLong(0) - 1700000000L).toInt, r.getString(1))))
          ()
        }
        .start()
      assert(q.awaitTermination(60000), "stream did not finish")
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSeq.sorted == Seq(
        (0, "fake-bin.000001"), (1, "fake-bin.000001"), (2, "fake-bin.000001"),
        (3, "fake-bin.000001"), (0, "fake-bin.000002"), (4, "fake-bin.000002")).sorted)
    } finally m.close()
  }

  test("LIVE tail: commits stream into a running query while the dump stays open") {
    // the full reference topology CONCURRENTLY, not sequentially: the
    // client holds the dump connection open and spools as the master
    // commits, while a Structured Streaming query consumes the growing
    // spool — proving the spool-is-WAL design delivers live events, not
    // just replayed history
    val m = new FakeMySqlMaster("repl", "", Seq(f1, f2))
    m.liveMode = true
    val spool = Files.createTempDirectory("repl_live")
    val ckpt = Files.createTempDirectory("repl_live_ckpt").toString
    val client = new BinlogSpoolClient(ReplConfig("127.0.0.1", m.port, "repl"), spool)
    val runner = new Thread(() => { try client.run() catch { case _: Exception => () } })
    runner.setDaemon(true)
    def waitFor(what: String)(cond: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!cond) {
        assert(System.currentTimeMillis() < deadline, s"timed out waiting for $what")
        Thread.sleep(100)
      }
    }
    try {
      runner.start()
      val got = new ConcurrentLinkedQueue[Int]()
      val q = spark.readStream.format(classOf[CdcBinlogDirSource].getName)
        .option("path", spool.toString).load()
        .select(BinlogWire.binlog_header(col("event")).getField("ts_sec").as("ts"))
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => got.add((r.getLong(0) - 1700000000L).toInt))
          ()
        }
        .start()
      try {
        // history flows while the connection stays open (no EOF)
        waitFor("initial chain")(got.size == 6)
        // the master commits two more events — they must reach the query
        // through the live socket + spool + micro-batch pipeline
        m.live.put(cev(1700000007L, 30, 0, Array[Byte](7)))
        m.live.put(cev(1700000008L, 30, 0, Array[Byte](8, 8)))
        waitFor("live delta") {
          import scala.jdk.CollectionConverters._
          got.asScala.toSet.contains(7) && got.asScala.toSet.contains(8)
        }
        assert(got.size == 8, s"saw ${got.size} events")
      } finally q.stop()
    } finally {
      client.close()
      m.close()
      runner.join(5000)
    }
  }

  test("GtidSet: parse/text round-trip, interval coalescing, wire encoding") {
    val s = GtidSet.parse(s"$SidText:1-5:7,AABBCCDD-0000-0000-0000-000000000001:3")
    assert(s.text ==
      s"$SidText:1-5:7,aabbccdd-0000-0000-0000-000000000001:3")
    assert(s.contains(SidText, 3) && s.contains(SidText, 7))
    assert(!s.contains(SidText, 6) && !s.contains(SidText, 8))
    // adding the gap coalesces 1-5:7 into 1-7; adjacency merges too
    assert(s.add(SidText, 6).sids(SidText) == Vector((1L, 7L)))
    assert(GtidSet.Empty.add(SidText, 2).add(SidText, 1).add(SidText, 2).text ==
      s"$SidText:1-2")
    // binary round-trip (inclusive text ends ↔ exclusive wire ends)
    assert(GtidSet.decode(s.encode).text == s.text)
    assert(GtidSet.parse("").isEmpty && GtidSet.decode(GtidSet.Empty.encode).isEmpty)
  }

  test("gtid dump from an empty spool: empty set on the wire, full chain spooled") {
    val m = new FakeMySqlMaster("repl", "", Seq(g1, g2))
    val spool = Files.createTempDirectory("repl_gtid_full")
    try {
      val c = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m.port, "repl", serverId = 77L, useGtid = true), spool)
      val n = try c.run() finally c.close()
      val req = m.gtidDumps.poll()
      assert(req != null, "master never saw COM_BINLOG_DUMP_GTID")
      assert(req.flags == 4 && req.serverId == 77L && req.name == "" &&
        req.pos == 4L && req.gtids == "", req.toString)
      assert(n == 14, s"spooled $n events") // 9 in g1 + 5 in g2
      assert(Files.readAllBytes(spool.resolve("fake-bin.000001")).sameElements(
        BinlogTestData.magic ++ g1._2.reduce(_ ++ _)))
      assert(Files.readAllBytes(spool.resolve("fake-bin.000002")).sameElements(
        BinlogTestData.magic ++ g2._2.reduce(_ ++ _)))
    } finally m.close()
  }

  test("gtid resume: spool-derived set on the wire, only missing groups arrive") {
    val spool = Files.createTempDirectory("repl_gtid_resume")
    val m1 = new FakeMySqlMaster("repl", "", Seq(g1, g2))
    try {
      val c1 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m1.port, "repl", useGtid = true), spool)
      try c1.run() finally c1.close()
    } finally m1.close()
    // the spool names its own position in GTID terms
    val c2 = new BinlogSpoolClient(
      ReplConfig("127.0.0.1", 1, "repl", useGtid = true), spool)
    assert(c2.resumeGtidSet().text == s"$SidText:1-3")
    // master moved on: transaction 4 exists; resume must fetch exactly it
    val m2 = new FakeMySqlMaster("repl", "", Seq(g1, g2grown))
    try {
      val c3 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m2.port, "repl", useGtid = true), spool)
      val n = try c3.run() finally c3.close()
      val req = m2.gtidDumps.poll()
      assert(req.gtids == s"$SidText:1-3", req.toString)
      assert(n == 3, s"delta was $n events") // GTID(4) + its write + XID
      // the spool converges byte-identically to the master's grown file
      assert(Files.readAllBytes(spool.resolve("fake-bin.000002")).sameElements(
        BinlogTestData.magic ++ g2grown._2.reduce(_ ++ _)))
      // file 1 untouched by the resume
      assert(Files.readAllBytes(spool.resolve("fake-bin.000001")).sameElements(
        BinlogTestData.magic ++ g1._2.reduce(_ ++ _)))
    } finally m2.close()
  }

  test("mariadb flavor: fresh dump, position via @slave_connect_state, delta resume") {
    // fresh spool: empty connect state, the whole chain arrives
    val spool = Files.createTempDirectory("repl_maria")
    val m1 = new FakeMySqlMaster("repl", "", Seq(h1, h2), mariadb = true)
    try {
      val c1 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m1.port, "repl", useGtid = true,
          flavor = "mariadb"), spool)
      val n = try c1.run() finally c1.close()
      assert(m1.connectState == "", s"connect state was '${m1.connectState}'")
      assert(n == 14, s"spooled $n events") // 9 in h1 + 5 in h2
      assert(Files.readAllBytes(spool.resolve("maria-bin.000001")).sameElements(
        BinlogTestData.magic ++ h1._2.reduce(_ ++ _)))
      assert(Files.readAllBytes(spool.resolve("maria-bin.000002")).sameElements(
        BinlogTestData.magic ++ h2._2.reduce(_ ++ _)))
    } finally m1.close()
    // the spool names its own position in MariaDB GTID terms
    val probe = new BinlogSpoolClient(
      ReplConfig("127.0.0.1", 1, "repl", useGtid = true, flavor = "mariadb"), spool)
    assert(probe.resumeMariaGtidSet().text == "0-1-3")
    // master moved on: seq 4 exists; the resume must fetch exactly it,
    // with no duplicated FDE/GTID_LIST preamble on the re-opened file
    val m2 = new FakeMySqlMaster("repl", "", Seq(h1, h2grown), mariadb = true)
    try {
      val c2 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m2.port, "repl", useGtid = true,
          flavor = "mariadb"), spool)
      val n = try c2.run() finally c2.close()
      assert(m2.connectState == "0-1-3", s"connect state was '${m2.connectState}'")
      assert(n == 3, s"delta was $n events") // GTID(0-1-4) + write + XID
      assert(Files.readAllBytes(spool.resolve("maria-bin.000002")).sameElements(
        BinlogTestData.magic ++ h2grown._2.reduce(_ ++ _)))
      assert(Files.readAllBytes(spool.resolve("maria-bin.000001")).sameElements(
        BinlogTestData.magic ++ h1._2.reduce(_ ++ _)))
    } finally m2.close()
  }

  test("mariadb torn group: an uncommitted trailing transaction is not held") {
    // same commit discipline as the MySQL flavor, exercised through the
    // MariaDB scan: a spool ending GTID+write (no XID) must resume at the
    // previous committed position and converge after truncation
    val spool = Files.createTempDirectory("repl_maria_torn")
    val h2torn = h2._1 -> (h2._2 ++ Seq(
      mgev(1700000005L, 0L, 4L), cev(1700000005L, 30, 0, Array[Byte](4, 4))))
    val m1 = new FakeMySqlMaster("repl", "", Seq(h1, h2torn), mariadb = true)
    try {
      val c1 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m1.port, "repl", useGtid = true,
          flavor = "mariadb"), spool)
      try c1.run() finally c1.close()
    } finally m1.close()
    val probe = new BinlogSpoolClient(
      ReplConfig("127.0.0.1", 1, "repl", useGtid = true, flavor = "mariadb"), spool)
    assert(probe.resumeMariaGtidSet().text == "0-1-3")
    val m2 = new FakeMySqlMaster("repl", "", Seq(h1, h2grown), mariadb = true)
    try {
      val c2 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m2.port, "repl", useGtid = true,
          flavor = "mariadb"), spool)
      val n = try c2.run() finally c2.close()
      assert(m2.connectState == "0-1-3")
      assert(n == 3, s"delta was $n events")
      assert(Files.readAllBytes(spool.resolve("maria-bin.000002")).sameElements(
        BinlogTestData.magic ++ h2grown._2.reduce(_ ++ _)))
    } finally m2.close()
  }

  test("gtid resume after a mid-group death: torn transaction is re-fetched whole") {
    // session 1 dies between transaction 4's row event and its XID — the
    // spool holds a PARTIAL group. The resume must (a) not claim gno 4 in
    // its set (a GTID counts only at commit), (b) truncate the partial
    // group so the master's re-send appends after a clean tail, and
    // (c) converge byte-identically to the master's file — the failure
    // mode this guards against is a silently, permanently torn transaction
    // in the archive.
    val spool = Files.createTempDirectory("repl_gtid_torn")
    val m1 = new FakeMySqlMaster("repl", "", Seq(g1, g2torn))
    try {
      val c1 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m1.port, "repl", useGtid = true), spool)
      try c1.run() finally c1.close()
    } finally m1.close()
    // the spool ends mid-group: GTID(4) + write, no XID
    val tornBytes = Files.readAllBytes(spool.resolve("fake-bin.000002"))
    assert(tornBytes.sameElements(BinlogTestData.magic ++ g2torn._2.reduce(_ ++ _)))
    // held set stops at the last COMMITTED transaction
    val probe = new BinlogSpoolClient(
      ReplConfig("127.0.0.1", 1, "repl", useGtid = true), spool)
    assert(probe.resumeGtidSet().text == s"$SidText:1-3")
    // resume against the healthy master: exactly the whole group arrives
    val m2 = new FakeMySqlMaster("repl", "", Seq(g1, g2grown))
    try {
      val c2 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m2.port, "repl", useGtid = true), spool)
      val n = try c2.run() finally c2.close()
      val req = m2.gtidDumps.poll()
      assert(req.gtids == s"$SidText:1-3", req.toString)
      assert(n == 3, s"delta was $n events") // GTID(4) + write + XID, re-sent whole
      assert(Files.readAllBytes(spool.resolve("fake-bin.000002")).sameElements(
        BinlogTestData.magic ++ g2grown._2.reduce(_ ++ _)))
      assert(Files.readAllBytes(spool.resolve("fake-bin.000001")).sameElements(
        BinlogTestData.magic ++ g1._2.reduce(_ ++ _)))
    } finally m2.close()
  }

  test("statement-format groups: DML inside BEGIN never seals; bare DDL does") {
    // In a STATEMENT/MIXED binlog a group's payload is Query events, and
    // only an explicit ender (COMMIT/ROLLBACK/XA …) — or an auto-committed
    // statement with no BEGIN (DDL) — terminates it. gno 1 = BEGIN + DML +
    // COMMIT (held); gno 2 = bare DDL (held); gno 3 = BEGIN + DML +
    // ROLLBACK (held — the group completed); gno 4 = BEGIN + DML with the
    // stream dead before COMMIT. The DMLs must NOT seal their groups:
    // counting gno 4 as committed would make resume skip its re-send and
    // silently lose the tail forever.
    val spool = Files.createTempDirectory("repl_stmt_seal")
    val evs = Seq(fdeEvent(120), pgev(1700000000L, GtidSet.Empty),
      gev(1700000001L, 0, 1L), qev(1700000001L, "BEGIN"),
      qev(1700000001L, "INSERT INTO t VALUES (1)"), qev(1700000001L, "COMMIT"),
      gev(1700000002L, 0, 2L), qev(1700000002L, "CREATE TABLE u (id INT)"),
      gev(1700000003L, 0, 3L), qev(1700000003L, "BEGIN"),
      qev(1700000003L, "DELETE FROM t"), qev(1700000003L, "ROLLBACK"),
      gev(1700000004L, 0, 4L), qev(1700000004L, "BEGIN"),
      qev(1700000004L, "UPDATE t SET a = 2"))
    Files.write(spool.resolve("fake-bin.000001"),
      BinlogTestData.magic ++ evs.reduce(_ ++ _))
    val probe = new BinlogSpoolClient(
      ReplConfig("127.0.0.1", 1, "repl", useGtid = true), spool)
    assert(probe.resumeGtidSet().text == s"$SidText:1-3")
  }

  test("a TRANSACTION_PAYLOAD container seals its GTID group") {
    // With binlog_transaction_compression=ON the whole transaction
    // (TABLE_MAP + ROWS + XID) rides inside one type-40 container, so the
    // container IS the group's proof of completion — gno 1 must be held
    // even though the stream dies right after it (no XID/successor ever
    // arrives at the top level).
    val spool = Files.createTempDirectory("repl_tpe_seal")
    val payload = cev(1700000001L, 40, 0, Array[Byte](1, 1, 0, 0, 0, 0)) // body opaque to the scan
    val evs = Seq(fdeEvent(120), pgev(1700000000L, GtidSet.Empty),
      gev(1700000001L, 0, 1L), payload)
    Files.write(spool.resolve("fake-bin.000001"),
      BinlogTestData.magic ++ evs.reduce(_ ++ _))
    val probe = new BinlogSpoolClient(
      ReplConfig("127.0.0.1", 1, "repl", useGtid = true), spool)
    assert(probe.resumeGtidSet().text == s"$SidText:1")
  }

  test("XA groups: START opens, END does not seal, only PREPARE/COMMIT do") {
    // An XA transaction binlogs as XA START … XA END … XA PREPARE in one
    // group, with XA COMMIT as its OWN later group. Neither XA START nor
    // XA END is a group ender: a stream dying between XA END and XA
    // PREPARE leaves a torn group whose tail the master must re-send —
    // counting it held would skip that re-send and lose the prepare
    // forever (the same loss mode the BEGIN…COMMIT rule closes). gno 1 =
    // full prepared XA group (held); gno 2 = XA COMMIT group (held);
    // gno 3 = XA START + DML + XA END with the stream dead before
    // XA PREPARE — torn, must NOT be held.
    val spool = Files.createTempDirectory("repl_xa_seal")
    val evs = Seq(fdeEvent(120), pgev(1700000000L, GtidSet.Empty),
      gev(1700000001L, 0, 1L), qev(1700000001L, "XA START X'78','',1"),
      qev(1700000001L, "INSERT INTO t VALUES (1)"),
      qev(1700000001L, "XA END X'78','',1"),
      qev(1700000001L, "XA PREPARE X'78','',1"),
      gev(1700000002L, 0, 2L), qev(1700000002L, "XA COMMIT X'78','',1"),
      gev(1700000003L, 0, 3L), qev(1700000003L, "XA START X'79','',1"),
      qev(1700000003L, "UPDATE t SET a = 2"),
      qev(1700000003L, "XA END X'79','',1"))
    Files.write(spool.resolve("fake-bin.000001"),
      BinlogTestData.magic ++ evs.reduce(_ ++ _))
    val probe = new BinlogSpoolClient(
      ReplConfig("127.0.0.1", 1, "repl", useGtid = true), spool)
    assert(probe.resumeGtidSet().text == s"$SidText:1-2")
  }

  test("a spool that died before the terminating ROTATE gets it on resume") {
    // the previous stream died after file 1's last XID but BEFORE spooling
    // the real ROTATE: every group is held, so the re-streamed file stays
    // preamble-suppressed end to end — the ROTATE must still be appended
    // (the spool tail doesn't already hold it), restoring byte-identity
    val spool = Files.createTempDirectory("repl_missing_rotate")
    Files.write(spool.resolve(g1._1),
      BinlogTestData.magic ++ g1._2.dropRight(1).reduce(_ ++ _))
    val g2empty = "fake-bin.000002" ->
      Seq(fdeEvent(120), pgev(1700000003L, GtidSet.parse(s"$SidText:1-2")))
    val m = new FakeMySqlMaster("repl", "", Seq(g1, g2empty))
    try {
      val c1 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m.port, "repl", useGtid = true), spool)
      try c1.run() finally c1.close()
      assert(Files.readAllBytes(spool.resolve(g1._1)).sameElements(
        BinlogTestData.magic ++ g1._2.reduce(_ ++ _)))
      // a SECOND resume must not append the ROTATE again (tail-compare
      // sees it): both files stay byte-identical
      val c2 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m.port, "repl", useGtid = true), spool)
      try c2.run() finally c2.close()
      assert(Files.readAllBytes(spool.resolve(g1._1)).sameElements(
        BinlogTestData.magic ++ g1._2.reduce(_ ++ _)))
      assert(Files.readAllBytes(spool.resolve("fake-bin.000002")).sameElements(
        BinlogTestData.magic ++ g2empty._2.reduce(_ ++ _)))
    } finally m.close()
  }

  test("position resume truncates a torn trailing frame before appending") {
    // a crash mid-append leaves half an event frame at the spool tail; the
    // resume dumps from the last COMPLETE event, so the re-sent bytes must
    // land where the torn frame was, not after it
    val spool = Files.createTempDirectory("repl_torn_frame")
    val m1 = new FakeMySqlMaster("repl", "", Seq(f1))
    try {
      val c1 = new BinlogSpoolClient(ReplConfig("127.0.0.1", m1.port, "repl"), spool)
      try c1.run() finally c1.close()
    } finally m1.close()
    // f1 fully spooled (rotate included): chop the rotate in half to forge
    // the torn tail, so the resume re-fetches it
    val p = spool.resolve("fake-bin.000001")
    val whole = Files.readAllBytes(p)
    val rotLen = f1._2.last.length
    Files.write(p, java.util.Arrays.copyOfRange(whole, 0, whole.length - rotLen / 2))
    val m2 = new FakeMySqlMaster("repl", "", Seq(f1, f2))
    try {
      val c2 = new BinlogSpoolClient(ReplConfig("127.0.0.1", m2.port, "repl"), spool)
      val n = try c2.run() finally c2.close()
      val dump = m2.dumps.poll()
      assert(dump.pos == 4L + f1._2.dropRight(1).map(_.length).sum, dump.toString)
      assert(n == 3, s"delta was $n events") // re-sent rotate + f2's FDE + w3
      assert(Files.readAllBytes(p).sameElements(
        BinlogTestData.magic ++ f1._2.reduce(_ ++ _)))
      assert(Files.readAllBytes(spool.resolve("fake-bin.000002")).sameElements(
        BinlogTestData.magic ++ f2._2.reduce(_ ++ _)))
    } finally m2.close()
  }

  test("fde declares the checksum mode the rotate decode uses") {
    assert(fdeChecksumAlg(fdeEvent(120)) == 1)
    val noCrc = event(1700000000L, 15, 1, 120, 0, Array.fill[Byte](53)(0))
    assert(fdeChecksumAlg(noCrc) == 0)
    // a checksummed real rotate decodes to a clean next_log via the flag
    val rot = f1._2.last
    val decoded = BinlogWire.decodeRotate(rot, hasCrc = true)
    assert(decoded.getUTF8String(1).toString == "fake-bin.000002")
  }
}
