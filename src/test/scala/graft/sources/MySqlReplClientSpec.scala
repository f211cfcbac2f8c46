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

  // ---- a minimal master ----

  private case class DumpRequest(name: String, pos: Long, serverId: Long)
  private case class GtidDumpRequest(flags: Int, serverId: Long, name: String,
      pos: Long, gtids: String)

  /** One-connection-at-a-time fake master. `files` maps binlog name →
    * events (FDE first, ROTATE last where applicable); the dump streams
    * from the requested position through the end of the chain, then EOF.
    */
  private final class FakeMaster(user: String, password: String,
      files: Seq[(String, Seq[Array[Byte]])],
      authPlugin: String = NativePasswordPlugin,
      sha2Cached: Boolean = true,
      mariadb: Boolean = false) extends AutoCloseable {

    private val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    val dumps = new ConcurrentLinkedQueue[DumpRequest]()
    val gtidDumps = new ConcurrentLinkedQueue[GtidDumpRequest]()
    val ready = new CountDownLatch(1)
    @volatile var authFailure: String = _
    @volatile var sawFullAuth = false
    @volatile var connectState: String = _ // MariaDB @slave_connect_state

    private val seed: Array[Byte] =
      Array.tabulate[Byte](20)(i => (i * 7 + 3).toByte)

    // the full-auth path's server keypair (only generated when exercised)
    private lazy val rsaKeys: java.security.KeyPair = {
      val gen = java.security.KeyPairGenerator.getInstance("RSA")
      gen.initialize(2048)
      gen.generateKeyPair()
    }

    private def pemPublicKey: String =
      "-----BEGIN PUBLIC KEY-----\n" +
        java.util.Base64.getMimeEncoder(64, "\n".getBytes(UTF_8))
          .encodeToString(rsaKeys.getPublic.getEncoded) +
        "\n-----END PUBLIC KEY-----\n"

    private def sha1(bs: Array[Byte]*): Array[Byte] = {
      val d = MessageDigest.getInstance("SHA-1")
      bs.foreach(d.update)
      d.digest()
    }

    private def sha256(bs: Array[Byte]*): Array[Byte] = {
      val d = MessageDigest.getInstance("SHA-256")
      bs.foreach(d.update)
      d.digest()
    }

    private def handshakePayload: Array[Byte] = {
      val version = (if (mariadb) "5.5.5-10.6.99-MariaDB-fake" else "8.0.99-fake")
        .getBytes(UTF_8)
      val plugin = authPlugin.getBytes(UTF_8)
      val b = ByteBuffer.allocate(1 + version.length + 1 + 4 + 8 + 1 + 2 +
        1 + 2 + 2 + 1 + 10 + 13 + plugin.length + 1).order(LITTLE_ENDIAN)
      b.put(10.toByte).put(version).put(0.toByte)
      b.putInt(42) // thread id
      b.put(seed, 0, 8).put(0.toByte)
      val caps = ClientProtocol41 | ClientSecureConnection | ClientPluginAuth
      b.putShort((caps & 0xffff).toShort)
      b.put(33.toByte).putShort(0.toShort)
      b.putShort(((caps >> 16) & 0xffff).toShort)
      b.put(21.toByte) // auth data length (8 + 12 + NUL)
      b.put(new Array[Byte](10))
      b.put(seed, 8, 12).put(0.toByte)
      b.put(plugin).put(0.toByte)
      b.array()
    }

    /** The server's own check — stored = SHA1(SHA1(password)). */
    private def verifyScramble(response: Array[Byte]): Boolean = {
      if (password.isEmpty) return response.isEmpty
      val stored = sha1(sha1(password.getBytes(UTF_8)))
      if (response.length != 20) return false
      val mask = sha1(seed, stored)
      val token = response.zip(mask).map { case (a, b) => (a ^ b).toByte }
      sha1(token).sameElements(stored)
    }

    private def parseLogin(p: Array[Byte]): (String, Array[Byte]) = {
      var i = 4 + 4 + 1 + 23
      val userEnd = p.indexOf(0.toByte, i)
      val u = new String(p, i, userEnd - i, UTF_8)
      i = userEnd + 1
      val n = p(i) & 0xff
      (u, java.util.Arrays.copyOfRange(p, i + 1, i + 1 + n))
    }

    private val okPacket = Array[Byte](0x00, 0, 0, 0, 0)
    private def errPacket: Array[Byte] =
      Array[Byte](0xff.toByte, 0x15, 0x04) ++ "#28000Access denied".getBytes(UTF_8)

    /** The server's own caching_sha2 fast check — `stored =
      * SHA256(SHA256(password))` is what the server caches; recover
      * SHA256(password) from the token via the mask and re-hash it. An
      * independent derivation, so a broken client scramble cannot pass.
      */
    private def verifySha2Fast(response: Array[Byte]): Boolean = {
      if (password.isEmpty) return response.isEmpty
      if (response.length != 32) return false
      val stored = sha256(sha256(password.getBytes(UTF_8)))
      val mask = sha256(stored, seed)
      val recovered = response.zip(mask).map { case (a, b) => (a ^ b).toByte }
      sha256(recovered).sameElements(stored)
    }

    /** Post-HandshakeResponse auth: native verify, sha2 fast-auth, or the
      * sha2 full-auth conversation (0x04, RSA key request/served PEM,
      * decrypt + XOR-unmask, compare). True on OK sent.
      */
    private def authenticateClient(io: PacketIO): Boolean = {
      val (_, login) = io.read()
      val (u, token) = parseLogin(login)
      if (u != user) {
        authFailure = s"user=$u"
        io.write(2, errPacket)
        return false
      }
      authPlugin match {
        case NativePasswordPlugin =>
          if (verifyScramble(token)) { io.write(2, okPacket); true }
          else {
            authFailure = s"native tokenLen=${token.length}"
            io.write(2, errPacket); false
          }
        case CachingSha2Plugin if sha2Cached =>
          if (verifySha2Fast(token)) {
            io.write(2, Array[Byte](0x01, 0x03)) // fast_auth_success
            io.write(3, okPacket)
            true
          } else {
            authFailure = s"sha2 tokenLen=${token.length}"
            io.write(2, errPacket); false
          }
        case CachingSha2Plugin =>
          sawFullAuth = true
          io.write(2, Array[Byte](0x01, 0x04)) // perform_full_authentication
          val (_, req) = io.read()
          if (!(req.length == 1 && req(0) == 0x02)) {
            authFailure = "expected RSA public key request"
            io.write(4, errPacket)
            return false
          }
          io.write(4, 0x01.toByte +: pemPublicKey.getBytes(UTF_8))
          val (_, enc) = io.read()
          val plain =
            try {
              val c = javax.crypto.Cipher.getInstance(
                "RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
              c.init(javax.crypto.Cipher.DECRYPT_MODE, rsaKeys.getPrivate)
              val xored = c.doFinal(enc)
              xored.zipWithIndex.map { case (b, i) => (b ^ seed(i % seed.length)).toByte }
            } catch { case _: Exception => Array.empty[Byte] }
          if (plain.sameElements(password.getBytes(UTF_8) :+ 0.toByte)) {
            io.write(6, okPacket)
            true
          } else {
            authFailure = "full-auth password mismatch"
            io.write(6, errPacket)
            false
          }
        case other =>
          authFailure = s"fake master cannot speak $other"
          io.write(2, errPacket)
          false
      }
    }

    /** AuthSwitchRequest path: the advertised plugin differs from the
      * account's — the server answers the HandshakeResponse with 0xFE +
      * plugin + a FRESH nonce, and the client must re-scramble against
      * that nonce, not the handshake seed.
      */
    @volatile var switchToNative = false
    private val switchSeed: Array[Byte] =
      Array.tabulate[Byte](20)(i => (i * 13 + 5).toByte)

    private def authViaSwitch(io: PacketIO): Boolean = {
      io.read() // the original HandshakeResponse (scrambled for sha2)
      io.write(2, Array[Byte](0xfe.toByte) ++
        NativePasswordPlugin.getBytes(UTF_8) ++ Array[Byte](0) ++
        switchSeed ++ Array[Byte](0))
      val (_, token) = io.read()
      val stored = sha1(sha1(password.getBytes(UTF_8)))
      val ok = token.length == 20 && {
        val mask = sha1(switchSeed, stored)
        val recovered = token.zip(mask).map { case (a, b) => (a ^ b).toByte }
        sha1(recovered).sameElements(stored)
      }
      if (ok) { io.write(4, okPacket); true }
      else { authFailure = "switch scramble rejected"; io.write(4, errPacket); false }
    }

    private val thread = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          try {
            sock.setTcpNoDelay(true)
            val io = new PacketIO(sock.getInputStream, sock.getOutputStream)
            io.write(0, handshakePayload)
            if (if (switchToNative) authViaSwitch(io) else authenticateClient(io)) {
              var dumping = true
              while (dumping) {
                val (_, cmd) = io.read()
                (cmd(0) & 0xff) match {
                  case 0x03 => // COM_QUERY: capture MariaDB resume state
                    val sql = new String(cmd, 1, cmd.length - 1, UTF_8)
                    val statePrefix = "SET @slave_connect_state='"
                    if (sql.startsWith(statePrefix))
                      connectState = sql.stripPrefix(statePrefix).stripSuffix("'")
                    io.write(1, Array[Byte](0x00, 0, 0, 0, 0))
                  case 0x15 => // COM_REGISTER_SLAVE
                    io.write(1, Array[Byte](0x00, 0, 0, 0, 0))
                  case 0x12 =>
                    val pos = java.lang.Integer.toUnsignedLong(
                      ByteBuffer.wrap(cmd, 1, 4).order(LITTLE_ENDIAN).getInt)
                    val name = new String(cmd, 11, cmd.length - 11, UTF_8)
                    dumps.add(DumpRequest(name, pos, java.lang.Integer.toUnsignedLong(
                      ByteBuffer.wrap(cmd, 7, 4).order(LITTLE_ENDIAN).getInt)))
                    if (mariadb && connectState != null)
                      streamMariaDump(io, MariaGtidSet.parse(connectState))
                    else streamDump(io, name, pos)
                    dumping = false
                  case 0x1e => // COM_BINLOG_DUMP_GTID
                    val b = ByteBuffer.wrap(cmd, 1, cmd.length - 1).order(LITTLE_ENDIAN)
                    val flags = b.getShort & 0xffff
                    val sid = java.lang.Integer.toUnsignedLong(b.getInt)
                    val nameLen = b.getInt
                    val nameBytes = new Array[Byte](nameLen); b.get(nameBytes)
                    val reqPos = b.getLong
                    val dataLen = b.getInt
                    val data = new Array[Byte](dataLen); b.get(data)
                    val have = GtidSet.decode(data)
                    gtidDumps.add(GtidDumpRequest(flags, sid,
                      new String(nameBytes, UTF_8), reqPos, have.text))
                    streamGtidDump(io, have)
                    dumping = false
                  case other =>
                    io.write(1, Array[Byte](0xff.toByte, 0x47, 0x04) ++
                      s"#42000unknown command $other".getBytes(UTF_8))
                }
              }
            }
          } finally sock.close()
        }
      } catch { case _: Exception => () } // closed
    })

    /** mysqld's dump shape: a synthetic ROTATE (timestamp 0) announces
      * EVERY file the dump opens; on a mid-file resume the file's FDE is
      * re-sent as descriptive (log_pos 0); then every event at byte ≥ pos,
      * walking the file chain; EOF at the end.
      */
    private def streamDump(io: PacketIO, reqName: String, reqPos: Long): Unit = {
      var seq = 1
      def send(ev: Array[Byte]): Unit = { io.write(seq, 0x00.toByte +: ev); seq += 1 }
      val startName = if (reqName.isEmpty) files.head._1 else reqName
      val startIdx = files.indexWhere(_._1 == startName)
      require(startIdx >= 0, s"fake master has no $startName")
      files.drop(startIdx).zipWithIndex.foreach { case ((name, evs), k) =>
        val from = if (k == 0) math.max(reqPos, 4L) else 4L
        send(event(0L, 4, 1, 0, 0x20, rotateBody(from, name)))
        var byte = 4L
        evs.zipWithIndex.foreach { case (ev, i) =>
          if (byte >= from) send(ev)
          else if (i == 0 && from > 4L) {
            // mid-file resume: the FDE is re-sent as descriptive (log_pos 0)
            val fde = ev.clone()
            ByteBuffer.wrap(fde).order(LITTLE_ENDIAN).putInt(13, 0)
            send(fde)
          }
          byte += ev.length
        }
      }
      if (liveMode) streamLive(io, seq)
      else io.write(seq, Array[Byte](0xfe.toByte, 0, 0))
    }

    /** mysqld's GTID dump shape: start at the first FILE containing a
      * transaction the replica is missing; within a file, stream
      * everything EXCEPT transaction groups the replica's set contains
      * (a group = its GTID event through the next GTID/ROTATE); FDE and
      * ROTATE always stream.
      */
    private def streamGtidDump(io: PacketIO, have: GtidSet): Unit = {
      var seq = 1
      def send(ev: Array[Byte]): Unit = { io.write(seq, 0x00.toByte +: ev); seq += 1 }
      def missing(evs: Seq[Array[Byte]]): Boolean = evs.exists { ev =>
        val g = BinlogWire.decodeGtid(ev)
        g != null && !have.contains(g.getUTF8String(0).toString, g.getLong(1))
      }
      val startIdx = math.max(0, files.indexWhere(f => missing(f._2)))
      files.drop(startIdx).foreach { case (name, evs) =>
        send(event(0L, 4, 1, 0, 0x20, rotateBody(4L, name)))
        var skip = false
        evs.foreach { ev =>
          val tpe = BinlogWire.decodeHeader(ev).getInt(1)
          val g = if (tpe == 33) BinlogWire.decodeGtid(ev) else null
          if (g != null) skip = have.contains(g.getUTF8String(0).toString, g.getLong(1))
          else if (tpe == 4 || tpe == 15) skip = false
          if (!skip) send(ev)
        }
      }
      io.write(seq, Array[Byte](0xfe.toByte, 0, 0))
    }

    /** Live mode: after the initial chain, hold the dump open and trickle
      * whatever the test pushes — the shape of a real master that stays
      * connected and streams commits as they happen.
      */
    val live = new java.util.concurrent.LinkedBlockingQueue[Array[Byte]]()
    @volatile var liveMode = false

    private def streamLive(io: PacketIO, seq0: Int): Unit = {
      var seq = seq0
      try {
        while (!server.isClosed) {
          val ev = live.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS)
          if (ev != null) { io.write(seq, 0x00.toByte +: ev); seq += 1 }
        }
      } catch { case _: Exception => () } // client went away
    }

    /** MariaDB's GTID-state dump shape: the master SEEKS to the position
      * itself — it finds the first event whose MariaDB GTID (type 162) the
      * replica's `@slave_connect_state` does not cover, then streams a
      * synthetic ROTATE naming that file, the file's FDE re-sent as
      * descriptive (log_pos 0), and every event from that GTID onward;
      * later files stream whole. No per-group filtering — position-based,
      * unlike MySQL's set-complement dump.
      */
    private def streamMariaDump(io: PacketIO, have: MariaGtidSet): Unit = {
      var seq = 1
      def send(ev: Array[Byte]): Unit = { io.write(seq, 0x00.toByte +: ev); seq += 1 }
      def firstMissing(evs: Seq[Array[Byte]]): Int = evs.indexWhere { ev =>
        val g = BinlogWire.decodeMariaGtid(ev)
        g != null && !have.contains(g.getLong(0), g.getLong(2))
      }
      val startIdx = files.indexWhere(f => firstMissing(f._2) >= 0)
      if (startIdx < 0) { io.write(seq, Array[Byte](0xfe.toByte, 0, 0)); return }
      files.drop(startIdx).zipWithIndex.foreach { case ((name, evs), k) =>
        // seek to the missing GTID — but when it is the file's FIRST GTID,
        // the position is the file start and the preamble streams too
        val miss = if (k == 0) firstMissing(evs) else 0
        val firstGtid = evs.indexWhere(BinlogWire.decodeMariaGtid(_) != null)
        val from = if (miss <= firstGtid) 0 else miss
        val pos = 4L + evs.take(from).map(_.length).sum
        send(event(0L, 4, 1, 0, 0x20, rotateBody(pos, name)))
        if (from > 0) { // mid-file seek: FDE re-sent as descriptive
          val fde = evs.head.clone()
          ByteBuffer.wrap(fde).order(LITTLE_ENDIAN).putInt(13, 0)
          send(fde)
        }
        evs.drop(from).foreach(send)
      }
      io.write(seq, Array[Byte](0xfe.toByte, 0, 0))
    }

    thread.start()
    override def close(): Unit = { server.close(); thread.join(5000) }
  }

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
    val m = new FakeMaster("u", "p", Seq(f1))
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
    val m = new FakeMaster("repl", "hunter2", Seq(f1, f2))
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

  test("resume: a second run dumps from the spool end, appends only the delta") {
    val m1 = new FakeMaster("repl", "", Seq(f1))
    val spool = Files.createTempDirectory("repl_resume")
    try {
      val c1 = new BinlogSpoolClient(ReplConfig("127.0.0.1", m1.port, "repl"), spool)
      try c1.run() finally c1.close()
    } finally m1.close()
    val before = Files.readAllBytes(spool.resolve("fake-bin.000001"))
    // master has moved on: file 2 exists now; replica must resume mid-chain
    val m2 = new FakeMaster("repl", "", Seq(f1, f2))
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
    val m = new FakeMaster("repl", "right", Seq(f1))
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
    val m = new FakeMaster("repl", "hunter2", Seq(f1, f2),
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
    val m = new FakeMaster("repl", "s3cret!", Seq(f1),
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
    val m = new FakeMaster("repl", "pw!", Seq(f1), authPlugin = CachingSha2Plugin)
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
    val fast = new FakeMaster("repl", "right", Seq(f1),
      authPlugin = CachingSha2Plugin)
    try {
      val spool = Files.createTempDirectory("repl_sha2_badfast")
      val c = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", fast.port, "repl", "wrong"), spool)
      val err = intercept[IOException] { try c.run() finally c.close() }
      assert(err.getMessage.contains("Access denied"), err.getMessage)
    } finally fast.close()
    val full = new FakeMaster("repl", "right", Seq(f1),
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
    val m = new FakeMaster("repl", "", Seq(f1, f2))
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
    val m = new FakeMaster("repl", "", Seq(f1, f2))
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
    val m = new FakeMaster("repl", "", Seq(g1, g2))
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
    val m1 = new FakeMaster("repl", "", Seq(g1, g2))
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
    val m2 = new FakeMaster("repl", "", Seq(g1, g2grown))
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
    val m1 = new FakeMaster("repl", "", Seq(h1, h2), mariadb = true)
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
    val m2 = new FakeMaster("repl", "", Seq(h1, h2grown), mariadb = true)
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
    val m1 = new FakeMaster("repl", "", Seq(h1, h2torn), mariadb = true)
    try {
      val c1 = new BinlogSpoolClient(
        ReplConfig("127.0.0.1", m1.port, "repl", useGtid = true,
          flavor = "mariadb"), spool)
      try c1.run() finally c1.close()
    } finally m1.close()
    val probe = new BinlogSpoolClient(
      ReplConfig("127.0.0.1", 1, "repl", useGtid = true, flavor = "mariadb"), spool)
    assert(probe.resumeMariaGtidSet().text == "0-1-3")
    val m2 = new FakeMaster("repl", "", Seq(h1, h2grown), mariadb = true)
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
    val m1 = new FakeMaster("repl", "", Seq(g1, g2torn))
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
    val m2 = new FakeMaster("repl", "", Seq(g1, g2grown))
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

  test("position resume truncates a torn trailing frame before appending") {
    // a crash mid-append leaves half an event frame at the spool tail; the
    // resume dumps from the last COMPLETE event, so the re-sent bytes must
    // land where the torn frame was, not after it
    val spool = Files.createTempDirectory("repl_torn_frame")
    val m1 = new FakeMaster("repl", "", Seq(f1))
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
    val m2 = new FakeMaster("repl", "", Seq(f1, f2))
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
