package graft.sources

import java.net.ServerSocket
import java.nio.ByteBuffer
import java.nio.ByteOrder.LITTLE_ENDIAN
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import graft.functions.{BinlogTestData, BinlogWire}
import BinlogTestData.{event, rotateBody}
import MySqlRepl._

// ---- a minimal master ----

final case class DumpRequest(name: String, pos: Long, serverId: Long)
final case class GtidDumpRequest(flags: Int, serverId: Long, name: String,
    pos: Long, gtids: String)

/** One-connection-at-a-time fake master. `files` maps binlog name →
  * events (FDE first, ROTATE last where applicable); the dump streams
  * from the requested position through the end of the chain, then EOF.
  */
final class FakeMySqlMaster(user: String, password: String,
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
