package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Wire-level proof for the MySQL binlog decoders: synthetic v4 events are
  * packed byte-for-byte per the public format (LE u32 timestamp, u8 type,
  * LE u32 server_id, LE u32 event_size, LE u32 log_pos, LE u16 flags),
  * then decoded back through the Catalyst expressions — both the
  * interpreted path (direct helper calls) and the codegen path (DataFrame
  * select over a binary column).
  */
class BinlogWireSpec extends SparkSuite {

  import BinlogTestData.{event, rotateBody}

  private val fde = event(1700000000L, 15, 1, 123, 0, Array.fill[Byte](57)(0))
  private val query = event(1700000001L, 2, 1, 456, 0,
    "BEGIN".getBytes(StandardCharsets.UTF_8))
  private val write = event(1700000002L, 30, 1, 789, 1, Array[Byte](1, 2, 3, 4))
  private val rotate = event(1700000003L, 4, 1, 999, 0x20,
    rotateBody(4L, "mysql-bin.000042"))
  private val magic = Array[Byte](0xfe.toByte, 'b', 'i', 'n')
  private val stream = magic ++ fde ++ query ++ write ++ rotate

  test("header decode round-trips every packed field") {
    val r = BinlogWire.decodeHeader(write)
    assert(r.getLong(0) == 1700000002L)           // ts_sec
    assert(r.getInt(1) == 30)                     // event_type
    assert(r.getUTF8String(2).toString == "WRITE_ROWS_EVENT")
    assert(r.getLong(3) == 1L)                    // server_id
    assert(r.getLong(4) == (19 + 4).toLong)       // event_size
    assert(r.getLong(5) == 789L)                  // log_pos
    assert(r.getInt(6) == 1)                      // flags
    assert(BinlogWire.decodeHeader(Array[Byte](1, 2, 3)) == null) // truncated
  }

  // --- TRANSACTION_PAYLOAD_EVENT (type 40) ---------------------------------

  /** Pack a type-40 container per WL#3549: TLV fields (1-byte type, 1-byte
    * length, LE value) then the end mark then the payload.
    */
  private def payloadEvent(inner: Array[Byte], zstd: Boolean,
      codecOverride: Int = -1, sizeOverride: Long = -1L): Array[Byte] = {
    val payload =
      if (zstd) com.github.luben.zstd.Zstd.compress(inner) else inner
    val codec = if (codecOverride >= 0) codecOverride else if (zstd) 0 else 255
    val declared = if (sizeOverride >= 0) sizeOverride else payload.length.toLong
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = b.write(v & 0xff)
    def u32(v: Long): Unit = (0 until 4).foreach(i => u8((v >> (8 * i)).toInt))
    u8(2); u8(1); u8(codec)             // field 2: compression type
    u8(3); u8(4); u32(inner.length.toLong) // field 3: uncompressed size
    u8(1); u8(4); u32(declared)         // field 1: payload size
    u8(0)                               // header end mark
    b.write(payload, 0, payload.length)
    event(1700000004L, 40, 1, 1111, 0, b.toByteArray)
  }

  test("transaction payload: zstd and uncompressed containers expand to inner events") {
    val inner = query ++ write
    Seq(true, false).foreach { z =>
      val fs = BinlogWire.payloadEvents(payloadEvent(inner, zstd = z), hasCrc = false)
      assert(fs.numElements() == 2, s"zstd=$z")
      assert(fs.getBinary(0).sameElements(query))
      assert(fs.getBinary(1).sameElements(write))
    }
  }

  test("transaction payload: refusal cases and checksum-free normalization") {
    val inner = query ++ write
    // unknown codec: refuse, don't guess
    assert(BinlogWire.payloadEvents(
      payloadEvent(inner, zstd = true, codecOverride = 42), hasCrc = false) == null)
    // declared payload size disagrees with the body: torn container
    assert(BinlogWire.payloadEvents(
      payloadEvent(inner, zstd = false, sizeOverride = 3L), hasCrc = false) == null)
    // torn inner stream: null, not a silent partial expand
    val torn = payloadEvent(inner.dropRight(1), zstd = false)
    assert(BinlogWire.payloadEvents(torn, hasCrc = false) == null)
    // corrupt zstd bytes (frame magic flipped): null, never an exception
    val zev = payloadEvent(inner, zstd = true)
    val payloadOff = zev.length - com.github.luben.zstd.Zstd.compress(inner).length
    zev(payloadOff) = (zev(payloadOff) ^ 0x5f).toByte
    assert(BinlogWire.payloadEvents(zev, hasCrc = false) == null)
    // non-payload events pass through; a declared CRC trailer is stripped
    // and event_size patched so the output is uniformly checksum-free
    val plain = BinlogWire.payloadEvents(write, hasCrc = false)
    assert(plain.numElements() == 1 && plain.getBinary(0).sameElements(write))
    val crc = write ++ Array[Byte](1, 2, 3, 4) // (value unchecked here)
    // patch event_size to cover the trailer like a checksumming server
    val sized = crc.clone()
    val newSize = write.length + 4
    sized(9) = (newSize & 0xff).toByte; sized(10) = ((newSize >> 8) & 0xff).toByte
    val stripped = BinlogWire.payloadEvents(sized, hasCrc = true)
    assert(stripped.numElements() == 1 && stripped.getBinary(0).sameElements(write))
  }

  test("framing splits a magic-prefixed stream and refuses truncation") {
    val fs = BinlogWire.frames(stream)
    assert(fs.numElements() == 4)
    assert(fs.getBinary(0).sameElements(fde))
    assert(fs.getBinary(3).sameElements(rotate))
    // mid-file split (no magic) works too
    assert(BinlogWire.frames(query ++ rotate).numElements() == 2)
    // a truncated tail poisons the whole split — null, not silent drop
    assert(BinlogWire.frames(stream.dropRight(1)) == null)
    assert(BinlogWire.frames(Array[Byte](1, 2)) == null)
  }

  test("rotate decode yields the reference's {name,pos} offset shape") {
    val r = BinlogWire.decodeRotate(rotate, hasCrc = false)
    assert(r.getLong(0) == 4L)
    assert(r.getUTF8String(1).toString == "mysql-bin.000042")
    assert(BinlogWire.decodeRotate(query, hasCrc = false) == null) // wrong type code
    // has_crc is an EXPLICIT flag (FDE-driven in a source), not a trailer
    // sniff — a CRC whose four bytes happen to be printable ("GOOD") must
    // still be stripped when declared, and kept when not.
    val printableCrc = "GOOD".getBytes(StandardCharsets.UTF_8)
    val withCrc = event(1700000003L, 4, 1, 999, 0,
      rotateBody(4L, "mysql-bin.000043") ++ printableCrc)
    assert(BinlogWire.decodeRotate(withCrc, hasCrc = true)
      .getUTF8String(1).toString == "mysql-bin.000043")
    assert(BinlogWire.decodeRotate(withCrc, hasCrc = false)
      .getUTF8String(1).toString == "mysql-bin.000043GOOD")
    // short names (≤4 chars) survive: nothing is guessed away
    val shortName = event(1700000003L, 4, 1, 999, 0, rotateBody(4L, "a.1"))
    assert(BinlogWire.decodeRotate(shortName, hasCrc = false)
      .getUTF8String(1).toString == "a.1")
    // declared CRC with no room for one = malformed, not a negative-length name
    val tooShort = event(1700000003L, 4, 1, 999, 0, rotateBody(4L, "ab"))
    assert(BinlogWire.decodeRotate(tooShort, hasCrc = true) == null)
  }

  test("gtid decode yields uuid:gno (the modern replication position)") {
    val sid = Array.tabulate[Byte](16)(i => (i * 16 + i).toByte) // 00112233-...
    val body = Array[Byte](1) ++ sid ++
      Array[Byte](0x39, 0x30, 0, 0, 0, 0, 0, 0) // gno = 12345 LE
    val ev = event(1700000004L, 33, 1, 1234, 0, body)
    val r = BinlogWire.decodeGtid(ev)
    assert(r.getUTF8String(0).toString == "00112233-4455-6677-8899-aabbccddeeff")
    assert(r.getLong(1) == 12345L)
    assert(r.getBoolean(2))
    assert(BinlogWire.decodeGtid(query) == null)     // wrong type
    assert(BinlogWire.decodeGtid(ev.take(30)) == null) // truncated
  }

  test("xid decode yields the u64 transaction id; query decode the BEGIN/DDL text") {
    // XID: u64 LE 0x0102030405060708
    val xidEv = event(1700000005L, 16, 1, 2000, 0,
      Array[Byte](8, 7, 6, 5, 4, 3, 2, 1))
    assert(BinlogWire.decodeXid(xidEv) == 0x0102030405060708L)
    assert(BinlogWire.decodeXid(write) == null)          // wrong type
    assert(BinlogWire.decodeXid(xidEv.take(22)) == null) // truncated

    // QUERY: thread 7, exec 3s, schema "shop", 2 status-var bytes, DDL text
    def queryBody(sql: String): Array[Byte] = {
      val schema = "shop".getBytes(StandardCharsets.UTF_8)
      Array[Byte](7, 0, 0, 0) ++ Array[Byte](3, 0, 0, 0) ++
        Array[Byte](schema.length.toByte) ++ Array[Byte](0, 0) ++
        Array[Byte](2, 0) ++ Array[Byte](0x51, 0x52) ++ // status vars (skipped)
        schema ++ Array[Byte](0) ++ sql.getBytes(StandardCharsets.UTF_8)
    }
    val q = event(1700000006L, 2, 1, 2100, 0, queryBody("ALTER TABLE orders ADD c INT"))
    val r = BinlogWire.decodeQuery(q, hasCrc = false)
    assert(r.getLong(0) == 7L && r.getLong(1) == 3L && r.getInt(2) == 0)
    assert(r.getUTF8String(3).toString == "shop")
    assert(r.getUTF8String(4).toString == "ALTER TABLE orders ADD c INT")
    // with a CRC trailer, the declared flag excludes exactly those 4 bytes
    val qCrc = event(1700000006L, 2, 1, 2100, 0,
      queryBody("BEGIN") ++ Array[Byte](1, 2, 3, 4))
    assert(BinlogWire.decodeQuery(qCrc, hasCrc = true)
      .getUTF8String(4).toString == "BEGIN")
    assert(BinlogWire.decodeQuery(qCrc, hasCrc = false)
      .getUTF8String(4).toString != "BEGIN") // trailer bleeds in when undeclared
    assert(BinlogWire.decodeQuery(write, hasCrc = false) == null) // wrong type
    assert(BinlogWire.decodeQuery(q.take(25), hasCrc = false) == null) // truncated
  }

  test("codegen path: frames + header + rotate as DataFrame expressions") {
    import spark.implicits._
    val df = Seq(stream).toDF("raw")
      .select(explode(BinlogWire.binlog_frames(col("raw"))).as("ev"))
      .select(
        BinlogWire.binlog_header(col("ev")).as("h"),
        BinlogWire.binlog_rotate(col("ev")).as("rot"))
    val rows = df.collect()
    assert(rows.length == 4)
    val names = rows.map(_.getStruct(0).getAs[String]("type_name")).toSeq
    assert(names == Seq("FORMAT_DESCRIPTION_EVENT", "QUERY_EVENT",
      "WRITE_ROWS_EVENT", "ROTATE_EVENT"))
    // log positions decode in order; rotate struct only on the rotate event
    assert(rows.map(_.getStruct(0).getAs[Long]("log_pos")).toSeq ==
      Seq(123L, 456L, 789L, 999L))
    assert(rows.take(3).forall(_.isNullAt(1)))
    assert(rows(3).getStruct(1).getAs[String]("next_log") == "mysql-bin.000042")
    // and the SQL-function surface resolves after registration
    GraftExtensions.register(spark)
    Seq(stream).toDF("raw").createOrReplaceTempView("binlog_raw")
    val viaSql = spark.sql(
      "SELECT binlog_header(f).type_name AS t FROM " +
        "(SELECT explode(binlog_frames(raw)) AS f FROM binlog_raw)")
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == names)
    // SQL binlog_rotate takes the optional has_crc literal like binlog_rows_json
    val crcStripped = spark.sql(
      "SELECT binlog_rotate(f, true).next_log AS n FROM " +
        "(SELECT explode(binlog_frames(raw)) AS f FROM binlog_raw) WHERE " +
        "binlog_rotate(f, true) IS NOT NULL")
      .collect().map(_.getString(0)).toSeq
    assert(crcStripped == Seq("mysql-bin.00")) // 4 declared-CRC bytes dropped
  }

  test("crc32 integrity check accepts real trailers and catches any bit flip") {
    def withCrc(body: Array[Byte]): Array[Byte] = {
      val payload = event(1700000010L, 30, 1, 555, 0, body ++ Array[Byte](0, 0, 0, 0))
        .dropRight(4)
      val c = new java.util.zip.CRC32
      c.update(payload)
      val t = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(c.getValue.toInt).array()
      payload ++ t
    }
    val rnd = new scala.util.Random(11)
    (1 to 50).foreach { _ =>
      val ev = withCrc(Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte))
      assert(BinlogWire.crc32Ok(ev) == java.lang.Boolean.TRUE)
      // flip one random bit anywhere (header, body, or trailer): must fail
      val flipped = ev.clone()
      val bit = rnd.nextInt(ev.length * 8)
      flipped(bit / 8) = (flipped(bit / 8) ^ (1 << (bit % 8))).toByte
      assert(BinlogWire.crc32Ok(flipped) == java.lang.Boolean.FALSE)
    }
    assert(BinlogWire.crc32Ok(Array[Byte](1, 2, 3)) == null) // too short
    // codegen path over a DataFrame (and null for the unchecksummed event)
    import spark.implicits._
    val good = withCrc(Array[Byte](9, 9, 9))
    val rows = Seq(("good", good), ("bad", good.map(b => (b ^ 1).toByte)),
      ("short", Array[Byte](1)))
      .toDF("k", "ev")
      .select(col("k"), BinlogWire.binlog_crc32_ok(col("ev")).as("ok"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1)))
      .toMap
    assert(rows("good") == true && rows("bad") == false && rows("short") == null)
  }

  test("randomized framing round-trip: any event sequence splits back exactly") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val events = (1 to rnd.nextInt(8)).map { i =>
        event(rnd.nextLong() & 0xffffffffL, rnd.nextInt(256), 1, i, 0,
          Array.fill[Byte](rnd.nextInt(100))(rnd.nextInt().toByte))
      }
      val withMagic = rnd.nextBoolean()
      val stream = (if (withMagic) magic else Array.empty[Byte]) ++
        events.foldLeft(Array.empty[Byte])(_ ++ _)
      val fs = BinlogWire.frames(stream)
      assert(fs.numElements() == events.size)
      events.zipWithIndex.foreach { case (e, i) =>
        assert(fs.getBinary(i).sameElements(e))
      }
    }
  }

  test("randomized header round-trip (packing is the inverse of decode)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val ts = rnd.nextLong() & 0xffffffffL
      val tpe = rnd.nextInt(256)
      val sid = rnd.nextLong() & 0xffffffffL
      val pos = rnd.nextLong() & 0xffffffffL
      val flags = rnd.nextInt(0x10000)
      val body = Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte)
      val r = BinlogWire.decodeHeader(event(ts, tpe, sid, pos, flags, body))
      assert(r.getLong(0) == ts && r.getInt(1) == tpe && r.getLong(3) == sid &&
        r.getLong(4) == BinlogWire.HeaderLen + body.length &&
        r.getLong(5) == pos && r.getInt(6) == flags)
    }
  }
}
