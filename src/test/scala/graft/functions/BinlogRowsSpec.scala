package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Row-image decode over hand-packed v2 ROWS + TABLE_MAP fixtures: value
  * round-trips per column type (signed ints, floats, 1- and 2-byte-length
  * VARCHAR, NULLs), UPDATE before/after pairing, the CRC flag, and the
  * refuse-don't-guess cases (table-id mismatch, unsupported type,
  * truncation).
  */
class BinlogRowsSpec extends SparkSuite {

  import BinlogTestData.event

  // --- little-endian packers ---------------------------------------------
  private class Buf {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Buf = { out.write(v & 0xff); this }
    def u16(v: Int): Buf = { u8(v); u8(v >> 8) }
    def u24(v: Int): Buf = { u8(v); u8(v >> 8); u8(v >> 16) }
    def u32(v: Long): Buf = { u16(v.toInt & 0xffff); u16((v >> 16).toInt & 0xffff) }
    def u48(v: Long): Buf = { u32(v & 0xffffffffL); u16((v >> 32).toInt & 0xffff) }
    def u64(v: Long): Buf = { u32(v & 0xffffffffL); u32(v >>> 32) }
    def raw(b: Array[Byte]): Buf = { out.write(b); this }
    def str(s: String): Buf = raw(s.getBytes(StandardCharsets.UTF_8))
    def bytes: Array[Byte] = out.toByteArray
  }

  private val TableId = 0x0000abcdefL

  /** TABLE_MAP for columns (LONG, VARCHAR(20), DOUBLE, LONGLONG, TINY,
    * VARCHAR(300)).
    */
  private def tableMap(types: Seq[Int] = Seq(3, 15, 5, 8, 1, 15),
      metas: Seq[Int] = Seq(0, 20, 8, 0, 0, 300),
      optMeta: Array[Byte] = Array.empty): Array[Byte] = {
    val b = new Buf
    b.u48(TableId).u16(1)
    b.u8(3).str("db!").u8(0)   // schema name + NUL
    b.u8(2).str("tt").u8(0)    // table name + NUL
    b.u8(types.size)           // lenenc column count (< 0xfb)
    types.foreach(b.u8)
    val meta = new Buf
    types.zip(metas).foreach {
      case (5, m) => meta.u8(m)            // DOUBLE: 1-byte size
      case (15, m) => meta.u16(m)          // VARCHAR: 2-byte max length
      case (17 | 18 | 19, m) => meta.u8(m) // TIMESTAMP2/DATETIME2/TIME2: fsp
      case (246, m) => meta.u8(m >> 8).u8(m & 0xff) // NEWDECIMAL: precision, scale
      case (252, m) => meta.u8(m)          // BLOB: length-prefix width
      case (245, m) => meta.u8(m)          // JSON: length-prefix width
      case (255, m) => meta.u8(m)          // GEOMETRY: length-prefix width
      case (254 | 247 | 248, m) => meta.u8(m >> 8).u8(m & 0xff) // STRING/ENUM/SET
      case (16, m) => meta.u8(m & 0xff).u8(m >> 8) // BIT: bits%8, bytes
      case _ => ()
    }
    b.u8(meta.bytes.length).raw(meta.bytes)
    b.u8(0)        // null-allowed bitmap (unused by the decoder)
    b.raw(optMeta) // optional metadata TLVs (binlog_row_metadata=FULL)
    event(1700000100L, 19, 1, 0, 0, b.bytes)
  }

  /** One image with all six columns present: (int, varchar, double, long,
    * tiny, varchar2-byte-len); pass null for SQL NULL.
    */
  private def img(b: Buf, i: Option[Int], s: Option[String], d: Option[Double],
      l: Option[Long], t: Option[Int], s2: Option[String]): Unit = {
    val nulls = Seq(i, s, d, l, t, s2).map(_.isEmpty)
    b.u8(nulls.zipWithIndex.map { case (n, idx) => if (n) 1 << idx else 0 }.sum)
    i.foreach(v => b.u32(v & 0xffffffffL))
    s.foreach { v => val x = v.getBytes(StandardCharsets.UTF_8); b.u8(x.length).raw(x) }
    d.foreach(v => b.u64(java.lang.Double.doubleToLongBits(v)))
    l.foreach(b.u64)
    t.foreach(b.u8)
    s2.foreach { v => val x = v.getBytes(StandardCharsets.UTF_8); b.u16(x.length).raw(x) }
  }

  private def rowsEvent(tpe: Int, tableId: Long = TableId, crc: Boolean = false)(
      fill: Buf => Unit): Array[Byte] = {
    val b = new Buf
    b.u48(tableId).u16(0).u16(2) // flags + v2 extra-len (includes itself)
    b.u8(6)                      // lenenc column count
    b.u8(0x3f)                   // columns-present bitmap: all 6
    if (tpe == 31) b.u8(0x3f)    // UPDATE: after-image bitmap
    fill(b)
    if (crc) b.u32(0xdeadbeefL)
    event(1700000200L, tpe, 1, 0, 0, b.bytes)
  }

  private def decode(rows: Array[Byte], tm: Array[Byte], crc: Boolean = false): Seq[String] = {
    val r = BinlogRows.rowsJson(rows, tm, crc)
    if (r == null) null else (0 until r.numElements()).map(r.getUTF8String(_).toString)
  }

  test("WRITE: every core type round-trips, including NULLs and negatives") {
    val ev = rowsEvent(30) { b =>
      img(b, Some(-7), Some("héllo \"q\""), Some(2.5), Some(-1L), Some(200), Some("x" * 300))
      img(b, None, Some(""), None, Some(Long.MinValue), None, None)
    }
    val got = decode(ev, tableMap())
    assert(got.size == 2)
    assert(got(0) == """{"after":{"c0":-7,"c1":"héllo \"q\"","c2":2.5,"c3":-1,""" +
      s""""c4":-56,"c5":"${"x" * 300}"}}""")
    assert(got(1) == """{"after":{"c0":null,"c1":"","c2":null,"c3":-9223372036854775808,"c4":null,"c5":null}}""")
  }

  test("UPDATE pairs before/after; DELETE emits before") {
    val upd = rowsEvent(31) { b =>
      img(b, Some(1), Some("a"), Some(0.0), Some(1L), Some(0), Some("b"))
      img(b, Some(2), Some("a2"), Some(0.5), Some(1L), Some(1), Some("b2"))
    }
    val g = decode(upd, tableMap())
    assert(g == Seq("""{"before":{"c0":1,"c1":"a","c2":0.0,"c3":1,"c4":0,"c5":"b"},""" +
      """"after":{"c0":2,"c1":"a2","c2":0.5,"c3":1,"c4":1,"c5":"b2"}}"""))

    val del = rowsEvent(32) { b =>
      img(b, Some(9), None, None, None, None, None)
    }
    assert(decode(del, tableMap()) ==
      Seq("""{"before":{"c0":9,"c1":null,"c2":null,"c3":null,"c4":null,"c5":null}}"""))
  }

  test("CRC flag: trailer bytes are excluded iff declared") {
    val ev = rowsEvent(30, crc = true) { b =>
      img(b, Some(5), Some("z"), Some(1.0), Some(5L), Some(5), Some("w"))
    }
    assert(decode(ev, tableMap(), crc = true).size == 1)
    // undeclared trailer would be parsed as a torn image → whole event null
    assert(decode(ev, tableMap(), crc = false) == null)
  }

  test("refuses instead of guessing: id mismatch, unsupported type, truncation") {
    val ev = rowsEvent(30) { b =>
      img(b, Some(1), Some("a"), Some(1.0), Some(1L), Some(1), Some("b"))
    }
    assert(decode(ev, tableMap()) != null)
    // TABLE_MAP for a different table id
    val otherTm = {
      val raw = tableMap()
      val ev2 = rowsEvent(30, tableId = TableId + 1) { b =>
        img(b, Some(1), Some("a"), Some(1.0), Some(1L), Some(1), Some("b"))
      }
      decode(ev2, raw)
    }
    assert(otherTm == null)
    // unknown column type code (200 is unassigned in the protocol)
    assert(decode(ev, tableMap(types = Seq(200, 15, 5, 8, 1, 15))) == null)
    // truncated body
    assert(decode(ev.dropRight(3), tableMap()) == null)
  }

  test("PARTIAL_UPDATE (type 39): partial JSON columns render as json_diff vectors") {
    // (LONG, JSON, JSON) table — two JSON columns so the partial bitmap
    // walk (one bit per JSON column, consumed even for NULLs) is exercised
    val tm = tableMap(Seq(3, 245, 245), Seq(0, 4, 4))
    // a small full document for the before-image: {"a":17}
    val fullDoc = {
      val b = new Buf
      b.u8(0x00).u16(1).u16(12) // count 1, total size 12
      b.u16(11).u16(1)       // key "a" @11
      b.u8(0x05).u16(17)     // inline int16
      b.str("a")
      b.bytes
    }
    // diff vector: REPLACE $.a := 99, REMOVE $.b
    val diffVec = {
      val b = new Buf
      b.u8(0).u8(3).str("$.a")        // op REPLACE, lenenc path
      b.u8(3).u8(0x05).u16(99)        //   lenenc value len + json int16
      b.u8(2).u8(3).str("$.b")        // op REMOVE, lenenc path
      b.bytes
    }
    def ev(valueOptions: Int, partialBits: Int)(after: Buf => Unit): Array[Byte] = {
      val b = new Buf
      b.u48(TableId).u16(0).u16(2)
      b.u8(3)       // column count
      b.u8(0x7)     // before present bitmap
      b.u8(0x7)     // after present bitmap
      // before image: (1, {"a":17}, NULL)
      b.u8(4)       // null bitmap: third column NULL
      b.u32(1L); b.u32(fullDoc.length.toLong).raw(fullDoc)
      // after image: value_options + optional partial bitmap + row
      b.u8(valueOptions)
      if ((valueOptions & 1) != 0) b.u8(partialBits)
      after(b)
      event(1700000400L, 39, 1, 0, 0, b.bytes)
    }
    // PARTIAL_JSON set; col c1 NULL (still consumes a partial bit), col c2
    // partial (bit 1 → consumed as the SECOND json column's bit)
    val partial = ev(valueOptions = 1, partialBits = 0x2) { b =>
      b.u8(2) // null bitmap: second column (c1) NULL
      b.u32(7L)
      b.u32(diffVec.length.toLong).raw(diffVec)
    }
    assert(decode(partial, tm) == Seq(
      """{"before":{"c0":1,"c1":{"a":17},"c2":null},""" +
        """"after":{"c0":7,"c1":null,"c2":{"json_diff":[""" +
        """{"op":"replace","path":"$.a","value":99},""" +
        """{"op":"remove","path":"$.b"}]}}}"""))
    // value_options without PARTIAL_JSON: after-image JSON decodes as a
    // full document, no partial bitmap on the wire
    val fullAfter = ev(valueOptions = 0, partialBits = 0) { b =>
      b.u8(4) // c2 NULL
      b.u32(7L)
      b.u32(fullDoc.length.toLong).raw(fullDoc)
    }
    assert(decode(fullAfter, tm) == Seq(
      """{"before":{"c0":1,"c1":{"a":17},"c2":null},""" +
        """"after":{"c0":7,"c1":{"a":17},"c2":null}}"""))
    // PARTIAL_JSON set but this column's bit clear: full document
    val bitClear = ev(valueOptions = 1, partialBits = 0x0) { b =>
      b.u8(4)
      b.u32(7L)
      b.u32(fullDoc.length.toLong).raw(fullDoc)
    }
    assert(decode(bitClear, tm) == Seq(
      """{"before":{"c0":1,"c1":{"a":17},"c2":null},""" +
        """"after":{"c0":7,"c1":{"a":17},"c2":null}}"""))
    // unknown diff operation (7): refuse the whole event, never guess
    val badOp = ev(valueOptions = 1, partialBits = 0x2) { b =>
      b.u8(2)
      b.u32(7L)
      val bad = { val v = new Buf; v.u8(7).u8(3).str("$.a"); v.bytes }
      b.u32(bad.length.toLong).raw(bad)
    }
    assert(decode(badOp, tm) == null)
  }

  // --- extended type set: hand-packed wire values, expected text pinned ---

  /** Generic one-row WRITE_ROWS with `n` columns, all present and non-NULL
    * (the all-zero per-row null bitmap is written here; `fill` writes just
    * the column values), no CRC.
    */
  private def writeRows(n: Int)(fill: Buf => Unit): Array[Byte] = {
    val b = new Buf
    b.u48(TableId).u16(0).u16(2).u8(n)
    val nBytes = (n + 7) / 8
    (0 until nBytes).foreach { byteIdx =>
      val bits = (0 until 8).filter(i => byteIdx * 8 + i < n).map(1 << _).sum
      b.u8(bits)                      // columns-present bitmap
    }
    (0 until nBytes).foreach(_ => b.u8(0)) // null bitmap: nothing NULL
    fill(b)
    event(1700000300L, 30, 1, 0, 0, b.bytes)
  }

  private def be(b: Buf, v: Long, n: Int): Unit =
    (n - 1 to 0 by -1).foreach(i => b.u8(((v >> (8 * i)) & 0xff).toInt))

  test("new-generation temporals: DATE, DATETIME2, TIMESTAMP2, TIME2 (incl. negative+frac)") {
    val types = Seq(10, 18, 17, 19, 19, 17)
    val metas = Seq(0, 3, 0, 2, 0, 6)
    val ev = writeRows(6) { b =>
      b.u24(2026 << 9 | 8 << 5 | 13)                       // DATE 2026-08-13
      val ymdhms = (1L << 39) | ((2023L * 13 + 1) << 22) | (31L << 17) |
        (12L << 12) | (34L << 6) | 56L
      be(b, ymdhms, 5); be(b, 1230L, 2)                    // DATETIME2(3) .123
      be(b, 1700000000L, 4)                                // TIMESTAMP2(0)
      be(b, 0x80000000L - ((4L << 8) | 30L), 4)            // TIME2(2) -00:00:04.30
      be(b, 0x800000L + ((12L << 12) | (34L << 6) | 56L), 3) // TIME2(0) 12:34:56
      be(b, 1700000000L, 4); be(b, 123456L, 3)             // TIMESTAMP2(6)
    }
    assert(decode(ev, tableMap(types, metas)) == Seq(
      """{"after":{"c0":"2026-08-13","c1":"2023-01-31T12:34:56.123",""" +
        """"c2":"2023-11-14T22:13:20Z","c3":"-00:00:04.30","c4":"12:34:56",""" +
        """"c5":"2023-11-14T22:13:20.123456Z"}}"""))
  }

  test("old-generation temporals: TIMESTAMP, DATETIME, TIME") {
    val ev = writeRows(3) { b =>
      b.u32(1700000000L)        // TIMESTAMP: LE UTC seconds
      b.u64(20260813123456L)    // DATETIME: literal YYYYMMDDHHMMSS
      b.u24(-4 & 0xffffff)      // TIME: signed literal HHMMSS
    }
    assert(decode(ev, tableMap(Seq(7, 12, 11), Seq(0, 0, 0))) == Seq(
      """{"after":{"c0":"2023-11-14T22:13:20Z","c1":"2026-08-13T12:34:56","c2":"-00:00:04"}}"""))
  }

  test("NEWDECIMAL: negative scaled, multi-group, and -0 canonicalization") {
    // DECIMAL(10,2) = -1234567.89; DECIMAL(20,0) spanning a partial + two
    // full base-10^9 groups; DECIMAL(10,2) negative zero -> "0.00"
    val types = Seq(246, 246, 246)
    val metas = Seq((10 << 8) | 2, (20 << 8) | 0, (10 << 8) | 2)
    val ev = writeRows(3) { b =>
      def flipped(bytes: Seq[Int]): Unit = bytes.foreach(v => b.u8(~v & 0xff))
      // +1234567.89 packs as [0x80|int4][frac1]; negative = complement
      val pos1 = { val x = new Buf; be(x, 1234567L, 4); x.bytes.toSeq.map(_ & 0xff) }
      flipped((pos1.head | 0x80) +: pos1.tail :+ 89)
      // 12345678901234567890 = rem-group 12 (1 byte) + 345678901 + 234567890
      val x2 = new Buf
      x2.u8(12 | 0x80); be(x2, 345678901L, 4); be(x2, 234567890L, 4)
      x2.bytes.foreach(v => b.u8(v & 0xff))
      // negative zero: complement of [0x80,0,0,0][0]
      flipped(Seq(0x80, 0, 0, 0, 0))
    }
    assert(decode(ev, tableMap(types, metas)) == Seq(
      """{"after":{"c0":-1234567.89,"c1":12345678901234567890,"c2":0.00}}"""))
  }

  test("BIT, BLOB/TEXT widths, CHAR, ENUM ordinal, SET bitmask, wide CHAR") {
    val types = Seq(16, 252, 254, 254, 254, 254)
    val metas = Seq(
      (1 << 8) | 4,      // BIT(12): 1 byte + 4 bits
      2,                 // BLOB with 2-byte length prefix (a TEXT column)
      (254 << 8) | 10,   // CHAR, max 10 bytes
      (247 << 8) | 1,    // ENUM, 1-byte ordinal
      (248 << 8) | 2,    // SET, 2-byte bitmask
      (0xee << 8) | 0x2c // CHAR(300 bytes): munged high-length metadata
    )
    val wide = "y" * 260
    val ev = writeRows(6) { b =>
      be(b, 2748L, 2)                                   // BIT 0x0ABC
      val blob = "héllo".getBytes(StandardCharsets.UTF_8)
      b.u16(blob.length).raw(blob)
      b.u8(3).str("abc")
      b.u8(2)
      b.u16(5)
      b.u16(wide.length).str(wide)
    }
    assert(decode(ev, tableMap(types, metas)) == Seq(
      s"""{"after":{"c0":2748,"c1":"héllo","c2":"abc","c3":2,"c4":5,"c5":"$wide"}}"""))
  }

  test("FULL row metadata: real column names, signedness, enum/set labels") {
    def tlv(tpe: Int)(fill: Buf => Unit): Array[Byte] = {
      val body = new Buf; fill(body)
      val b = new Buf
      b.u8(tpe).u8(body.bytes.length) // lenenc length < 251 = one byte
      b.raw(body.bytes).bytes
    }
    def named(ns: String*): Array[Byte] = tlv(4) { b =>
      ns.foreach { n => b.u8(n.length).str(n) }
    }

    // column names become the JSON keys (instead of positional c0..cN)
    val tmNames = tableMap(Seq(3, 15), Seq(0, 20), optMeta = named("id", "name"))
    val ev1 = writeRows(2) { b =>
      b.u32(7L)
      b.u8(3).str("abc")
    }
    assert(decode(ev1, tmNames) == Seq("""{"after":{"id":7,"name":"abc"}}"""))

    // SIGNEDNESS: MSB-first bits over numeric columns — unsigned TINY and
    // BIGINT render their full unsigned range instead of going negative
    val signed = tlv(1)(_.u8(0xC0)) // both numeric cols unsigned
    val tmU = tableMap(Seq(1, 8), Seq(0, 0), optMeta = signed ++ named("flags", "big"))
    val ev2 = writeRows(2) { b =>
      b.u8(0xFF)
      b.u64(-1L)
    }
    assert(decode(ev2, tmU) ==
      Seq("""{"after":{"flags":255,"big":18446744073709551615}}"""))
    // without the metadata the same bytes decode signed (the old fallback)
    assert(decode(ev2, tableMap(Seq(1, 8), Seq(0, 0))) ==
      Seq("""{"after":{"c0":-1,"c1":-1}}"""))

    // ENUM/SET labels from the wire: ordinals/bitmasks render as text
    val enumLabels = tlv(6) { b =>
      b.u8(3) // 3 labels for the one enum column
      Seq("red", "green", "blue").foreach(l => b.u8(l.length).str(l))
    }
    val setLabels = tlv(5) { b =>
      b.u8(3)
      Seq("a", "b", "c").foreach(l => b.u8(l.length).str(l))
    }
    val tmES = tableMap(Seq(254, 254), Seq((247 << 8) | 1, (248 << 8) | 1),
      optMeta = enumLabels ++ setLabels)
    val ev3 = writeRows(2) { b =>
      b.u8(2)    // enum ordinal 2 -> green
      b.u8(0x5)  // set bitmask 101 -> a,c
    }
    assert(decode(ev3, tmES) == Seq("""{"after":{"c0":"green","c1":"a,c"}}"""))
    // without labels: the wire ordinal/bitmask fallback
    assert(decode(ev3, tableMap(Seq(254, 254), Seq((247 << 8) | 1, (248 << 8) | 1))) ==
      Seq("""{"after":{"c0":2,"c1":5}}"""))

    // truncated optional metadata abandons the optional part, never the row
    val torn = named("id", "name").dropRight(2)
    assert(decode(ev1, tableMap(Seq(3, 15), Seq(0, 20), optMeta = torn)) ==
      Seq("""{"after":{"c0":7,"c1":"abc"}}"""))
  }

  test("GEOMETRY: SRID + WKB render as {srid, wkb-hex}; headerless refuses") {
    // POINT(1 2), SRID 4326 — the internal layout is u32 LE SRID + OGC WKB
    val wkbPoint = Array[Byte](1, 1, 0, 0, 0) ++
      java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putDouble(1.0).putDouble(2.0).array()
    val tm = tableMap(Seq(255), Seq(4)) // 4-byte length prefix
    val ev = writeRows(1) { b =>
      b.u32(4L + wkbPoint.length)
      b.u32(4326L)
      b.raw(wkbPoint)
    }
    assert(decode(ev, tm) == Seq(
      """{"after":{"c0":{"srid":4326,"wkb":"0101000000000000000000f03f0000000000000040"}}}"""))
    // a payload too short for the SRID header refuses the event, loudly
    val torn = writeRows(1) { b => b.u32(3L); b.raw(Array[Byte](1, 2, 3)) }
    assert(decode(torn, tm) == null)
  }

  test("torn TLV drops signedness with the rest; 64-member SET renders labels") {
    def tlv(tpe: Int)(fill: Buf => Unit): Array[Byte] = {
      val body = new Buf; fill(body)
      val b = new Buf
      b.u8(tpe).u8(body.bytes.length)
      b.raw(body.bytes).bytes
    }
    def named(ns: String*): Array[Byte] = tlv(4) { b =>
      ns.foreach { n => b.u8(n.length).str(n) }
    }

    // a TLV block that throws AFTER SIGNEDNESS parsed must not leave
    // signedness applied while names/labels were dropped — the fallback
    // state is fully positional AND signed
    val signed = tlv(1)(_.u8(0xC0))
    val torn = signed ++ named("flags", "big").dropRight(2)
    val ev = writeRows(2) { b =>
      b.u8(0xFF)
      b.u64(-1L)
    }
    assert(decode(ev, tableMap(Seq(1, 8), Seq(0, 0), optMeta = torn)) ==
      Seq("""{"after":{"c0":-1,"c1":-1}}"""))

    // a maximal 64-member SET: JVM long shifts are mod 64, so the
    // out-of-range-bit guard must special-case labels.length >= 64 —
    // bits 0 and 63 set render as labels, not as the numeric bitmask
    val set64 = tlv(5) { b =>
      b.u8(64)
      (0 until 64).foreach(_ => b.u8(1).str("a"))
    }
    val tm64 = tableMap(Seq(254), Seq((248 << 8) | 8), optMeta = set64)
    val ev64 = writeRows(1)(_.u64(0x8000000000000001L))
    assert(decode(ev64, tm64) == Seq("""{"after":{"c0":"a,a"}}"""))
  }

  test("JSON column: json_binary documents render back to JSON text") {
    // one JSON column, 4-byte length prefix (what mysqld writes)
    val tm = tableMap(Seq(245), Seq(4))
    def jsonWrite(doc: Array[Byte]): Array[Byte] =
      writeRows(1) { b => b.u32(doc.length.toLong); b.raw(doc) }

    // small object {"a":17,"b":"hi","c":[true,null,-2,300000]} — inline
    // int16, offset string, nested small array with an offset int32.
    // Every offset below is hand-computed against the documented layout.
    val obj = {
      val b = new Buf
      b.u8(0x00)          // type: small object (container bytes follow)
      b.u16(3).u16(51)    // count, total size
      b.u16(25).u16(1)    // key "a" @25
      b.u16(26).u16(1)    // key "b" @26
      b.u16(27).u16(1)    // key "c" @27
      b.u8(0x05).u16(17)          // "a": inline int16
      b.u8(0x0c).u16(28)          // "b": string @28
      b.u8(0x02).u16(31)          // "c": small array @31
      b.str("abc")                // the three 1-byte keys
      b.u8(2).str("hi")           // string: varlen + bytes
      b.u16(4).u16(20)            // array: count, size
      b.u8(0x04).u16(1)           // true (inline literal)
      b.u8(0x04).u16(0)           // null
      b.u8(0x05).u16(0xfffe)      // -2 (inline int16)
      b.u8(0x07).u16(16)          // int32 @16 (relative to array start)
      b.u32(300000L)              // the int32
      b.bytes
    }
    assert(decode(jsonWrite(obj), tm) ==
      Seq("""{"after":{"c0":{"a":17,"b":"hi","c":[true,null,-2,300000]}}}"""))

    // large object {"k":70000}: 4-byte words, inline int32 value entry
    val largeObj = {
      val b = new Buf
      b.u8(0x01)
      b.u32(1L).u32(20L)   // count, size
      b.u32(19L).u16(1)    // key "k" @19
      b.u8(0x07).u32(70000L) // inline int32 (large format only)
      b.str("k")
      b.bytes
    }
    assert(decode(jsonWrite(largeObj), tm) ==
      Seq("""{"after":{"c0":{"k":70000}}}"""))

    // top-level scalars: escaped string, literal, int64, uint64, double
    def doc(bs: Buf => Unit): Array[Byte] = { val b = new Buf; bs(b); b.bytes }
    assert(decode(jsonWrite(doc { b =>
      b.u8(0x0c).u8(6).str("say\"hi") }), tm) ==
      Seq("""{"after":{"c0":"say\"hi"}}"""))
    assert(decode(jsonWrite(doc(_.u8(0x04).u8(2))), tm) ==
      Seq("""{"after":{"c0":false}}"""))
    assert(decode(jsonWrite(doc(_.u8(0x09).u64(-5000000000000000000L))), tm) ==
      Seq("""{"after":{"c0":-5000000000000000000}}"""))
    assert(decode(jsonWrite(doc(_.u8(0x0a).u64(-1L))), tm) ==
      Seq("""{"after":{"c0":18446744073709551615}}"""))
    assert(decode(jsonWrite(doc(_.u8(0x0b)
      .u64(java.lang.Double.doubleToLongBits(2.5)))), tm) ==
      Seq("""{"after":{"c0":2.5}}"""))

    // empty document is SQL JSON null
    assert(decode(jsonWrite(Array.empty[Byte]), tm) ==
      Seq("""{"after":{"c0":null}}"""))

    // an opaque custom subtype (0x0f: packed decimal/temporal) is REFUSED —
    // whole event nulls, never a guessed rendering
    assert(decode(jsonWrite(doc(_.u8(0x0f).u8(246).u8(2).u16(0))), tm) == null)
  }

  test("JSON column: randomized document round-trip against an independent encoder") {
    // a test-side json_binary ENCODER (written from the format spec, not
    // from the decoder) generates random documents; the decoder must
    // render exactly the expected JSON text. Fixed seed — deterministic.
    val rnd = new scala.util.Random(42)

    sealed trait J
    case object JNull extends J
    case class JBool(b: Boolean) extends J
    case class JInt(v: Long, kind: Int) extends J // kind = wire type byte
    case class JDouble(v: Double) extends J
    case class JStr(s: String) extends J
    case class JArr(items: Seq[J], large: Boolean) extends J
    case class JObj(fields: Seq[(String, J)], large: Boolean) extends J

    def randScalar(): J = rnd.nextInt(9) match {
      case 0 => JNull
      case 1 => JBool(rnd.nextBoolean())
      case 2 => JInt(rnd.nextInt(65536) - 32768, 0x05)
      case 3 => JInt(rnd.nextInt(65536), 0x06)
      case 4 => JInt(rnd.nextInt(), 0x07)
      case 5 => JInt(rnd.nextInt().toLong & 0xffffffffL, 0x08)
      case 6 => JInt(rnd.nextLong(), if (rnd.nextBoolean()) 0x09 else 0x0a)
      case 7 => JDouble(rnd.nextInt(1000) / 8.0) // dyadic: stable toString
      case 8 =>
        val alphabet = "abcXYZ09 _\"\\"
        JStr((0 until rnd.nextInt(12)).map(_ =>
          alphabet.charAt(rnd.nextInt(alphabet.length))).mkString)
    }
    def randJ(depth: Int): J =
      if (depth == 0 || rnd.nextInt(3) == 0) randScalar()
      else if (rnd.nextBoolean())
        JArr(Seq.fill(rnd.nextInt(4))(randJ(depth - 1)), rnd.nextBoolean())
      else
        JObj(Seq.tabulate(rnd.nextInt(4))(i =>
          s"k$i${if (rnd.nextBoolean()) "\"q" else ""}" -> randJ(depth - 1)),
          rnd.nextBoolean())

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def expected(j: J): String = j match {
      case JNull => "null"
      case JBool(b) => b.toString
      case JInt(v, 0x0a) => java.lang.Long.toUnsignedString(v)
      case JInt(v, _) => v.toString
      case JDouble(v) => v.toString
      case JStr(s) => "\"" + esc(s) + "\""
      case JArr(items, _) => items.map(expected).mkString("[", ",", "]")
      case JObj(fields, _) =>
        fields.map { case (k, v) => "\"" + esc(k) + "\":" + expected(v) }
          .mkString("{", ",", "}")
    }

    def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    def varlen(n: Int): Array[Byte] = {
      var v = n
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var cont = true
      while (cont) {
        val b = v & 0x7f
        v >>= 7
        cont = v != 0
        out += (b | (if (cont) 0x80 else 0)).toByte
      }
      out.toArray
    }
    /** (wire type byte, data bytes) — containers laid out per the spec. */
    def encode(j: J): (Int, Array[Byte]) = j match {
      case JNull => (0x04, Array(0.toByte))
      case JBool(b) => (0x04, Array(if (b) 1.toByte else 2.toByte))
      case JInt(v, k) =>
        val n = k match { case 0x05 | 0x06 => 2; case 0x07 | 0x08 => 4; case _ => 8 }
        (k, le(v, n))
      case JDouble(v) => (0x0b, le(java.lang.Double.doubleToLongBits(v), 8))
      case JStr(s) =>
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (0x0c, varlen(bytes.length) ++ bytes)
      case JArr(items, large) => (if (large) 0x03 else 0x02,
        container(items.map(encode), Seq.empty, large))
      case JObj(fields, large) => (if (large) 0x01 else 0x00,
        container(fields.map(f => encode(f._2)),
          fields.map(_._1.getBytes(java.nio.charset.StandardCharsets.UTF_8)), large))
    }
    /** Build the container bytes: counts, key entries, value entries (with
      * inlining rules), keys, spilled values.
      */
    def container(vals: Seq[(Int, Array[Byte])], keys: Seq[Array[Byte]],
        large: Boolean): Array[Byte] = {
      val w = if (large) 4 else 2
      def word(v: Int): Array[Byte] = le(v.toLong, w)
      val n = vals.size
      val headerLen = 2 * w + (if (keys.nonEmpty) n * (w + 2) else 0) + n * (w + 1)
      var dataOff = headerLen + keys.map(_.length).sum
      val keyEntries = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var keyOff = headerLen
      keys.foreach { k =>
        keyEntries ++= word(keyOff) ++= le(k.length.toLong, 2)
        keyOff += k.length
      }
      val valEntries = scala.collection.mutable.ArrayBuffer.empty[Byte]
      val spill = scala.collection.mutable.ArrayBuffer.empty[Byte]
      vals.foreach { case (t, data) =>
        val inline = t == 0x04 || t == 0x05 || t == 0x06 ||
          (large && (t == 0x07 || t == 0x08))
        if (inline) {
          valEntries += t.toByte
          valEntries ++= data.padTo(w, 0.toByte)
        } else {
          valEntries += t.toByte
          valEntries ++= word(dataOff)
          spill ++= data
          dataOff += data.length
        }
      }
      val total = headerLen + keys.map(_.length).sum + spill.length
      word(n) ++ word(total) ++ keyEntries ++ valEntries ++
        keys.flatten.toArray ++ spill
    }

    val tm = tableMap(Seq(245), Seq(4))
    (1 to 200).foreach { i =>
      val j = randJ(3)
      val (t, data) = encode(j)
      val doc = t.toByte +: data
      val ev = writeRows(1) { b => b.u32(doc.length.toLong); b.raw(doc) }
      val got = decode(ev, tm)
      assert(got == Seq(s"""{"after":{"c0":${expected(j)}}}"""),
        s"doc #$i: AST $j\nexpected ${expected(j)}\ngot $got")
    }
  }

  test("JSON column: arbitrary garbage documents null the event, never throw") {
    // at archive scale a poisoned event WILL exist; every outcome must be
    // decode-or-null — no exception may escape into the scan
    val rnd = new scala.util.Random(7)
    val tm = tableMap(Seq(245), Seq(4))
    (1 to 300).foreach { i =>
      val doc = new Array[Byte](rnd.nextInt(40))
      rnd.nextBytes(doc)
      val ev = writeRows(1) { b => b.u32(doc.length.toLong); b.raw(doc) }
      val got = decode(ev, tm) // must not throw
      assert(got == null || got.size == 1, s"garbage doc #$i: $got")
    }
    // adversarial shapes: truncated container headers, negative-ish string
    // lengths (huge varints), offsets past the end
    val crafted = Seq(
      Array[Byte](0x00),                               // object, no header
      Array[Byte](0x02, 0x10, 0x00),                   // array count 16, no entries
      Array[Byte](0x0c, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f), // 268M-char string
      Array[Byte](0x00, 0x01, 0x00, 0xff.toByte, 0x7f, 0x02, 0x00, 0x0c, 0x50),
      Array[Byte](0x09, 1, 2))                         // int64 with 3 bytes
    crafted.zipWithIndex.foreach { case (doc, i) =>
      val ev = writeRows(1) { b => b.u32(doc.length.toLong); b.raw(doc) }
      assert(decode(ev, tm) == null, s"crafted doc #$i should refuse")
    }
  }

  test("codegen path + SQL surface over a framed stream") {
    import spark.implicits._
    val tm = tableMap()
    val w = rowsEvent(30) { b =>
      img(b, Some(42), Some("spark"), Some(3.5), Some(7L), Some(1), Some("ok"))
    }
    val stream = BinlogTestData.magic ++ tm ++ w
    val df = Seq(stream).toDF("raw")
      .select(explode(BinlogWire.binlog_frames(col("raw"))).as("ev"))
      .agg(collect_list(col("ev")).as("evs"))
      .select(
        explode(BinlogRows.binlog_rows_json(
          element_at(col("evs"), 2), element_at(col("evs"), 1))).as("row"))
      .select(get_json_object(col("row"), "$.after.c0").as("c0"),
        get_json_object(col("row"), "$.after.c1").as("c1"))
    val r = df.collect().head
    assert(r.getString(0) == "42" && r.getString(1) == "spark")

    GraftExtensions.register(spark)
    Seq((w, tm)).toDF("rows", "tm").createOrReplaceTempView("binlog_rows_t")
    val viaSql = spark.sql(
      "SELECT explode(binlog_rows_json(rows, tm)) AS r FROM binlog_rows_t")
      .collect().head.getString(0)
    assert(viaSql.contains("\"c0\":42"))
  }
}
