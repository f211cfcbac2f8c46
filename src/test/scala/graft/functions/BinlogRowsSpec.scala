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
      metas: Seq[Int] = Seq(0, 20, 8, 0, 0, 300)): Array[Byte] = {
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
      case _ => ()
    }
    b.u8(meta.bytes.length).raw(meta.bytes)
    b.u8(0) // null-allowed bitmap (unused by the decoder)
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
    // unsupported column type (NEWDECIMAL=246)
    assert(decode(ev, tableMap(types = Seq(246, 15, 5, 8, 1, 15))) == null)
    // truncated body
    assert(decode(ev.dropRight(3), tableMap()) == null)
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
