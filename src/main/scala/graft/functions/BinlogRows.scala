package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MySQL binlog v2 ROWS-event row-image decode — the core of what the
  * reference's canal dependency does between the wire and the handler
  * (`/root/reference/main.go:50-113` receives exactly these decoded
  * images): `binlog_rows_json(rows_event, table_map_event)` pairs a
  * WRITE/UPDATE/DELETE_ROWS_EVENTv2 — or a PARTIAL_UPDATE_ROWS_EVENT
  * (type 39, `binlog_row_value_options=PARTIAL_JSON`, whose partial JSON
  * columns render as their faithful `json_diff` vectors) — with its
  * TABLE_MAP_EVENT and returns
  * one JSON string per row change, shaped like the handler's input:
  *
  *   WRITE  → `{"after":{"c0":…,"c1":…}}`
  *   DELETE → `{"before":{…}}`
  *   UPDATE → `{"before":{…},"after":{…}}` (images arrive paired on the
  *            wire, exactly the pairing R6/R7 consumes downstream)
  *
  * Column KEYS are the REAL column names whenever the TABLE_MAP carries
  * them — a MySQL 8.0.1+ server with `binlog_row_metadata=FULL` embeds
  * names, numeric signedness, and ENUM/SET label lists as optional
  * metadata TLVs, all honored here (names as keys, unsigned ints rendered
  * full-range, enum ordinals/set bitmasks rendered as their labels).
  * Without that metadata, keys fall back to positional `c0…cN`: the
  * classic binlog carries no names — canal resolves them from
  * `information_schema`, which is part of the live-connection surface,
  * not the wire format. Supported column
  * types cover the practical MySQL surface: the fixed-width core (TINY,
  * SHORT, INT24, LONG, LONGLONG, FLOAT, DOUBLE, YEAR), VARCHAR/
  * VAR_STRING, CHAR (STRING with the high-bit length packing), ENUM/SET
  * (emitted as their wire ordinal/bitmask — the label list lives in
  * `information_schema`, not the binlog), BLOB/TEXT of every width
  * (1–4 length bytes), BIT (≤63 bits, else refused), NEWDECIMAL (the
  * packed base-10^9 format, emitted at exact declared scale), DATE, and
  * both temporal generations: the pre-5.6.4 TIME/DATETIME/TIMESTAMP and
  * the fractional-second TIME2/DATETIME2/TIMESTAMP2. DATETIME renders
  * zoneless `YYYY-MM-DDTHH:MM:SS[.f]`, TIMESTAMP renders RFC3339 UTC
  * (the wire value IS UTC seconds; the reference normalizes timestamps
  * the same way, `main.go:147-154`), TIME renders `[-]HH:MM:SS[.f]`,
  * each with exactly the declared fsp digits, and JSON (the binary
  * `json_binary` document format rendered back to JSON text — objects,
  * arrays, strings, every int width, double, and the three literals;
  * opaque custom subtypes like packed decimal/temporal-in-JSON are
  * refused, not guessed), and GEOMETRY (rendered losslessly as
  * `{"srid":N,"wkb":"hex"}` — u32 LE SRID + OGC WKB bytes, the public
  * internal layout). Per-row NULL bitmaps and the columns-present
  * bitmap are honored; an unsupported type (opaque JSON subtypes) or a
  * table-id mismatch yields NULL for the whole event (wrong pairing
  * must be loud, not plausible), never a torn decode.
  *
  * Row-local, no shuffle: decoding 100 TB of archived ROWS events
  * parallelizes per split like every other scalar here.
  */
object BinlogRows {

  // Column type codes (public protocol constants).
  private val TINY = 1; private val SHORT = 2; private val LONG = 3
  private val FLOAT = 4; private val DOUBLE = 5; private val TIMESTAMP = 7
  private val LONGLONG = 8; private val INT24 = 9; private val DATE = 10
  private val TIME = 11; private val DATETIME = 12; private val YEAR = 13
  private val NEWDATE = 14; private val VARCHAR = 15; private val BIT = 16
  private val TIMESTAMP2 = 17; private val DATETIME2 = 18; private val TIME2 = 19
  private val JSONB = 245
  private val NEWDECIMAL = 246; private val ENUM = 247; private val SET = 248
  private val TINY_BLOB = 249; private val MEDIUM_BLOB = 250
  private val LONG_BLOB = 251; private val BLOB = 252
  private val VAR_STRING = 253; private val STRING = 254
  private val GEOMETRY = 255

  private val WRITE = 30; private val UPDATE = 31; private val DELETE = 32
  private val PARTIAL_UPDATE = 39 // binlog_row_value_options=PARTIAL_JSON
  private val TABLE_MAP = 19

  private final class Cursor(val b: Array[Byte], var off: Int) {
    def u8(): Int = { val v = b(off) & 0xff; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u24(): Int = u8() | (u8() << 8) | (u8() << 16)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def u48(): Long = u32() | (u16().toLong << 32)
    def i8(): Int = { val v = b(off).toInt; off += 1; v }
    def i16(): Int = (u16() << 16) >> 16
    def i24(): Int = (u24() << 8) >> 8
    def i32(): Int = u32().toInt
    def i64(): Long = u32() | (u32() << 32)
    def lenenc(): Long = u8() match {
      case 0xfc => u16().toLong
      case 0xfd => u24().toLong
      case 0xfe => i64()
      case v => v.toLong
    }
    def bytes(n: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(b, off, off + n); off += n; r
    }
    /** Big-endian unsigned read — MySQL's "new" temporal/decimal formats
      * are the one place the protocol flips byte order (so the packed
      * values sort correctly as memcmp keys in InnoDB).
      */
    def be(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
      off += n; v
    }
    def remaining: Int = b.length - off
  }

  private def bit(bm: Array[Byte], i: Int): Boolean =
    (bm(i / 8) & (1 << (i % 8))) != 0

  /** Parsed TABLE_MAP, including the OPTIONAL metadata a MySQL 8.0.1+
    * server writes under `binlog_row_metadata=FULL` (public TLV layout,
    * mysql-server sql/log_event.cc): real column names, numeric
    * signedness, and ENUM/SET label lists — the parts of the schema the
    * positional fallback (`c0…cN`, signed ints, wire ordinals) exists to
    * work around. Absent metadata leaves every fallback in place.
    */
  private final case class TableMapInfo(
      tableId: Long, schema: String, table: String,
      types: Array[Int], meta: Array[Int],
      names: Array[String],                     // empty when absent
      unsigned: Array[Boolean],                 // per column, false default
      enumLabels: Map[Int, Array[String]],      // col idx → labels
      setLabels: Map[Int, Array[String]])

  /** Numeric columns in TABLE_MAP order — the SIGNEDNESS bitmap covers
    * exactly these, one bit each, MSB-first per byte.
    */
  private def isNumeric(t: Int): Boolean = t match {
    case TINY | SHORT | INT24 | LONG | LONGLONG | FLOAT | DOUBLE | YEAR |
        NEWDECIMAL => true
    case _ => false
  }

  private def parseTableMap(ev: Array[Byte], hasCrc: Boolean): Option[TableMapInfo] = {
    if (ev == null || ev.length < BinlogWire.HeaderLen + 8 ||
      (ev(4) & 0xff) != TABLE_MAP) return None
    try {
      val end = ev.length - (if (hasCrc) 4 else 0)
      val c = new Cursor(ev, BinlogWire.HeaderLen)
      val tableId = c.u48()
      c.u16() // flags
      val schemaLen = c.u8()
      val schema = new String(c.bytes(schemaLen), java.nio.charset.StandardCharsets.UTF_8)
      c.u8() // NUL
      val tableLen = c.u8()
      val table = new String(c.bytes(tableLen), java.nio.charset.StandardCharsets.UTF_8)
      c.u8() // NUL
      val nCols = c.lenenc().toInt
      val types = Array.fill(nCols)(c.u8())
      c.lenenc() // metadata block length (sizes are type-determined below)
      val meta = Array.fill(nCols)(0)
      var i = 0
      while (i < nCols) {
        types(i) match {
          case FLOAT | DOUBLE => meta(i) = c.u8()
          case VARCHAR | VAR_STRING => meta(i) = c.u16()
          case TIMESTAMP2 | DATETIME2 | TIME2 => meta(i) = c.u8() // fsp
          // wire order (precision, scale) / (real-type-or-upper-bits, length)
          case NEWDECIMAL | STRING | ENUM | SET => meta(i) = (c.u8() << 8) | c.u8()
          case BLOB | TINY_BLOB | MEDIUM_BLOB | LONG_BLOB | JSONB | GEOMETRY =>
            meta(i) = c.u8()
          case BIT => // wire order (bits % 8, bytes)
            val m0 = c.u8(); meta(i) = (c.u8() << 8) | m0
          case _ => ()
        }
        i += 1
      }
      var names = Array.empty[String]
      val unsigned = Array.fill(nCols)(false)
      var enumLabels = Map.empty[Int, Array[String]]
      var setLabels = Map.empty[Int, Array[String]]
      // Optional metadata TLVs follow the null-allowed bitmap; any parse
      // problem abandons the OPTIONAL part only — the fallbacks are
      // exactly what decoding looked like before the field existed.
      try {
        c.bytes((nCols + 7) / 8) // null-allowed bitmap
        while (c.off + 2 <= end) {
          val tlvType = c.u8()
          val tlvLen = c.lenenc().toInt
          val tlvEnd = c.off + tlvLen
          if (tlvLen < 0 || tlvEnd > end) throw new ArrayIndexOutOfBoundsException()
          tlvType match {
            case 1 => // SIGNEDNESS: one bit per numeric column, MSB first
              val bits = c.bytes(tlvLen)
              var k = 0
              var col = 0
              while (col < nCols) {
                if (isNumeric(types(col))) {
                  if ((bits(k / 8) & (0x80 >>> (k % 8))) != 0) unsigned(col) = true
                  k += 1
                }
                col += 1
              }
            case 4 => // COLUMN_NAME: per column, lenenc length + bytes
              val ns = Array.newBuilder[String]
              while (c.off < tlvEnd) {
                val n = c.lenenc().toInt
                ns += new String(c.bytes(n), java.nio.charset.StandardCharsets.UTF_8)
              }
              val arr = ns.result()
              if (arr.length == nCols) names = arr
            case 5 | 6 => // SET_STR_VALUE / ENUM_STR_VALUE: per enum/set
              // column, lenenc count then count × (lenenc len + bytes)
              val isSet = tlvType == 5
              val target = if (isSet) SET else ENUM
              var col = 0
              while (col < nCols && c.off < tlvEnd) {
                val real =
                  if (types(col) == STRING) (meta(col) >> 8) | 0x30 else types(col)
                if (real == target ||
                  (types(col) == STRING && (meta(col) >> 8) == target)) {
                  val n = c.lenenc().toInt
                  val labels = Array.fill(n) {
                    val len = c.lenenc().toInt
                    new String(c.bytes(len), java.nio.charset.StandardCharsets.UTF_8)
                  }
                  if (isSet) setLabels += col -> labels
                  else enumLabels += col -> labels
                }
                col += 1
              }
              c.off = tlvEnd
            case _ => c.off = tlvEnd // charsets, PK, geometry types: skip
          }
          if (c.off != tlvEnd) c.off = tlvEnd
        }
      } catch {
        case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException =>
          // keep identity + fallbacks; drop the partial optional metadata —
          // ALL of it: a TLV that throws after SIGNEDNESS must not leave
          // signedness applied while names/labels are dropped (the fallback
          // state is fully positional/signed)
          names = Array.empty
          enumLabels = Map.empty
          setLabels = Map.empty
          java.util.Arrays.fill(unsigned, false)
      }
      Some(TableMapInfo(tableId, schema, table, types, meta,
        names, unsigned, enumLabels, setLabels))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** TABLE_MAP identity: struct(table_id, db, tbl, n_cols) — the schema/
    * table NAMES the binlog does carry (per-event), as opposed to column
    * names (which it doesn't). Null unless the event is a well-formed
    * TABLE_MAP.
    */
  def tableInfo(ev: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    parseTableMap(ev, hasCrc = false) match {
      case Some(tm) =>
        org.apache.spark.sql.catalyst.InternalRow(
          tm.tableId, UTF8String.fromString(tm.schema),
          UTF8String.fromString(tm.table), tm.types.length)
      case None => null
    }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case ch if ch < ' ' => sb.append(f"\\u${ch.toInt}%04x")
      case ch => sb.append(ch)
    }
    sb.toString()
  }

  private val Pow10 = Array(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L)

  /** Fractional seconds per the packed-temporal convention: (fsp+1)/2
    * big-endian bytes holding the fraction scaled to 2·bytes digits;
    * returned in microseconds.
    */
  private def fracMicros(c: Cursor, fsp: Int): Long = {
    val nb = (fsp + 1) / 2
    if (nb == 0) 0L else c.be(nb) * Pow10(6 - 2 * nb)
  }

  /** Exactly `fsp` fraction digits — the declared column precision, which
    * is what mysql's own text rendering emits.
    */
  private def fracSuffix(micros: Long, fsp: Int): String =
    if (fsp == 0) "" else "." + f"$micros%06d".substring(0, fsp)

  private def fmtDateTime(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int): String =
    f"$y%04d-$mo%02d-$d%02dT$h%02d:$mi%02d:$s%02d"

  /** TIMESTAMP's wire value is UTC epoch seconds — RFC3339 UTC is the
    * faithful (and zone-independent, hence deterministic) rendering.
    */
  private def utcString(sec: Long, micros: Long, fsp: Int): String = {
    val t = java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)
    fmtDateTime(t.getYear, t.getMonthValue, t.getDayOfMonth,
      t.getHour, t.getMinute, t.getSecond) + fracSuffix(micros, fsp) + "Z"
  }

  /** NEWDECIMAL: sign-flipped packed base-10^9 (9 digits per 4 bytes,
    * partial groups in 1–4 bytes, big-endian; negative = bitwise
    * complement of the whole buffer; MSB of byte 0 = positive). Rendered
    * at exactly the declared scale; `-0.00` canonicalizes to `0.00`.
    */
  private def decodeNewDecimal(c: Cursor, precision: Int, scale: Int): String = {
    val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
    val intDigits = precision - scale
    val intFull = intDigits / 9; val intRem = intDigits % 9
    val fracFull = scale / 9; val fracRem = scale % 9
    val size = intFull * 4 + dig2bytes(intRem) + fracFull * 4 + dig2bytes(fracRem)
    val raw = c.bytes(size)
    val negative = (raw(0) & 0x80) == 0
    if (negative) { var i = 0; while (i < size) { raw(i) = (~raw(i)).toByte; i += 1 } }
    raw(0) = (raw(0) ^ 0x80).toByte
    var p = 0
    def group(nb: Int): Long = {
      var v = 0L; var i = 0
      while (i < nb) { v = (v << 8) | (raw(p) & 0xff); p += 1; i += 1 }
      v
    }
    val ib = new StringBuilder
    if (intRem > 0) ib.append(("%0" + intRem + "d").format(group(dig2bytes(intRem))))
    var i = 0
    while (i < intFull) { ib.append(f"${group(4)}%09d"); i += 1 }
    val intStr = { val t = ib.dropWhile(_ == '0'); if (t.isEmpty) "0" else t.toString }
    val fb = new StringBuilder
    i = 0
    while (i < fracFull) { fb.append(f"${group(4)}%09d"); i += 1 }
    if (fracRem > 0) fb.append(("%0" + fracRem + "d").format(group(dig2bytes(fracRem))))
    val zero = intStr == "0" && fb.forall(_ == '0')
    (if (negative && !zero) "-" else "") + intStr +
      (if (scale > 0) "." + fb else "")
  }

  // ---- MYSQL_TYPE_JSON: the json_binary document format (public layout,
  // mysql-server sql/json_binary.h) rendered back to JSON text ----

  private def jU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def jI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def jI64(b: Array[Byte], off: Int): Long =
    (jI32(b, off) & 0xffffffffL) | (jI32(b, off + 4).toLong << 32)

  /** String lengths are a 7-bits-per-byte varint, low group first. */
  private def jVarlen(b: Array[Byte], off: Int): (Int, Int) = {
    var len = 0
    var i = 0
    var cont = true
    while (cont) {
      val v = b(off + i) & 0xff
      len |= (v & 0x7f) << (7 * i)
      cont = (v & 0x80) != 0
      i += 1
    }
    (len, off + i)
  }

  /** One json_binary value of type byte `tpe` whose data starts at `off`.
    * None on an opaque custom subtype (0x0f carries a packed server type —
    * decimal, date/time — whose rendering needs server context; refused,
    * not guessed) or a malformed type byte.
    */
  private def jsonValue(b: Array[Byte], tpe: Int, off: Int): Option[String] = tpe match {
    case 0x00 => jsonContainer(b, off, obj = true, large = false)
    case 0x01 => jsonContainer(b, off, obj = true, large = true)
    case 0x02 => jsonContainer(b, off, obj = false, large = false)
    case 0x03 => jsonContainer(b, off, obj = false, large = true)
    case 0x04 => (b(off) & 0xff) match {
      case 0 => Some("null")
      case 1 => Some("true")
      case 2 => Some("false")
      case _ => None
    }
    case 0x05 => Some(jU16(b, off).toShort.toString)
    case 0x06 => Some(jU16(b, off).toString)
    case 0x07 => Some(jI32(b, off).toString)
    case 0x08 => Some((jI32(b, off) & 0xffffffffL).toString)
    case 0x09 => Some(jI64(b, off).toString)
    case 0x0a => Some(java.lang.Long.toUnsignedString(jI64(b, off)))
    case 0x0b => Some(java.lang.Double.longBitsToDouble(jI64(b, off)).toString)
    case 0x0c =>
      val (len, dataOff) = jVarlen(b, off)
      Some("\"" + jsonEscape(new String(b, dataOff, len,
        java.nio.charset.StandardCharsets.UTF_8)) + "\"")
    case _ => None
  }

  /** Object/array container: element count and byte size in 2-byte (small)
    * or 4-byte (large) words, then key entries (objects: offset + u16
    * length), then value entries (type byte + offset word — or the value
    * itself INLINED for literals/int16/uint16, plus int32/uint32 in the
    * large format), then keys, then values. All offsets are relative to
    * the container start.
    */
  private def jsonContainer(b: Array[Byte], off: Int, obj: Boolean,
      large: Boolean): Option[String] = {
    val w = if (large) 4 else 2
    def word(o: Int): Int = if (large) jI32(b, o) else jU16(b, o)
    val count = word(off)
    val keyEntries = off + 2 * w
    val valEntries = keyEntries + (if (obj) count * (w + 2) else 0)
    val sb = new StringBuilder(if (obj) "{" else "[")
    var i = 0
    while (i < count) {
      if (i > 0) sb.append(',')
      if (obj) {
        val ke = keyEntries + i * (w + 2)
        val ko = word(ke)
        val kl = jU16(b, ke + w)
        sb.append('"')
          .append(jsonEscape(new String(b, off + ko, kl,
            java.nio.charset.StandardCharsets.UTF_8)))
          .append("\":")
      }
      val ve = valEntries + i * (w + 1)
      val vt = b(ve) & 0xff
      val inlined: Option[String] = vt match {
        case 0x04 => (b(ve + 1) & 0xff) match {
          case 0 => Some("null")
          case 1 => Some("true")
          case 2 => Some("false")
          case _ => return None
        }
        case 0x05 => Some(jU16(b, ve + 1).toShort.toString)
        case 0x06 => Some(jU16(b, ve + 1).toString)
        case 0x07 if large => Some(jI32(b, ve + 1).toString)
        case 0x08 if large => Some((jI32(b, ve + 1) & 0xffffffffL).toString)
        case _ => None
      }
      inlined match {
        case Some(s) => sb.append(s)
        case None =>
          jsonValue(b, vt, off + word(ve + 1)) match {
            case Some(s) => sb.append(s)
            case None => return None
          }
      }
      i += 1
    }
    Some(sb.append(if (obj) '}' else ']').toString())
  }

  /** MySQL `Json_diff_vector` binary (public layout, `sql/json_diff.cc`
    * `write_binary`/`read_binary`): concatenated diffs, each = operation
    * byte (0 REPLACE, 1 INSERT, 2 REMOVE), lenenc path length + path
    * text, and (except REMOVE) lenenc value length + a standard
    * json_binary document. Rendered faithfully as
    * `{"json_diff":[{"op":…,"path":…,"value":…}…]}` — the diff IS what
    * the wire carries (the full after-document would need the before
    * state the binlog deliberately omits), and it's exactly the shape the
    * reference's go-mysql dependency surfaces to its handlers.
    */
  private def jsonDiffVector(b: Array[Byte]): Option[String] = {
    val c = new Cursor(b, 0)
    val sb = new StringBuilder("""{"json_diff":[""")
    var first = true
    while (c.remaining > 0) {
      val op = c.u8() match {
        case 0 => "replace"
        case 1 => "insert"
        case 2 => "remove"
        case _ => return None // unknown operation: refuse the event
      }
      val path = new String(c.bytes(c.lenenc().toInt),
        java.nio.charset.StandardCharsets.UTF_8)
      val value: Option[String] =
        if (op == "remove") None
        else {
          val vlen = c.lenenc().toInt
          if (vlen <= 0) return None
          val doc = c.bytes(vlen)
          jsonValue(doc, doc(0) & 0xff, 1) match {
            case Some(s) => Some(s)
            case None => return None
          }
        }
      if (!first) sb.append(',')
      first = false
      sb.append(s"""{"op":"$op","path":"${jsonEscape(path)}"""")
      value.foreach(v => sb.append(s""","value":$v"""))
      sb.append('}')
    }
    Some(sb.append("]}").toString())
  }

  /** One row image as a JSON object; null when a column type is
    * unsupported (the caller then nulls the whole event). Keys are the
    * real column names when the TABLE_MAP carried them (FULL row
    * metadata), positional `c0…cN` otherwise; ints honor SIGNEDNESS;
    * ENUM/SET render their labels when the label lists are on the wire.
    * `partialBits` (PARTIAL_UPDATE after-images only) marks which JSON
    * columns arrive as diff vectors instead of full documents — one bit
    * per JSON column in image order, consumed even for NULL values
    * (matching `log_event.cc`'s partial_bits walk).
    */
  private def image(c: Cursor, tm: TableMapInfo,
      present: Array[Byte], partialBits: Array[Byte] = null): Option[String] = {
    val types = tm.types
    val meta = tm.meta
    val presentIdx = types.indices.filter(bit(present, _))
    val nullBm = c.bytes((presentIdx.size + 7) / 8)
    val sb = new StringBuilder("{")
    var first = true
    var pi = 0
    var jsonIdx = 0
    presentIdx.foreach { col =>
      val partialJson = types(col) == JSONB && partialBits != null && {
        val p = bit(partialBits, jsonIdx); jsonIdx += 1; p
      }
      val v: Option[String] =
        if (bit(nullBm, pi)) Some("null")
        else if (partialJson) {
          // partial format: same length prefix as a full JSON column, but
          // the payload is a Json_diff_vector, not a document
          val len = meta(col) match {
            case 1 => c.u8().toLong
            case 2 => c.u16().toLong
            case 3 => c.u24().toLong
            case 4 => c.u32()
            case _ => -1L
          }
          if (len < 0) None
          else if (len == 0) Some("null") // empty diff = no-op image
          else jsonDiffVector(c.bytes(len.toInt))
        }
        else types(col) match {
          case TINY =>
            Some(if (tm.unsigned(col)) c.u8().toString else c.i8().toString)
          case SHORT =>
            Some(if (tm.unsigned(col)) c.u16().toString else c.i16().toString)
          case INT24 =>
            Some(if (tm.unsigned(col)) c.u24().toString else c.i24().toString)
          case LONG =>
            Some(if (tm.unsigned(col)) c.u32().toString else c.i32().toString)
          case LONGLONG =>
            Some(if (tm.unsigned(col)) java.lang.Long.toUnsignedString(c.i64())
            else c.i64().toString)
          case YEAR => Some((1900 + c.u8()).toString)
          case FLOAT =>
            Some(java.lang.Float.intBitsToFloat(c.i32()).toString)
          case DOUBLE =>
            Some(java.lang.Double.longBitsToDouble(c.i64()).toString)
          case VARCHAR | VAR_STRING =>
            val len = if (meta(col) > 255) c.u16() else c.u8()
            Some("\"" + jsonEscape(new String(c.bytes(len),
              java.nio.charset.StandardCharsets.UTF_8)) + "\"")
          case DATE | NEWDATE => // 3 bytes LE: day 5 bits, month 4, year 15
            val v = c.u24()
            Some(f""""${v >> 9}%04d-${(v >> 5) & 15}%02d-${v & 31}%02d"""")
          case TIMESTAMP => // pre-5.6.4: 4-byte LE UTC seconds
            Some("\"" + utcString(c.u32(), 0L, 0) + "\"")
          case TIMESTAMP2 => // 4-byte BE UTC seconds + packed fraction
            val sec = c.be(4); val fsp = meta(col)
            Some("\"" + utcString(sec, fracMicros(c, fsp), fsp) + "\"")
          case DATETIME => // pre-5.6.4: u64 LE literal YYYYMMDDHHMMSS
            val v = c.i64()
            val date = v / 1000000L; val time = v % 1000000L
            Some("\"" + fmtDateTime((date / 10000L).toInt,
              (date / 100L % 100L).toInt, (date % 100L).toInt,
              (time / 10000L).toInt, (time / 100L % 100L).toInt,
              (time % 100L).toInt) + "\"")
          case DATETIME2 => // 5-byte BE offset-binary packed + fraction
            val fsp = meta(col)
            val packed = c.be(5) - 0x8000000000L
            val micros = fracMicros(c, fsp)
            val ym = ((packed >> 22) & 0x1ffff).toInt
            Some("\"" + fmtDateTime(ym / 13, ym % 13,
              ((packed >> 17) & 0x1f).toInt, ((packed >> 12) & 0x1f).toInt,
              ((packed >> 6) & 0x3f).toInt, (packed & 0x3f).toInt) +
              fracSuffix(micros, fsp) + "\"")
          case TIME => // pre-5.6.4: 3-byte LE signed literal HHMMSS
            val v = c.i24(); val a = math.abs(v)
            Some(f""""${if (v < 0) "-" else ""}${a / 10000}%02d:${a / 100 % 100}%02d:${a % 100}%02d"""")
          case TIME2 =>
            // One offset-binary big-endian number over (3 + fracbytes)
            // bytes: borrow propagates in base 256, so |value| splits
            // cleanly back into int part and stored fraction even for
            // negative times with fractional seconds.
            val fsp = meta(col); val nb = (fsp + 1) / 2
            val signed = c.be(3 + nb) - (0x800000L << (8 * nb))
            val abs = math.abs(signed)
            val stored = if (nb == 0) 0L else abs & ((1L << (8 * nb)) - 1)
            val intp = abs >> (8 * nb)
            Some(f""""${if (signed < 0) "-" else ""}${(intp >> 12) & 0x3ff}%02d:${(intp >> 6) & 0x3f}%02d:${intp & 0x3f}%02d${fracSuffix(stored * Pow10(6 - 2 * nb), fsp)}"""")
          case NEWDECIMAL => // a JSON number at exact declared scale
            Some(decodeNewDecimal(c, meta(col) >> 8, meta(col) & 0xff))
          case BIT => // big-endian, (bytes*8 + bits%8) wide; >63 bits refused
            val nbits = (meta(col) >> 8) * 8 + (meta(col) & 0xff)
            if (nbits > 63 || nbits <= 0) None
            else Some(c.be((nbits + 7) / 8).toString)
          case BLOB | TINY_BLOB | MEDIUM_BLOB | LONG_BLOB =>
            // metadata = length-prefix width; TEXT shares this type code
            // (charset lives in information_schema), so bytes render as
            // UTF-8 — deterministic either way.
            val len = meta(col) match {
              case 1 => c.u8().toLong
              case 2 => c.u16().toLong
              case 3 => c.u24().toLong
              case 4 => c.u32()
              case _ => -1L
            }
            if (len < 0) None
            else Some("\"" + jsonEscape(new String(c.bytes(len.toInt),
              java.nio.charset.StandardCharsets.UTF_8)) + "\"")
          case GEOMETRY =>
            // length-prefixed like BLOB (metadata = prefix width); payload
            // is the public internal geometry layout: u32 LE SRID + OGC
            // WKB bytes. Rendered losslessly as {"srid":N,"wkb":"hex"} —
            // WKB geometry parsing belongs to a GIS layer, but the bytes
            // and SRID round-trip exactly (r7 refused GEOMETRY outright).
            val len = meta(col) match {
              case 1 => c.u8().toLong
              case 2 => c.u16().toLong
              case 3 => c.u24().toLong
              case 4 => c.u32()
              case _ => -1L
            }
            if (len < 4) None // too short to carry the SRID header: refuse
            else {
              val srid = c.u32()
              val wkb = c.bytes((len - 4).toInt)
              Some(s"""{"srid":$srid,"wkb":"${java.util.HexFormat.of().formatHex(wkb)}"}""")
            }
          case JSONB =>
            // length-prefixed (metadata = prefix width, like BLOB) binary
            // JSON document; an empty document is SQL-side JSON null
            val len = meta(col) match {
              case 1 => c.u8().toLong
              case 2 => c.u16().toLong
              case 3 => c.u24().toLong
              case 4 => c.u32()
              case _ => -1L
            }
            if (len < 0) None
            else if (len == 0) Some("null")
            else {
              val doc = c.bytes(len.toInt)
              jsonValue(doc, doc(0) & 0xff, 1)
            }
          case STRING | ENUM | SET =>
            // CHAR/ENUM/SET share TABLE_MAP type 254: metadata byte 0
            // carries the real type (with two length bits folded into
            // ~0x30 when the byte length exceeds 255).
            val m0 = meta(col) >> 8; val m1 = meta(col) & 0xff
            var real = if (types(col) == STRING) m0 else types(col)
            var maxLen = m1
            if (types(col) == STRING && (m0 & 0x30) != 0x30) {
              maxLen = m1 | (((m0 & 0x30) ^ 0x30) << 4)
              real = m0 | 0x30
            }
            real match {
              case ENUM => // label when FULL metadata carries it; else ordinal
                val ord = if (maxLen == 1) c.u8() else c.u16()
                tm.enumLabels.get(col) match {
                  case Some(labels) if ord >= 1 && ord <= labels.length =>
                    Some("\"" + jsonEscape(labels(ord - 1)) + "\"")
                  case Some(_) if ord == 0 => Some("\"\"") // invalid/empty enum
                  case _ => Some(ord.toString)
                }
              case SET => // member labels when on the wire; else the bitmask
                var v = 0L; var i = 0
                while (i < maxLen) { v |= (c.u8().toLong << (8 * i)); i += 1 }
                tm.setLabels.get(col) match {
                  // JVM long shifts are mod 64, so a 64-member SET's
                  // `v >>> 64` is a no-op — any label count >= 64 means no
                  // out-of-range bit can exist and the guard must pass
                  case Some(labels) if labels.length >= 64 || (v >>> labels.length) == 0 =>
                    val members = (0 until labels.length)
                      .filter(b => (v & (1L << b)) != 0).map(labels)
                    Some("\"" + jsonEscape(members.mkString(",")) + "\"")
                  case _ => Some(v.toString)
                }
              case STRING | VAR_STRING =>
                val len = if (maxLen > 255) c.u16() else c.u8()
                Some("\"" + jsonEscape(new String(c.bytes(len),
                  java.nio.charset.StandardCharsets.UTF_8)) + "\"")
              case _ => None
            }
          case _ => None
        }
      if (v.isEmpty) return None
      if (!first) sb.append(',')
      first = false
      val key = if (tm.names.nonEmpty) jsonEscape(tm.names(col)) else s"c$col"
      sb.append('"').append(key).append("\":").append(v.get)
      pi += 1
    }
    Some(sb.append('}').toString())
  }

  /** Static entry point shared by interpreted eval and generated code.
    * `hasCrc` = the server writes CRC32 checksums (declared in its
    * FORMAT_DESCRIPTION event): the last 4 bytes of each event are then a
    * trailer, not row data. The flag is EXPLICIT — guessing at trailers is
    * exactly the plausible-but-wrong decode this function refuses.
    */
  def rowsJson(rowsEvent: Array[Byte], tableMapEvent: Array[Byte],
      hasCrc: Boolean): ArrayData = {
    if (rowsEvent == null || tableMapEvent == null) return null
    if (rowsEvent.length < BinlogWire.HeaderLen + 10) return null
    val tpe = rowsEvent(4) & 0xff
    if (tpe != WRITE && tpe != UPDATE && tpe != DELETE && tpe != PARTIAL_UPDATE)
      return null
    val tm = parseTableMap(tableMapEvent, hasCrc).orNull
    if (tm == null) return null
    try {
      val end = rowsEvent.length - (if (hasCrc) 4 else 0)
      val c = new Cursor(rowsEvent, BinlogWire.HeaderLen)
      if (c.u48() != tm.tableId) return null // wrong TABLE_MAP pairing
      c.u16() // flags
      val extraLen = c.u16() // v2 extra-data length, INCLUDES these 2 bytes
      if (extraLen > 2) c.bytes(extraLen - 2)
      val nCols = c.lenenc().toInt
      if (nCols != tm.types.length) return null
      val present = c.bytes((nCols + 7) / 8)
      val presentAfter =
        if (tpe == UPDATE || tpe == PARTIAL_UPDATE) c.bytes((nCols + 7) / 8)
        else present
      val nJsonCols = tm.types.count(_ == JSONB)
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      while (c.off < end) {
        val j = tpe match {
          case WRITE =>
            image(c, tm, present).map(a => s"""{"after":$a}""")
          case DELETE =>
            image(c, tm, present).map(b => s"""{"before":$b}""")
          case UPDATE =>
            for {
              b <- image(c, tm, present)
              a <- image(c, tm, presentAfter)
            } yield s"""{"before":$b,"after":$a}"""
          case PARTIAL_UPDATE =>
            // PARTIAL_UPDATE_ROWS_EVENT (type 39, WL#2955): the after-image
            // opens with a lenenc value_options word; bit 0 = PARTIAL_JSON,
            // which adds a bitmap (one bit per JSON column) marking the
            // columns that arrive as Json_diff vectors instead of full
            // documents — see jsonDiffVector above for the rendering.
            for {
              b <- image(c, tm, present)
              a <- {
                val valueOptions = c.lenenc()
                val partial =
                  if ((valueOptions & 1L) != 0L) c.bytes((nJsonCols + 7) / 8)
                  else null
                image(c, tm, presentAfter, partial)
              }
            } yield s"""{"before":$b,"after":$a}"""
        }
        if (j.isEmpty || c.off > end) return null // unsupported type / torn image
        out += UTF8String.fromString(j.get)
      }
      new GenericArrayData(out.toArray)
    } catch {
      // Truncated or corrupt bytes must NULL the event, never kill the
      // scan: beyond the walk's AIOOBE, a crafted json_binary document can
      // produce negative lengths/offsets (NegativeArraySize,
      // StringIndexOutOfBounds) — at 100 TB of archived binlog a poisoned
      // event WILL exist, and refuse-don't-guess has to hold for it too.
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** The table_id (u48 LE at the start of the post-header) of a TABLE_MAP
    * or ROWS event — the key canal pairs them on. Null for other types.
    */
  def tableId(ev: Array[Byte]): Any = {
    if (ev == null || ev.length < BinlogWire.HeaderLen + 6) return null
    val tpe = ev(4) & 0xff
    if (tpe != TABLE_MAP && tpe != WRITE && tpe != UPDATE && tpe != DELETE &&
      tpe != PARTIAL_UPDATE) return null
    java.lang.Long.valueOf(new Cursor(ev, BinlogWire.HeaderLen).u48())
  }

  /** Column-level API. */
  def binlog_table_id(ev: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      BinlogTableIdDecode(org.apache.spark.sql.GraftColumnBridge.toExpression(ev)))

  def binlog_rows_json(rows: Column, tableMap: Column, hasCrc: Boolean = false): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      BinlogRowsJson(
        org.apache.spark.sql.GraftColumnBridge.toExpression(rows),
        org.apache.spark.sql.GraftColumnBridge.toExpression(tableMap),
        hasCrc))

  def binlog_table(tableMap: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      BinlogTableDecode(org.apache.spark.sql.GraftColumnBridge.toExpression(tableMap)))
}

/** `binlog_table_id(event)` → the u48 table_id of a TABLE_MAP/ROWS event.
  * Own doGenCode: the result is a PRIMITIVE long slot, so the boxed null
  * check must unbox explicitly (the base class's Object assignment only
  * fits struct/array decoders).
  */
case class BinlogTableIdDecode(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    BinlogRows.tableId(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("tid")
      s"""
         |Object $r = graft.functions.BinlogRows.tableId($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): BinlogTableIdDecode =
    copy(child = newChild)
  override def prettyName: String = "binlog_table_id"
}

/** `binlog_table(table_map_event)` → struct(table_id, db, tbl, n_cols). */
case class BinlogTableDecode(child: Expression) extends BinlogDecodeExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("table_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("db", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("tbl", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("n_cols",
      org.apache.spark.sql.types.IntegerType, nullable = false)))
  override protected def staticCall: String = "graft.functions.BinlogRows.tableInfo"
  override protected def javaType: String = "org.apache.spark.sql.catalyst.InternalRow"
  override protected def nullSafeEval(input: Any): Any =
    BinlogRows.tableInfo(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): BinlogTableDecode =
    copy(child = newChild)
  override def prettyName: String = "binlog_table"
}

/** `binlog_rows_json(rows_event, table_map_event[, has_crc])` → array of
  * JSON row changes (see [[BinlogRows]]).
  */
case class BinlogRowsJson(left: Expression, right: Expression, hasCrc: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(rows: Any, tm: Any): Any =
    BinlogRows.rowsJson(rows.asInstanceOf[Array[Byte]], tm.asInstanceOf[Array[Byte]], hasCrc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, t) => {
      val rj = ctx.freshName("rowsJson")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $rj =
         |  graft.functions.BinlogRows.rowsJson($r, $t, $hasCrc);
         |if ($rj == null) { ${ev.isNull} = true; } else { ${ev.value} = $rj; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BinlogRowsJson =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "binlog_rows_json"
}
