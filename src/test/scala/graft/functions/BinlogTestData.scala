package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Byte-level binlog v4 fixtures shared by [[BinlogWireSpec]] and the
  * binlog source spec: packs events exactly per the public wire format
  * (LE u32 timestamp, u8 type, LE u32 server_id, LE u32 event_size,
  * LE u32 log_pos, LE u16 flags, body).
  */
object BinlogTestData {

  val magic: Array[Byte] = Array[Byte](0xfe.toByte, 'b', 'i', 'n')

  def event(ts: Long, tpe: Int, serverId: Long, logPos: Long,
      flags: Int, body: Array[Byte]): Array[Byte] = {
    val size = BinlogWire.HeaderLen + body.length
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(ts.toInt).put(tpe.toByte).putInt(serverId.toInt)
      .putInt(size).putInt(logPos.toInt).putShort(flags.toShort)
    b.put(body)
    b.array()
  }

  def rotateBody(pos: Long, name: String): Array[Byte] = {
    val nm = name.getBytes(StandardCharsets.UTF_8)
    val b = ByteBuffer.allocate(8 + nm.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(pos).put(nm)
    b.array()
  }
}
