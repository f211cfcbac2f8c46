package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.SparkSuite
import graft.cdc.ReferenceEnv
import graft.functions.{BinlogRows, BinlogTestData, BinlogWire}
import graft.sources.{BinlogSpoolClient, CdcBinlogFileSource, FakeMySqlMaster}

/** THE drop-in proof: the reference's whole deployment — env-var config,
  * MySQL replication tail, row-image decode, routing/envelope transform,
  * HTTP + Redis dual delivery, queue drain, Redis+file position
  * checkpoint — run end-to-end against wire-level fakes of all three
  * external systems (fake mysqld speaking the replication protocol, fake
  * Redis speaking RESP, a real local HTTP sink). Every component is
  * constructed from [[graft.cdc.ReferenceEnv]], i.e. from exactly the
  * environment variables the reference reads. What `main.go` wires from
  * canal + go-redis + net/http, this wires from the engine's own parts.
  */
class ReferenceTopologySpec extends SparkSuite {

  import BinlogTestData.event

  // -- a two-column (LONG id, VARCHAR(20) item) binlog chain, no CRC ------
  private class Buf {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Buf = { out.write(v & 0xff); this }
    def u16(v: Int): Buf = { u8(v); u8(v >> 8) }
    def u32(v: Long): Buf = { u16(v.toInt & 0xffff); u16((v >> 16).toInt & 0xffff) }
    def u48(v: Long): Buf = { u32(v & 0xffffffffL); u16((v >> 32).toInt & 0xffff) }
    def raw(b: Array[Byte]): Buf = { out.write(b); this }
    def str(s: String): Buf = raw(s.getBytes(StandardCharsets.UTF_8))
    def bytes: Array[Byte] = out.toByteArray
  }

  private def tableMap(tableId: Long, db: String, tbl: String): Array[Byte] = {
    val b = new Buf
    b.u48(tableId).u16(1)
    b.u8(db.length).str(db).u8(0)
    b.u8(tbl.length).str(tbl).u8(0)
    b.u8(2)
    b.u8(3).u8(15)  // LONG, VARCHAR
    b.u8(2).u16(20) // metadata: VARCHAR max len
    b.u8(0)
    event(1700000100L, 19, 1, 0, 0, b.bytes)
  }

  private def rowsEvent(tpe: Int, tableId: Long)(rows: (Long, String)*): Array[Byte] = {
    val b = new Buf
    b.u48(tableId).u16(0).u16(2)
    b.u8(2)
    b.u8(0x3)
    if (tpe == 31) b.u8(0x3)
    rows.foreach { case (id, item) =>
      b.u8(0)
      b.u32(id & 0xffffffffL)
      val x = item.getBytes(StandardCharsets.UTF_8)
      b.u8(x.length).raw(x)
    }
    event(1700000200L, tpe, 1, 0, 0, b.bytes)
  }

  test("the reference deployment end-to-end, configured purely from env vars") {
    val fde = event(1700000000L, 15, 1, 0, 0, Array.fill[Byte](57)(0))
    val chain = Seq("ref-bin.000001" -> Seq(fde,
      tableMap(100L, "shop", "orders"),
      rowsEvent(30, 100L)((1L, "apple"), (2L, "pear")), // 2 inserts
      tableMap(200L, "shop", "audit"),
      rowsEvent(30, 200L)((9L, "log")),                 // unrouted table
      rowsEvent(31, 100L)((1L, "apple"), (1L, "banana")), // update pair
      rowsEvent(32, 100L)((2L, "pear"))))               // delete (H2: dropped)

    val master = new FakeMySqlMaster("repl", "pw!", chain)
    val redis = new FakeRedis
    val http = new DebugSink
    val yaml = Files.createTempFile("ref_groups", ".yaml")
    Files.writeString(yaml, "grp_sales:\n  - orders\n")
    val spool = Files.createTempDirectory("ref_spool")
    val posFile = Files.createTempDirectory("ref_pos").resolve("binlog_position.json")
    try {
      // 1. the deployment's environment IS the configuration
      val env = ReferenceEnv.fromEnv(Map(
        "DB_ADDR" -> s"127.0.0.1:${master.port}",
        "DB_USER" -> "repl",
        "DB_PASSWORD" -> "pw!",
        "SERVER_ID" -> "7",
        "POST_URL" -> http.url,
        "POSITION_FILE" -> posFile.toString,
        "TABLE_GROUPS_FILE" -> yaml.toString,
        "REDIS_ADDR" -> s"127.0.0.1:${redis.port}"))

      // 2. live tail: replication protocol → spool (the WAL)
      val client = new BinlogSpoolClient(env.replConfig(), spool)
      try client.run() finally client.close()
      assert(master.authFailure == null, s"auth rejected: ${master.authFailure}")

      // 3. spool → row-image decode → TABLE_MAP pairing → the unchanged
      //    routing/envelope transform, configured from the same YAML file
      //    the reference reads
      val raw = spark.read.format(classOf[CdcBinlogFileSource].getName)
        .option("path", spool.resolve("ref-bin.000001").toString).load()
        .select(col("event"), col("pos"),
          BinlogWire.binlog_header(col("event")).getField("event_type").as("tpe"))
      val maps = raw.filter(col("tpe") === 19)
        .select(BinlogRows.binlog_table(col("event")).getField("table_id").as("table_id"),
          BinlogRows.binlog_table(col("event")).getField("tbl").as("tbl"),
          col("pos").as("map_pos"), col("event").as("tm"))
      val mapSchema = MapType(StringType, StringType)
      val changes = raw.filter(col("tpe").isin(30, 31, 32))
        .withColumn("table_id", BinlogRows.binlog_table_id(col("event")))
        .join(maps, "table_id")
        .filter(col("map_pos") < col("pos"))
        .groupBy(col("pos"), col("event"), col("tpe"))
        .agg(max_by(struct(col("tm"), col("tbl")), col("map_pos")).as("m"))
        .select(col("m.tbl").as("table"), col("tpe"),
          explode(BinlogRows.binlog_rows_json(col("event"), col("m.tm"))).as("chg"))
        .select(
          col("table"),
          when(col("tpe") === 30, "insert").when(col("tpe") === 31, "update")
            .otherwise("delete").as("op"),
          from_json(get_json_object(col("chg"), "$.before"), mapSchema).as("before"),
          from_json(get_json_object(col("chg"), "$.after"), mapSchema).as("after"),
          timestamp_seconds(lit(1700000200L)).as("ts"))
      val envelopes = CdcPipeline.transform(changes, env.cdcConfig())

      // 4. dual delivery: direct HTTP POST + the reference's Redis list
      Sinks.httpDeliverBatch(envelopes, env.postUrl, checkStatus = false)
      Sinks.queueDeliverBatch(envelopes, env.redisQueue)
      // audit unrouted, delete dropped (H2): 2 inserts + 1 update
      assert(http.captured.size == 3,
        s"direct deliveries: ${http.captured.size}")
      assert(env.redisQueue.pending == 3)
      assert(redis.lists.get("cdc_events").size == 3)
      assert(http.captured.stream().allMatch(_.path == "/grp_sales"))

      // 5. the drain worker: pops the list, POSTs again (at-least-once)
      val drained = Sinks.drainQueue(env.postUrl, env.cdcConfig().tableToGroup,
        q = env.redisQueue)
      assert(drained == 3 && env.redisQueue.pending == 0)
      assert(http.captured.size == 6)

      // 6. position checkpoint, dual-written like main.go:287-306: the
      //    spool names its own {name, pos}, stored to Redis AND the file
      val (name, pos) = client.resumePosition()
      assert(name == "ref-bin.000001" && pos > 4L)
      val posJson = s"""{"name":"$name","pos":$pos}"""
      assert(env.redisPositionStore.save(posJson))
      Files.writeString(posFile, posJson)
      assert(env.redisPositionStore.load().contains(posJson))
      assert(Files.readString(posFile) == posJson)
    } finally {
      master.close(); redis.close(); http.stop()
    }
  }
}
