package graft.cdc

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The drop-in config contract: the same env vars, names, and defaults the
  * reference reads (`main.go:340-348,460-465`) must produce the typed
  * configs the engine's components take.
  */
class ReferenceEnvSpec extends AnyFunSuite {

  test("defaults are the reference's own, verbatim") {
    val e = ReferenceEnv.fromEnv(Map.empty)
    assert(e.dbAddr == "127.0.0.1:3306" && e.dbUser == "root" &&
      e.dbPassword == "" && e.dbFlavor == "mysql" && e.serverId == 1001L)
    assert(e.postUrl == "http://localhost:8080")
    assert(e.positionFile == "./storage/binlog_position.json")
    assert(e.tableGroupsFile == "./config/table_groups.yaml")
    assert(e.redisAddr == "localhost:6379" && e.redisPassword == "")
    assert(e.logLevel == "info")
    val rc = e.replConfig()
    assert(rc.host == "127.0.0.1" && rc.port == 3306 && rc.flavor == "mysql")
  }

  test("a full environment wires every component") {
    val yaml = Files.createTempFile("groups", ".yaml")
    Files.writeString(yaml,
      """grp_sales:
        |  - orders
        |  - lineitem
        |grp_dim:
        |  - customer
        |""".stripMargin)
    val e = ReferenceEnv.fromEnv(Map(
      "DB_ADDR" -> "db.internal:3307",
      "DB_USER" -> "repl",
      "DB_PASSWORD" -> "s3cret",
      "DB_FLAVOR" -> "mariadb",
      "SERVER_ID" -> "4242",
      "POST_URL" -> "http://sink:9000",
      "TABLE_GROUPS_FILE" -> yaml.toString,
      "REDIS_ADDR" -> "cache.internal:6380"))
    val rc = e.replConfig(useGtid = true)
    assert(rc.host == "db.internal" && rc.port == 3307 && rc.user == "repl" &&
      rc.password == "s3cret" && rc.serverId == 4242L &&
      rc.flavor == "mariadb" && rc.useGtid)
    val cfg = e.cdcConfig()
    assert(cfg.tableToGroup == Map(
      "orders" -> "grp_sales", "lineitem" -> "grp_sales",
      "customer" -> "grp_dim"))
    assert(e.redisQueue == graft.streaming.RedisQueue("cache.internal", 6380))
    assert(e.redisPositionStore ==
      graft.streaming.RedisPositionStore("cache.internal", 6380))
  }

  test("address parsing tolerates missing or malformed ports") {
    assert(ReferenceEnv.splitAddr("justhost", 6379) == ("justhost", 6379))
    assert(ReferenceEnv.splitAddr("h:abc", 6379) == ("h:abc", 6379))
    assert(ReferenceEnv.splitAddr("h:1234", 6379) == ("h", 1234))
  }
}
