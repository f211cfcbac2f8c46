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

  test(".env loading: godotenv precedence — file fills gaps, real env wins") {
    // the reference's own .env.example dialect, including the trailing
    // comment on LOG_LEVEL, plus quoting and an export prefix
    val dotenv = Files.createTempFile("graft", ".env")
    Files.writeString(dotenv,
      """# reference-style .env
        |DB_ADDR=db.file:3311
        |DB_USER=file_user
        |DB_PASSWORD=
        |SERVER_ID=200
        |POST_URL="http://from-file:8080"
        |export REDIS_ADDR=redis.file:6380
        |LOG_LEVEL=info # trace, debug, info, warn, error
        |
        |not a kv line
        |""".stripMargin)
    val e = ReferenceEnv.fromDotEnv(dotenv.toString,
      env = Map("DB_USER" -> "env_wins", "DB_FLAVOR" -> "mariadb"))
    assert(e.dbAddr == "db.file:3311")       // from the file
    assert(e.dbUser == "env_wins")           // real env overrides the file
    assert(e.dbFlavor == "mariadb")          // env-only key
    assert(e.serverId == 200L)
    assert(e.postUrl == "http://from-file:8080") // quotes stripped
    assert(e.redisAddr == "redis.file:6380")     // export prefix accepted
    assert(e.logLevel == "info")                 // trailing comment stripped
    // a missing file is not an error: pure env/defaults, like the reference
    val miss = ReferenceEnv.fromDotEnv("/nonexistent/.env", env = Map.empty)
    assert(miss.dbAddr == "127.0.0.1:3306" && miss.logLevel == "info")
  }

  test(".env loading: quoted values with trailing comments match godotenv") {
    // godotenv parses the quoted span FIRST, then discards what follows:
    // `KEY="val" # comment` → `val` (not `"val"`), and a '#' INSIDE the
    // quotes is value content, never a comment cut (`"a # b" # c` → `a # b`)
    val dotenv = Files.createTempFile("graft", ".env")
    Files.writeString(dotenv,
      """A="val" # comment
        |B="a # b" # c
        |C='sq # keep' # cut
        |D="plain"
        |E="unterminated # kept verbatim
        |""".stripMargin)
    val vars = ReferenceEnv.loadDotEnv(dotenv.toString, env = Map.empty)
    assert(vars("A") == "val")
    assert(vars("B") == "a # b")
    assert(vars("C") == "sq # keep")
    assert(vars("D") == "plain")
    assert(vars("E") == "\"unterminated # kept verbatim")
  }

  test("address parsing tolerates missing or malformed ports") {
    assert(ReferenceEnv.splitAddr("justhost", 6379) == ("justhost", 6379))
    assert(ReferenceEnv.splitAddr("h:abc", 6379) == ("h:abc", 6379))
    assert(ReferenceEnv.splitAddr("h:1234", 6379) == ("h", 1234))
  }
}
