package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.ReplConfig
import graft.streaming.{CdcConfig, RedisPositionStore, RedisQueue}

/** The reference's ENTIRE configuration surface, env var for env var with
  * the same names and defaults (`/root/reference/main.go:340-348,460-465`)
  * — the last piece of the drop-in story: a user points the deployment's
  * existing environment at this engine and gets the same topology, typed.
  *
  *   DB_ADDR / DB_USER / DB_PASSWORD / DB_FLAVOR / SERVER_ID → [[ReplConfig]]
  *   TABLE_GROUPS_FILE (YAML group→tables)                   → [[CdcConfig]]
  *   POST_URL                                                → HTTP sink base
  *   REDIS_ADDR / REDIS_PASSWORD                             → [[RedisQueue]] +
  *                                                             [[RedisPositionStore]]
  *   POSITION_FILE                                           → file half of the
  *                                                             position dual-write
  *   LOG_LEVEL                                               → carried verbatim
  *
  * A non-empty `REDIS_PASSWORD` makes every RESP connection authenticate
  * with `AUTH` first (the reference authenticates through its client
  * options, `main.go:347-352`); empty = the unauthenticated default.
  */
final case class ReferenceEnv(
    dbAddr: String,
    dbUser: String,
    dbPassword: String,
    dbFlavor: String,
    serverId: Long,
    postUrl: String,
    positionFile: String,
    tableGroupsFile: String,
    redisAddr: String,
    redisPassword: String,
    logLevel: String) {

  /** Replication client identity/connection (the canal config analog). */
  def replConfig(useGtid: Boolean = false): ReplConfig = {
    val (host, port) = ReferenceEnv.splitAddr(dbAddr, 3306)
    ReplConfig(host, port, dbUser, password = dbPassword, serverId = serverId,
      useGtid = useGtid, flavor = dbFlavor)
  }

  /** The routing config, inverted from the same YAML file the reference
    * reads (`main.go:313-332`).
    */
  def cdcConfig(keepDeletes: Boolean = false): CdcConfig = {
    val yaml = new String(Files.readAllBytes(Paths.get(tableGroupsFile)),
      StandardCharsets.UTF_8)
    CdcConfig(Routing.invert(Routing.parseTableGroups(yaml)),
      keepDeletes = keepDeletes)
  }

  def redisQueue: RedisQueue = {
    val (host, port) = ReferenceEnv.splitAddr(redisAddr, 6379)
    RedisQueue(host, port, password = redisPassword) // the cdc_events list
  }

  def redisPositionStore: RedisPositionStore = {
    val (host, port) = ReferenceEnv.splitAddr(redisAddr, 6379)
    RedisPositionStore(host, port, password = redisPassword) // binlog_position
  }
}

object ReferenceEnv {

  /** Build from an environment map — `sys.env` in production, any map in
    * tests. Defaults are the reference's own, verbatim.
    */
  /** The godotenv analog (`main.go:333-337`: `godotenv.Load()` before any
    * `getEnv`): parse `path` as KEY=VALUE lines and merge UNDER the real
    * environment — an already-set env var always wins, exactly
    * godotenv.Load's no-override precedence, so a deployment can ship a
    * `.env` of defaults and still override per-pod. A missing file is not
    * an error (the reference warns and proceeds with the environment,
    * `main.go:336`). Parsing covers the reference's own `.env.example`
    * dialect: blank lines, full-line and trailing `#` comments, optional
    * `export ` prefix, single- or double-quoted values (quotes stripped,
    * trailing comments only recognized OUTSIDE quotes).
    */
  def loadDotEnv(path: String = ".env",
      env: Map[String, String] = sys.env): Map[String, String] = {
    val p = Paths.get(path)
    if (!Files.isReadable(p)) return env
    val fileVars = scala.io.Source.fromBytes(
        Files.readAllBytes(p), "UTF-8").getLines().flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#") || !line.contains('=')) None
      else {
        val stripped = if (line.startsWith("export ")) line.drop(7).trim else line
        val eq = stripped.indexOf('=')
        val key = stripped.take(eq).trim
        val rhs = stripped.drop(eq + 1).trim
        // A quoted value is the span up to its MATCHING closing quote;
        // anything after it (a trailing comment) is discarded. The '#'
        // comment cut only ever applies to unquoted values, so
        // `KEY="a # b" # c` yields `a # b`, matching godotenv.
        val value =
          if (rhs.length >= 2 && (rhs.head == '"' || rhs.head == '\'')) {
            val close = rhs.indexOf(rhs.head.toInt, 1)
            if (close > 0) rhs.substring(1, close)
            else rhs // unterminated quote: keep verbatim
          } else rhs.indexOf('#') match { // trailing comment (unquoted values only)
            case -1 => rhs
            case i => rhs.take(i).trim
          }
        if (key.isEmpty) None else Some(key -> value)
      }
    }.toMap
    fileVars ++ env // real environment wins
  }

  /** `loadDotEnv` + `fromEnv` in one step — the reference's exact startup
    * sequence (`loadEnv()`, `main.go:333`).
    */
  def fromDotEnv(path: String = ".env",
      env: Map[String, String] = sys.env): ReferenceEnv =
    fromEnv(loadDotEnv(path, env))

  def fromEnv(env: Map[String, String] = sys.env): ReferenceEnv = ReferenceEnv(
    dbAddr = env.getOrElse("DB_ADDR", "127.0.0.1:3306"),
    dbUser = env.getOrElse("DB_USER", "root"),
    dbPassword = env.getOrElse("DB_PASSWORD", ""),
    dbFlavor = env.getOrElse("DB_FLAVOR", "mysql"),
    serverId = env.get("SERVER_ID").flatMap(_.toLongOption).getOrElse(1001L),
    postUrl = env.getOrElse("POST_URL", "http://localhost:8080"),
    positionFile = env.getOrElse("POSITION_FILE", "./storage/binlog_position.json"),
    tableGroupsFile = env.getOrElse("TABLE_GROUPS_FILE", "./config/table_groups.yaml"),
    redisAddr = env.getOrElse("REDIS_ADDR", "localhost:6379"),
    redisPassword = env.getOrElse("REDIS_PASSWORD", ""),
    logLevel = env.getOrElse("LOG_LEVEL", "info"))

  private[cdc] def splitAddr(addr: String, defaultPort: Int): (String, Int) =
    addr.lastIndexOf(':') match {
      case -1 => (addr, defaultPort)
      case i =>
        val port = addr.substring(i + 1).toIntOption
        if (port.isEmpty) (addr, defaultPort) else (addr.substring(0, i), port.get)
    }
}
