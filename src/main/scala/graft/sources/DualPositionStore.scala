package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** Degraded-mode position checkpointing — the reference dual-writes its
  * binlog position to Redis AND a file on every save and restores from
  * whichever survives (reference `main.go:287-306`, `354-360`), so losing
  * either store alone never loses the position. Spark's own offset/commit
  * log is the engine's canonical checkpoint (strictly better-defined); this
  * store is the operational mirror of it — an external, human-readable
  * position surface that tolerates the loss or corruption of either copy.
  *
  * Both copies are written via temp-file + atomic rename (a reader never
  * sees a torn write), and a failure writing one copy does not fail the
  * other — that is the degraded mode. `load()` returns the FRESHEST
  * readable copy (highest `pos`), mirroring the reference's
  * prefer-the-survivor restore.
  */
final class DualPositionStore(primary: Path, secondary: Path) {

  private def writeOne(target: Path, json: String): Boolean = {
    var tmp: Path = null
    try {
      if (target.getParent != null) Files.createDirectories(target.getParent)
      tmp = Files.createTempFile(
        if (target.getParent != null) target.getParent else target.toAbsolutePath.getParent,
        ".pos-", ".tmp")
      Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      true
    } catch {
      case _: Exception =>
        // don't leak one temp file per failed commit
        if (tmp != null) { try Files.deleteIfExists(tmp) catch { case _: Exception => () } }
        false
    }
  }

  /** Write the position to both stores; succeeds if EITHER write lands
    * (degraded mode keeps running on one store, like the reference when
    * Redis is down, `main.go:354-360`). Returns how many copies landed.
    */
  def save(off: CdcOffset): Int = {
    val json = off.json()
    Seq(primary, secondary).count(writeOne(_, json))
  }

  private def readOne(target: Path): Option[CdcOffset] =
    try {
      if (!Files.exists(target)) None
      else CdcOffset.parse(
        new String(Files.readAllBytes(target), StandardCharsets.UTF_8))
    } catch { case _: Exception => None }

  /** Freshest readable position, from whichever copies survive; None only
    * when BOTH are missing/corrupt.
    */
  def load(): Option[CdcOffset] = {
    val copies = Seq(primary, secondary).flatMap(readOne)
    if (copies.isEmpty) None else Some(copies.maxBy(_.pos))
  }

  /** Rotating-file variant: persist the FULL `{name, pos}` the reference
    * checkpoints (`main.go:41-44`). Byte positions reset per binlog file, so
    * a pos-only mirror is ambiguous across rotations — a stale copy from an
    * older, longer file would win `maxBy(pos)` and restore into the wrong
    * file. Freshness here is rotation order: (name, pos) lexicographic,
    * matching [[CdcDirOffset.isBefore]].
    */
  def saveDir(off: CdcDirOffset): Int = {
    val json = off.json()
    Seq(primary, secondary).count(writeOne(_, json))
  }

  private def readDirOne(target: Path): Option[CdcDirOffset] =
    try {
      if (!Files.exists(target)) None
      else CdcDirOffset.parse(
        new String(Files.readAllBytes(target), StandardCharsets.UTF_8))
    } catch { case _: Exception => None }

  /** Freshest readable `{name, pos}` position by rotation order; a pos-only
    * legacy copy fails [[CdcDirOffset.parse]] and is treated as corrupt.
    */
  def loadDir(): Option[CdcDirOffset] = {
    val copies = Seq(primary, secondary).flatMap(readDirOne)
    if (copies.isEmpty) None else Some(copies.maxBy(o => (o.name, o.pos)))
  }
}
