package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Machine-checks COVERAGE.md's "Batch≡stream equivalence ledger" (r11,
  * verdict ask: the streaming tier's verification should be as auditable
  * as the oracle tier's). Fails when:
  *   - a `.scala` file under src/main/scala/graft/streaming/ has no table
  *     row (a new streaming operator must declare its batch oracle or be
  *     explicitly marked infra with `—`);
  *   - a row's pinning spec class does not exist in graft.streaming;
  *   - a row's batch equivalent is not a SparkEntry.queries key (so the
  *     declared oracle is a real, correctness-gated query).
  *
  * No SparkSession needed — this is a pure ledger check, which is the
  * point: the ledger is data the build can verify, not prose.
  */
class StreamingEquivalenceSpec extends AnyFunSuite {

  private def repoRoot: java.nio.file.Path = {
    // forked test JVMs run with cwd = the sbt base directory; fall back to
    // walking up from cwd until COVERAGE.md is found (IDE runners)
    var p = Paths.get(sys.props("user.dir")).toAbsolutePath
    while (p != null && !Files.exists(p.resolve("COVERAGE.md"))) p = p.getParent
    assert(p != null, s"COVERAGE.md not found above ${sys.props("user.dir")}")
    p
  }

  private case class LedgerRow(file: String, spec: String, batch: Seq[String])

  private def parseLedger(): Seq[LedgerRow] = {
    val lines = Files.readAllLines(repoRoot.resolve("COVERAGE.md")).asScala
    val start = lines.indexWhere(_.startsWith("### Batch≡stream equivalence ledger"))
    assert(start >= 0, "ledger section missing from COVERAGE.md")
    val rows = lines.drop(start).takeWhile(!_.startsWith("## ")).filter(l =>
      l.startsWith("| `") && l.contains(".scala`"))
    rows.toSeq.map { l =>
      val cells = l.split("\\|").map(_.trim).filter(_.nonEmpty)
      assert(cells.length == 3, s"malformed ledger row: $l")
      def unquote(c: String) = c.split("`").filter(_.trim.nonEmpty)
        .map(_.trim).filter(!_.startsWith(",")).toSeq
      val batch = if (cells(2) == "—") Seq.empty else unquote(cells(2))
      LedgerRow(unquote(cells(0)).head, unquote(cells(1)).head, batch)
    }
  }

  test("every streaming operator file has a ledger row") {
    val files = Files.list(repoRoot.resolve("src/main/scala/graft/streaming"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".scala")).toSet
    val declared = parseLedger().map(_.file).toSet
    val missing = files -- declared
    assert(missing.isEmpty,
      s"streaming files without a batch≡stream ledger row in COVERAGE.md: $missing")
    val stale = declared -- files
    assert(stale.isEmpty, s"ledger rows for files that no longer exist: $stale")
  }

  test("every declared pinning spec class exists") {
    parseLedger().foreach { r =>
      val cls = s"graft.streaming.${r.spec}"
      assert(
        try { Class.forName(cls); true } catch { case _: ClassNotFoundException => false },
        s"${r.file}: pinning spec $cls not found")
    }
  }

  test("every declared batch equivalent is an oracle-gated SparkEntry query") {
    val known = graft.SparkEntry.queries.keySet
    parseLedger().foreach { r =>
      val unknown = r.batch.filterNot(known.contains)
      assert(unknown.isEmpty, s"${r.file}: batch equivalents not in SparkEntry.queries: $unknown")
    }
    // at least the 11 operator rows must declare a batch equivalent —
    // the ledger is vacuous if everything claims infra
    assert(parseLedger().count(_.batch.nonEmpty) >= 11, "operator rows lost their batch oracles")
  }
}
