package graft

import graft.txn._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class TxnLogSpec extends AnyFunSuite {

  private def freshLog(): TxnLog = {
    val dir = Files.createTempDirectory("txnlog").toString
    new TxnLog(dir, new org.apache.hadoop.conf.Configuration())
  }

  test("commit/read round-trips every action type") {
    val log = freshLog()
    val actions = Seq(
      Metadata("""{"type":"struct","fields":[]}""", Seq("p")),
      AddFile("p=1/part-0.parquet", Map("p" -> "1"), 123L, 1000L, dataChange = true),
      RemoveFile("p=2/part-9.parquet", 2000L, Map("p" -> "2")),
      CommitInfo("WRITE", 1000L))
    log.commit(0L, actions)
    assert(log.read(0L) == actions)
    assert(log.versions() == Seq(0L))
  }

  test("double commit of the same version fails") {
    val log = freshLog()
    log.commit(0L, Seq(CommitInfo("WRITE", 1L)))
    intercept[IllegalStateException] { log.commit(0L, Seq(CommitInfo("WRITE", 2L))) }
  }

  test("snapshot replays adds minus removes across versions") {
    val log = freshLog()
    log.commit(0L, Seq(
      AddFile("a.parquet", Map.empty, 1, 10L, dataChange = true),
      AddFile("b.parquet", Map.empty, 1, 10L, dataChange = true),
      CommitInfo("WRITE", 10L)))
    log.commit(1L, Seq(
      RemoveFile("a.parquet", 20L, Map.empty),
      AddFile("c.parquet", Map.empty, 1, 20L, dataChange = true),
      CommitInfo("MERGE", 20L)))
    assert(log.snapshot(0L).files.map(_.path).sorted == Seq("a.parquet", "b.parquet"))
    assert(log.snapshot(1L).files.map(_.path).sorted == Seq("b.parquet", "c.parquet"))
    assert(log.snapshotLatest().version == 1L)
  }

  test("timestamp-as-of picks greatest commit at-or-before, errors before first") {
    val log = freshLog()
    log.commit(0L, Seq(CommitInfo("WRITE", 100L)))
    log.commit(1L, Seq(CommitInfo("WRITE", 200L)))
    assert(log.versionAtTimestamp(100L) == 0L)
    assert(log.versionAtTimestamp(150L) == 0L)
    assert(log.versionAtTimestamp(999L) == 1L)
    intercept[IllegalArgumentException] { log.versionAtTimestamp(99L) }
  }

  test("missing version errors (strict, no silent fallback)") {
    val log = freshLog()
    intercept[IllegalArgumentException] { log.snapshot(0L) }
  }

  // Seeded exhaustive-ish property checks over the small offset lattice
  // (2 phases × 6 versions × 7 fileIndexes × 7 rowNums = 588 points).
  private val lattice: Seq[CdcOffset] = for {
    p <- 0 to 1; v <- 0L to 5L; f <- -1L to 5L; r <- -1L to 5L
  } yield CdcOffset(p, v, f, r)

  test("offset ordering is a total order (antisymmetric, transitive)") {
    val rnd = new scala.util.Random(42)
    val sample = Seq.fill(3000)(lattice(rnd.nextInt(lattice.size)))
    sample.grouped(3).foreach {
      case Seq(a, b, c) =>
        assert(math.signum(a.compare(b)) == -math.signum(b.compare(a)))
        if (a <= b && b <= c) assert(a <= c)
        assert((a.compare(b) == 0) == (a == b))
      case _ => ()
    }
  }

  test("full-copy phase precedes incremental at any position") {
    val fulls = lattice.filter(_.phase == 0)
    val incrs = lattice.filter(_.phase == 1).take(60)
    assert(fulls.nonEmpty && incrs.nonEmpty)
    for (a <- fulls; b <- incrs) assert(a < b)
  }

  test("offset JSON round-trips across the lattice") {
    lattice.foreach(o => assert(CdcOffset.fromJson(o.json) == o))
  }
}
