package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{ChangeDataFeed, Fsck, SnapshotReader, TableWriter, TxnLog}

/** FSCK REPAIR TABLE: out-of-band file loss reconciles into remove
  * commits — snapshots heal, the row-materializing change feed refuses
  * the unrecoverable range, the metadata-only audit still counts it.
  */
class FsckSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  /** 200-row keyed frame partitioned 4 ways by grp ⇒ ≥4 data files. */
  private def base = {
    import spark.implicits._
    (0L until 200L).map(k => (k, (k % 4).toString, k * 10L))
      .toDF("k", "grp", "cents")
  }

  private def loseOneFile(dir: String): (String, Long) = {
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    val victim = log.snapshotLatest().files.minBy(_.path)
    val lostRows = victim.stats.get.numRecords
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$dir/${victim.path}"), false))
    (victim.path, lostRows)
  }

  test("missingFiles lists lost paths; repair commits removes; snapshot " +
      "heals; repeat repair is a no-op") {
    val dir = freshDir("fsck_basic")
    TableWriter.write(spark, base, dir, partitionBy = Seq("grp"),
      version = 0L, commitTs = 1000L)
    assert(Fsck.missingFiles(spark, dir).isEmpty)
    val (victim, lostRows) = loseOneFile(dir)
    assert(lostRows > 0L)
    // dry-run view sees exactly the lost path; the log is untouched
    assert(Fsck.missingFiles(spark, dir) == Seq(victim))
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    assert(log.latestVersion().contains(0L))
    // a plain read now crashes on the lost split (the failure FSCK fixes)
    intercept[Exception] {
      SnapshotReader.read(spark, dir).count()
    }
    // repair: one commit, dataChange removes, FSCK op marker
    assert(Fsck.repair(spark, dir, commitTs = 2000L) == Seq(victim))
    assert(log.latestVersion().contains(1L))
    val removes = log.read(1L).collect {
      case r: graft.txn.RemoveFile => r }
    assert(removes.map(_.path) == Seq(victim) &&
      removes.forall(r => r.dataChange && r.partitionValues.nonEmpty))
    // the snapshot heals: remaining rows read fine
    assert(SnapshotReader.read(spark, dir).count() == 200L - lostRows)
    // idempotent: nothing left to repair, no empty commit
    assert(Fsck.repair(spark, dir, commitTs = 3000L).isEmpty)
    assert(log.latestVersion().contains(1L))
  }

  test("change feed refuses across an FSCK commit; changesSummary still " +
      "audits the lost counts from stats") {
    val dir = freshDir("fsck_cdf")
    TableWriter.write(spark, base, dir, partitionBy = Seq("grp"),
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark,
      dir, Map(ChangeDataFeed.Prop -> "true"), version = 1L,
      commitTs = 1500L)
    TableWriter.append(spark, base.filter(col("k") < 8)
      .select((col("k") + 1000L).as("k"), col("grp"), col("cents")),
      dir, partitionBy = Seq("grp"), commitTs = 2000L)
    val (_, lostRows) = loseOneFile(dir)
    Fsck.repair(spark, dir, commitTs = 3000L)
    // rows of the lost file are unrecoverable: the feed refuses a range
    // crossing the FSCK version instead of crashing mid-scan
    val e = intercept[IllegalArgumentException] {
      ChangeDataFeed.tableChanges(spark, dir, 2L, Some(3L)).collect()
    }
    assert(e.getMessage.contains("FSCK"))
    // a range strictly before it still reads
    assert(ChangeDataFeed.tableChanges(spark, dir, 2L, Some(2L))
      .count() == 8L)
    // the metadata-only audit reports the loss as deletes, from stats
    val audit = ChangeDataFeed.changesSummary(spark, dir, 3L, Some(3L))
      .select("change_type", "n_rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit == Map(ChangeDataFeed.Delete -> lostRows))
    // the file-level CDC envelope reader refuses too ('r' events would
    // read the lost bytes)
    val e2 = intercept[IllegalArgumentException] {
      graft.txn.CdcReader.cdc(spark, dir, startingVersion = 2L,
        includeHistory = false)
    }
    assert(e2.getMessage.contains("FSCK"))
  }
}
