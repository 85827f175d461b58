package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Log retention: expireLog deletes commit files and checkpoints below
  * the newest horizon checkpoint, keeps every retained version
  * resolvable (snapshot, time travel, txn markers), and refuses expired
  * versions with the standard error. The log of a long-lived table
  * stays bounded; data files are untouched.
  */
class LogRetentionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** 25 commits at commitTs = 1000·(v+1); default checkpoint interval
    * (10) puts checkpoints at v10 and v20.
    */
  private def build(): (String, TxnLog) = {
    val path = java.nio.file.Files.createTempDirectory("lr").toString + "/t"
    for (v <- 0L until 25L)
      TableWriter.write(spark, Seq((v, v * 10)).toDF("id", "x"), path,
        version = v, commitTs = 1000L * (v + 1))
    (path, new TxnLog(path, spark.sessionState.newHadoopConf()))
  }

  test("expiry deletes below the horizon checkpoint, keeps the rest") {
    val (path, log) = build()
    assert(log.checkpointVersions() == Seq(10L, 20L))
    // cutoff 18000 -> horizon v16 -> base checkpoint v10
    val deleted = log.expireLog(retainMillis = 8000L, nowMillis = 26000L)
    assert(deleted.size == 10, s"expected commits 0..9 gone, got $deleted")
    assert(log.versions() == (10L to 24L))
    // full state still resolves (from checkpoint 10 + tail)
    assert(spark.read.format("graft").option("tablePath", path).load()
      .count() == 25L)
    // time travel at/above the base works; below refuses loudly
    assert(log.snapshot(15L).files.size == 16)
    val e = intercept[IllegalArgumentException] { log.snapshot(5L) }
    assert(e.getMessage.contains("does not exist"))
  }

  test("a wider horizon expires up to the newest eligible checkpoint") {
    val (_, log) = build()
    // everything is old -> horizon v24 -> base checkpoint v20
    val deleted = log.expireLog(retainMillis = 0L, nowMillis = 99000L)
    assert(log.versions() == (20L to 24L))
    assert(deleted.count(_.endsWith(".json")) == 20)
    assert(deleted.count(_.endsWith(".checkpoint.parquet")) == 1)
    assert(log.checkpointVersions() == Seq(20L))
  }

  test("no eligible checkpoint means a safe no-op") {
    val (_, log) = build()
    // cutoff 9500: old versions v0..v8 only, no checkpoint <= 8
    assert(log.expireLog(retainMillis = 16500L, nowMillis = 26000L).isEmpty)
    assert(log.versions() == (0L to 24L))
  }

  test("txn markers survive expiry through the base checkpoint") {
    val (path, log) = build()
    // marker committed at v25 (ts old enough to be below a later cutoff)
    TableWriter.write(spark, Seq((99L, 990L)).toDF("id", "x"), path,
      version = 25L, commitTs = 26000L, operation = "COPY INTO",
      extraActions = Seq(SetTxn("copy:/x/a.parquet", 1L, 26000L)))
    for (v <- 26L until 31L) // push a checkpoint past the marker (v30)
      TableWriter.write(spark, Seq((v, v)).toDF("id", "x"), path,
        version = v, commitTs = 26000L + v)
    log.expireLog(retainMillis = 0L, nowMillis = 990000L)
    assert(log.versions().head == 30L)
    assert(log.snapshotLatest().txns.contains("copy:/x/a.parquet"),
      "SetTxn must be replayed from the checkpoint after log expiry")
  }

  test("checkpoints carry remove tombstones + cdc refs, expired by age " +
      "against the checkpoint's own clock") {
    val path = java.nio.file.Files.createTempDirectory("lr_tomb").toString + "/t"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(path, conf, checkpointInterval = 0,
      tombstoneRetentionMillis = 5000L)
    def add(p: String) = AddFile(p, Map.empty, 1L, 0L, dataChange = true)
    log.commit(0L, Seq(add("a.parquet"), add("b.parquet"),
      Metadata("""{"type":"struct","fields":[]}""", Seq.empty),
      CommitInfo("WRITE", 1000L)))
    log.commit(1L, Seq(
      RemoveFile("a.parquet", 2000L, Map.empty),
      CdcFile("_change_data/cd-1.parquet", Map.empty, 1L),
      CommitInfo("DELETE", 2000L)))
    log.commit(2L, Seq(RemoveFile("b.parquet", 9500L, Map.empty),
      CommitInfo("DELETE", 9500L)))
    log.commit(3L, Seq(CommitInfo("NOOP", 10000L)))
    // ckptTs = 10000, floor = 5000: b's tombstone (9500) survives, a's
    // (2000) and the cdc ref (commit ts 2000) age out
    log.writeCheckpoint(3L)
    val (tombs, cdc, marker3) = log.readCheckpointExtras(3L)
    assert(tombs.map(_.path) == Seq("b.parquet"), s"got $tombs")
    assert(cdc.isEmpty, s"got $cdc")
    assert(marker3, "new checkpoints must carry the tombstone marker")
    // carry-forward: the NEXT checkpoint re-reads the prior one's
    // retained tombstones without replaying the expired commits
    log.commit(4L, Seq(CommitInfo("NOOP", 11000L)))
    log.writeCheckpoint(4L)
    val (tombs2, _, _) = log.readCheckpointExtras(4L)
    assert(tombs2.map(_.path) == Seq("b.parquet"))
    // a young cdc ref rides along with its commit timestamp stamped
    log.commit(5L, Seq(
      CdcFile("_change_data/cd-5.parquet", Map.empty, 1L),
      CommitInfo("DELETE", 12000L)))
    log.writeCheckpoint(5L)
    val (_, cdc5, _) = log.readCheckpointExtras(5L)
    assert(cdc5.map(c => (c.path, c.commitTimestamp)) ==
      Seq(("_change_data/cd-5.parquet", Some(12000L))))
    // snapshot replay is UNCHANGED by the extra rows
    assert(log.snapshot(5L).files.map(_.path).isEmpty)
  }

  test("a skewed older clock on a newer commit cannot expire retained history") {
    val path = java.nio.file.Files.createTempDirectory("lr2").toString + "/t"
    // v0..v4 at caller-supplied wall clocks — v3's is SKEWED BACKWARD
    val ts = Seq(1000L, 2000L, 3000L, 900L, 5000L)
    for (v <- 0L until 5L)
      TableWriter.write(spark, Seq((v, v)).toDF("id", "x"), path,
        version = v, commitTs = ts(v.toInt))
    val log = new TxnLog(path, spark.sessionState.newHadoopConf())
    log.writeCheckpoint(3L)
    // cutoff 1500: only v0 is genuinely expirable. A newest-first scan
    // trusting monotone clocks would stop at v3 (ts 900), anchor on the
    // v3 checkpoint, and delete v0..v2 — with v1/v2 still in retention.
    val deleted = log.expireLog(retainMillis = 1500L, nowMillis = 3000L)
    assert(deleted.isEmpty, s"skewed clock must retain, got $deleted")
    assert(log.versions() == (0L to 4L))
    (0L to 4L).foreach(v => log.snapshot(v)) // every version still resolves
  }
}
