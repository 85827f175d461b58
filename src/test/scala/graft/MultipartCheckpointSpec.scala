package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{SnapshotReader, TableWriter, TxnLog}

/** Multi-part checkpoints: a state bigger than checkpointPartSize splits
  * across `v.checkpoint.<i>.<n>.parquet` parts; readers require a
  * COMPLETE set (crash leftovers are ignored, never torn-read), and
  * expireLog sweeps part files with their version.
  */
class MultipartCheckpointSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def conf = spark.sessionState.newHadoopConf()

  private def base = {
    import spark.implicits._
    (0L until 200L).map(k => (k, k * 10L)).toDF("k", "cents")
      .repartition(20)
  }

  private def partFiles(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_txn_log")
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.matches("""\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet"""))
      .sorted
  }

  test("an over-size state checkpoints as a complete part set that " +
      "resolves identically to commit replay") {
    val dir = freshDir("mpcp")
    TableWriter.write(spark, base, dir, version = 0L, commitTs = 1000L)
    val replayOnly = new TxnLog(dir, conf).snapshot(0L)
    assert(replayOnly.files.size == 20)
    val log = new TxnLog(dir, conf, checkpointPartSize = 7)
    log.writeCheckpoint(0L)
    // 20 adds + meta/protocol lines at 7 per part => at least 3 parts,
    // parts 1..n all present
    val parts = partFiles(dir)
    assert(parts.size >= 3, s"expected a part set, got $parts")
    assert(log.checkpointVersions() == Seq(0L))
    // a FRESH log resolves from the part set to the identical state
    val viaCp = new TxnLog(dir, conf).snapshot(0L)
    assert(viaCp.files.map(_.path).sorted ==
      replayOnly.files.map(_.path).sorted)
    assert(viaCp.metadata == replayOnly.metadata)
    assert(SnapshotReader.read(spark, dir).count() == 200L)
  }

  test("an incomplete part set is ignored (crash leftovers); expireLog " +
      "sweeps part files with their version") {
    val dir = freshDir("mpcp_crash")
    TableWriter.write(spark, base, dir, version = 0L, commitTs = 1000L)
    val log = new TxnLog(dir, conf, checkpointPartSize = 7)
    log.writeCheckpoint(0L)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    // simulate a crash mid-set: one part missing => NOT a checkpoint
    val victim = partFiles(dir).head
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$dir/_txn_log/$victim"), false))
    assert(new TxnLog(dir, conf).checkpointVersions().isEmpty)
    // resolution falls back to commit replay and still answers
    assert(new TxnLog(dir, conf).snapshot(0L).files.size == 20)
    // rewrite the set (idempotent), add history, checkpoint later, expire
    log.writeCheckpoint(0L)
    import spark.implicits._
    TableWriter.append(spark,
      Seq((900L, 1L)).toDF("k", "cents"), dir, commitTs = 2000L)
    log.writeCheckpoint(1L)
    val deleted = new TxnLog(dir, conf)
      .expireLog(retainMillis = 0L, nowMillis = 1000000L)
    assert(deleted.exists(_.contains("checkpoint.0000000001")),
      s"expected v0 part files swept, got $deleted")
    assert(partFiles(dir).forall(_.startsWith("00000000000000000001")))
    assert(SnapshotReader.read(spark, dir).count() == 201L)
  }
}
