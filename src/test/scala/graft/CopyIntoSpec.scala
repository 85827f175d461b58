package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COPY INTO: exactly-once file ingestion via SetTxn markers committed
  * atomically with the data — retries skip, late-arriving files ingest
  * alone, markers survive checkpoint compaction, and schema-widening
  * sources refuse.
  */
class CopyIntoSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def writeSrcFile(dir: String, name: String,
      rows: Seq[(Long, Long)]): Unit = {
    val stage = tmp("cis_stage")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(stage)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(dir, name))
  }

  private def freshTable(): String = {
    val path = tmp("cis_t") + "/t"
    TableWriter.write(spark, Seq((0L, 0L)).toDF("id", "v"), path,
      version = 0L, commitTs = 1000L)
    path
  }

  private def tableIds(path: String): Set[Long] =
    spark.read.format("graft").option("tablePath", path).load()
      .select(col("id")).collect().map(_.getLong(0)).toSet

  test("ingests each file exactly once across retries") {
    val src = tmp("cis_src")
    writeSrcFile(src, "a.parquet", Seq((1L, 10L), (2L, 20L)))
    writeSrcFile(src, "b.parquet", Seq((3L, 30L)))
    val t = freshTable()
    val r1 = CopyInto.run(spark, t, src)
    assert(r1.filesCopied == 2L && r1.rowsCopied == 3L)
    val r2 = CopyInto.run(spark, t, src)
    assert(r2.filesCopied == 0L && r2.filesSkipped == 2L)
    assert(r2.version == r1.version, "a no-op retry must not commit")
    assert(tableIds(t) == Set(0L, 1L, 2L, 3L))
  }

  test("late-arriving files ingest alone") {
    val src = tmp("cis_src2")
    writeSrcFile(src, "a.parquet", Seq((1L, 10L)))
    val t = freshTable()
    CopyInto.run(spark, t, src)
    writeSrcFile(src, "c.parquet", Seq((9L, 90L)))
    val r = CopyInto.run(spark, t, src)
    assert(r.filesCopied == 1L && r.filesSkipped == 1L)
    assert(tableIds(t) == Set(0L, 1L, 9L))
  }

  test("txn markers survive a parquet checkpoint") {
    val src = tmp("cis_src3")
    writeSrcFile(src, "a.parquet", Seq((1L, 10L)))
    val t = freshTable()
    CopyInto.run(spark, t, src)
    val log = new TxnLog(t, spark.sessionState.newHadoopConf())
    log.writeCheckpoint(log.latestVersion().get)
    // a snapshot resolved THROUGH the checkpoint still skips the file
    val r = CopyInto.run(spark, t, src)
    assert(r.filesCopied == 0L && r.filesSkipped == 1L)
  }

  test("txn-marker retention bounds the marker set at checkpoint time") {
    val t = freshTable()
    val now = 1000L * 1000L
    val week = 7L * 24 * 3600 * 1000
    // two markers: one ancient (beyond the window), one fresh
    val log0 = new TxnLog(t, spark.sessionState.newHadoopConf())
    log0.commit(1L, Seq(
      SetTxn("copy:file:/old.parquet", 1L, now - week - 1),
      SetTxn("copy:file:/new.parquet", 1L, now - 1),
      CommitInfo("COPY INTO", now)))
    // checkpoint WITH retention: the ancient marker drops (the documented
    // idempotence-window trade), the fresh one survives the round-trip
    val bounded = new TxnLog(t, spark.sessionState.newHadoopConf(),
      txnRetentionMillis = Some(week))
    bounded.writeCheckpoint(1L)
    val resolved = new TxnLog(t, spark.sessionState.newHadoopConf())
      .snapshotLatest().txns.keySet
    assert(resolved.contains("copy:file:/new.parquet"))
    assert(!resolved.contains("copy:file:/old.parquet"),
      "a marker past the retention window must not persist")
    // default (no retention), on a separate table — the same checkpoint
    // version never rewrites: EVERY marker persists however old
    val t2 = freshTable()
    new TxnLog(t2, spark.sessionState.newHadoopConf()).commit(1L, Seq(
      SetTxn("copy:file:/old.parquet", 1L, now - week - 1),
      SetTxn("copy:file:/new.parquet", 1L, now - 1),
      CommitInfo("COPY INTO", now)))
    new TxnLog(t2, spark.sessionState.newHadoopConf()).writeCheckpoint(1L)
    assert(new TxnLog(t2, spark.sessionState.newHadoopConf())
      .snapshotLatest().txns.keySet
      .count(_.startsWith("copy:")) == 2)
  }

  test("appendIdempotent lands once per (appId, txnVersion)") {
    val t = freshTable()
    val batch = Seq((5L, 50L), (6L, 60L)).toDF("id", "v")
    assert(TableWriter.appendIdempotent(spark, batch, t,
      appId = "job-a", txnVersion = 1L).isDefined)
    // the retry of the SAME epoch skips — no commit, no duplicates
    assert(TableWriter.appendIdempotent(spark, batch, t,
      appId = "job-a", txnVersion = 1L).isEmpty)
    assert(tableIds(t) == Set(0L, 5L, 6L))
    // a NEWER epoch lands; an OLDER one (out-of-order replay) skips
    assert(TableWriter.appendIdempotent(spark,
      Seq((7L, 70L)).toDF("id", "v"), t, "job-a", 2L).isDefined)
    assert(TableWriter.appendIdempotent(spark,
      Seq((8L, 80L)).toDF("id", "v"), t, "job-a", 1L).isEmpty)
    // a different app's epochs are independent
    assert(TableWriter.appendIdempotent(spark,
      Seq((9L, 90L)).toDF("id", "v"), t, "job-b", 1L).isDefined)
    assert(tableIds(t) == Set(0L, 5L, 6L, 7L, 9L))
  }

  test("a source file with extra columns refuses loudly") {
    val src = tmp("cis_src4")
    val stage = tmp("cis_stage4")
    Seq((1L, 10L, "boom")).toDF("id", "v", "extra")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(src))
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(src, "x.parquet"))
    val t = freshTable()
    val e = intercept[IllegalArgumentException] {
      CopyInto.run(spark, t, src)
    }
    assert(e.getMessage.contains("extra"))
  }

  test("nested plain subdirectories ingest recursively") {
    val src = tmp("cis_src5")
    writeSrcFile(src, "a.parquet", Seq((1L, 10L)))
    writeSrcFile(src + "/day1", "b.parquet", Seq((2L, 20L)))
    writeSrcFile(src + "/day1/late", "c.parquet", Seq((3L, 30L)))
    val t = freshTable()
    val r = CopyInto.run(spark, t, src)
    assert(r.filesCopied == 3L && r.rowsCopied == 3L,
      s"nested files must ingest, got $r")
    assert(tableIds(t) == Set(0L, 1L, 2L, 3L))
    val r2 = CopyInto.run(spark, t, src)
    assert(r2.filesCopied == 0L && r2.filesSkipped == 3L)
  }

  test("a hive-partitioned source refuses toward CONVERT") {
    val src = tmp("cis_src6")
    writeSrcFile(src + "/band=1", "a.parquet", Seq((1L, 10L)))
    val t = freshTable()
    val e = intercept[IllegalArgumentException] {
      CopyInto.run(spark, t, src)
    }
    assert(e.getMessage.contains("graft_convert"))
  }

  test("legacy path-only markers still count as ingested") {
    val src = tmp("cis_src8")
    writeSrcFile(src, "a.parquet", Seq((1L, 10L)))
    val t = freshTable()
    // a marker in the PRE-URI format (scheme-less path), as an older
    // engine version would have written it
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
    val legacy = fs.makeQualified(
      new org.apache.hadoop.fs.Path(src, "a.parquet")).toUri.getPath
    TableWriter.write(spark, Seq((0L, 0L)).toDF("id", "v"), t,
      version = 1L, commitTs = 1500L, operation = "COPY INTO",
      extraActions = Seq(SetTxn(s"copy:$legacy", 1L, 1500L)))
    val r = CopyInto.run(spark, t, src)
    assert(r.filesCopied == 0L && r.filesSkipped == 1L,
      s"a legacy marker must not re-ingest, got $r")
  }

  test("idempotence keys are fully-qualified URIs") {
    val src = tmp("cis_src7")
    writeSrcFile(src, "a.parquet", Seq((1L, 10L)))
    val t = freshTable()
    CopyInto.run(spark, t, src)
    val log = new TxnLog(t, spark.sessionState.newHadoopConf())
    val keys = log.snapshotLatest().txns.keySet.filter(_.startsWith("copy:"))
    // scheme + authority present: the same path on another filesystem
    // must not alias as already-ingested
    assert(keys.nonEmpty && keys.forall(_.startsWith("copy:file:")),
      s"marker keys must carry the filesystem scheme, got $keys")
  }
}
