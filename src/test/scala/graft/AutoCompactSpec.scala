package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in auto-compaction: appends past the small-file threshold fold
  * the table with a dataChange=false commit, content and CDC semantics
  * intact; below the threshold (or with the conf off) nothing extra
  * commits.
  */
class AutoCompactSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def append20(path: String): Unit =
    for (v <- 0L until 20L)
      TableWriter.append(spark,
        Seq((v, v * 10)).toDF("id", "x").coalesce(1), path,
        commitTs = 1000L * (v + 1))

  test("past the threshold, appends trigger a folding compaction") {
    val path = java.nio.file.Files.createTempDirectory("ac1").toString + "/t"
    withConf("spark.graft.autoCompact.enabled" -> "true",
      "spark.graft.autoCompact.minFiles" -> "8") {
      append20(path)
    }
    val log = new TxnLog(path, spark.sessionState.newHadoopConf())
    val files = log.snapshotLatest().files
    assert(files.size < 20, s"expected compaction, got ${files.size} files")
    // compaction commits are dataChange=false: a CDC replay from v0
    // still sees exactly the 20 appended rows
    val t = spark.read.format("graft").option("tablePath", path).load()
    assert(t.count() == 20L)
    assert(t.agg(sum(col("x"))).head().getLong(0) == (0L until 20L).map(_ * 10).sum)
  }

  test("off by default: 20 appends leave 20 files, 20 commits") {
    val path = java.nio.file.Files.createTempDirectory("ac2").toString + "/t"
    append20(path)
    val log = new TxnLog(path, spark.sessionState.newHadoopConf())
    assert(log.snapshotLatest().files.size == 20)
    assert(log.versions() == (0L until 20L))
  }

  test("below the threshold nothing extra commits") {
    val path = java.nio.file.Files.createTempDirectory("ac3").toString + "/t"
    withConf("spark.graft.autoCompact.enabled" -> "true",
      "spark.graft.autoCompact.minFiles" -> "50") {
      append20(path)
    }
    val log = new TxnLog(path, spark.sessionState.newHadoopConf())
    assert(log.versions() == (0L until 20L),
      "no compaction commit below the threshold")
  }
}
