package graft

import graft.txn.{SnapshotReader, TableWriter, TxnLog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `graft.optimizeWrite` table property: the shared append path
  * rebalances before staging, so the small-file problem is prevented at
  * birth table-wide (autoCompact remains the after-the-fact repair).
  */
class OptimizeWriteSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def fileCount(dir: String): Int =
    new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.size

  test("unpartitioned appends bin-pack N tiny input partitions into few files") {
    val dir = freshDir("optw1")
    TableWriter.write(spark, Seq((0L, "seed")).toDF("id", "s"), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      Map("graft.optimizeWrite" -> "true"), version = 1L, commitTs = 1500L)
    // control table WITHOUT the property, same physical input shape
    val ctl = freshDir("optw1c")
    TableWriter.write(spark, Seq((0L, "seed")).toDF("id", "s"), ctl,
      version = 0L, commitTs = 1000L)
    val batch = (1L to 2000L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(16) // the classic shuffle-partition flood
    TableWriter.append(spark, batch, dir)
    TableWriter.append(spark, batch, ctl)
    val optFiles = fileCount(dir) - 1 // minus the seed file
    val ctlFiles = fileCount(ctl) - 1
    assert(ctlFiles >= 16, s"control should flood (got $ctlFiles)")
    assert(optFiles <= 4, s"optimizeWrite should bin-pack (got $optFiles)")
    // content identical either way
    assert(SnapshotReader.read(spark, dir).agg(sum(col("id"))).head.getLong(0)
      == SnapshotReader.read(spark, ctl).agg(sum(col("id"))).head.getLong(0))
  }

  test("partitioned appends co-locate each partition value; row ids stay " +
      "dense and unique") {
    val dir = freshDir("optw2")
    val seed = Seq((0L, "a", 0L)).toDF("id", "tag", "v")
    TableWriter.write(spark, seed, dir, partitionBy = Seq("tag"),
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      Map("graft.optimizeWrite" -> "true"), version = 1L, commitTs = 1500L)
    val batch = (1L to 3000L).map(i => (i, s"t${i % 3}", i * 7))
      .toDF("id", "tag", "v").repartition(16)
    TableWriter.append(spark, batch, dir)
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    val newFiles = log.read(2L).collect { case a: graft.txn.AddFile => a }
    // one file per partition value, not 16 slivers per value
    val perPv = newFiles.groupBy(_.partitionValues("tag")).map(_._2.size)
    assert(newFiles.size <= 6, s"expected few files, got ${newFiles.size}")
    assert(perPv.forall(_ <= 2), s"per-value file counts: $perPv")
    // stable row ids: present, unique, and the high-water advanced by
    // exactly the row count (the invariant optimizeWrite must not bend)
    val ids = spark.read.format("graft").option("tablePath", dir).load()
      .select(col(TxnLog.RowIdColumn)).collect().map(_.getLong(0))
    assert(ids.length == 3001 && ids.distinct.length == 3001)
  }

  test("tables without the property keep the exact previous write shape") {
    val dir = freshDir("optw3")
    TableWriter.write(spark, Seq((0L, "s")).toDF("id", "s"), dir,
      version = 0L, commitTs = 1000L)
    val batch = (1L to 100L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartition(7)
    TableWriter.append(spark, batch, dir)
    assert(fileCount(dir) - 1 == 7, "no property → no rebalance")
  }
}
