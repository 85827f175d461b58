package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{DataSkipping, DeletionVectors, SnapshotReader, TableWriter, TxnLog}

/** Partition evolution: SET PARTITIONING is metadata-only, later appends
  * follow the evolved spec, mixed-layout snapshots reconstruct exactly,
  * pruning uses hive values on the new generation, DV deletes span
  * generations, and OPTIMIZE migrates old files into the current spec.
  */
class PartitionEvolutionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def ordersWithYear = Tables.load(spark, sf, "orders")
    .withColumn("o_year", year(col("o_orderdate")))

  private def evolved(tag: String): String = {
    val dir = freshDir(tag)
    val o = ordersWithYear
    TableWriter.write(spark, o.filter(col("o_orderkey") % 2 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setPartitioning(spark, dir, Seq("o_year"),
      version = 1L, commitTs = 2000L)
    TableWriter.append(spark, o.filter(col("o_orderkey") % 2 === 1), dir,
      commitTs = 3000L)
    dir
  }

  test("evolution is metadata-only and appends follow the new spec") {
    val dir = evolved("pevo1")
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    val snap = log.snapshot(1L)
    // v1 added no files, but switched the declared spec
    assert(log.changes(1L).find(_._1 == 1L).get._2
      .collect { case a: graft.txn.AddFile => a }.isEmpty)
    assert(snap.metadata.get.partitionColumns == Seq("o_year"))
    // gen-0 files carry no partition values; gen-2 files carry o_year
    val files = log.snapshotLatest().files
    val (gen2, gen0) = files.partition(_.partitionValues.contains("o_year"))
    assert(gen0.nonEmpty && gen2.nonEmpty)
    assert(gen2.map(_.partitionValues("o_year")).toSet.size > 1)
  }

  test("mixed-layout snapshot reconstructs the exact row set") {
    val dir = evolved("pevo2")
    val got = SnapshotReader.read(spark, dir)
      .select(col("o_orderkey"), col("o_year"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val want = ordersWithYear
      .select(col("o_orderkey"), col("o_year"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("year filter prunes evolved-generation files by hive value") {
    val dir = evolved("pevo3")
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    val all = log.snapshotLatest().files
    val (kept, _, _) = DataSkipping.filesFor(spark, dir, col("o_year") === 1995)
    // every gen-2 file for a different year must be gone
    val wrongYearKept = kept.filter(f =>
      f.partitionValues.get("o_year").exists(_ != "1995"))
    assert(wrongYearKept.isEmpty,
      s"kept ${wrongYearKept.size} files of other years")
    assert(kept.size < all.size, "pruning dropped nothing")
    // and the residual read is still exact
    val got = DataSkipping.readWhere(spark, dir, col("o_year") === 1995).count()
    val want = ordersWithYear.filter(col("o_year") === 1995).count()
    assert(got == want)
  }

  test("DV delete spans generations; CDC replays both layouts") {
    val dir = evolved("pevo4")
    DeletionVectors.deleteWhere(spark, dir, col("o_orderkey") % 10 === 3,
      version = 3L, commitTs = 4000L)
    val got = SnapshotReader.read(spark, dir).count()
    val want = ordersWithYear.filter(col("o_orderkey") % 10 =!= 3).count()
    assert(got == want)
    // CDC from 0: adds of both layouts + the DV delete events replay
    val cdc = graft.txn.CdcReader.cdc(spark, dir, startingVersion = 0L)
    val byOp = cdc.groupBy(col("op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = ordersWithYear.count()
    assert(byOp("c") == total)
    assert(byOp("d") == total - want)
  }

  test("OPTIMIZE migrates pre-evolution files into the current spec") {
    val dir = freshDir("pevo5")
    val o = ordersWithYear
    // two unpartitioned commits so the empty-spec group is compactable
    TableWriter.write(spark, o.filter(col("o_orderkey") % 4 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.append(spark, o.filter(col("o_orderkey") % 4 === 2), dir,
      commitTs = 1500L)
    TableWriter.setPartitioning(spark, dir, Seq("o_year"),
      version = 2L, commitTs = 2000L)
    TableWriter.compact(spark, dir, version = 3L, commitTs = 3000L,
      minFileBytes = Long.MaxValue)
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    val files = log.snapshotLatest().files
    assert(files.forall(_.partitionValues.contains("o_year")),
      "compaction left files outside the current spec")
    val got = SnapshotReader.read(spark, dir).count()
    assert(got == o.filter(col("o_orderkey") % 2 === 0).count())
  }

  test("setPartitioning validates columns") {
    val dir = freshDir("pevo6")
    TableWriter.write(spark, ordersWithYear.limit(100), dir,
      version = 0L, commitTs = 1000L)
    intercept[IllegalArgumentException] {
      TableWriter.setPartitioning(spark, dir, Seq("nope"), 1L, 2000L)
    }
    TableWriter.renameColumn(spark, dir, "o_orderpriority", "o_prio", 1L, 2000L)
    intercept[IllegalArgumentException] {
      TableWriter.setPartitioning(spark, dir, Seq("o_prio"), 2L, 3000L)
    }
  }
}
