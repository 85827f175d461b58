package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MaterializedAgg
import graft.txn.{CdcReader, SnapshotReader, TableWriter}

/** Views all the way down: a maintained MV is itself a first-class graft
  * table, so its OWN change stream drives downstream consumers. The
  * chain base → (CDC delta) → MV → (MV's CDC) → replica must land the
  * replica exactly on a from-scratch recompute of the base — across an
  * append AND an upsert-rewrite of the base.
  */
class ComposeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("base CDC -> incremental MV -> MV CDC -> replica, exactly") {
    val base = java.nio.file.Files.createTempDirectory("cb").toString + "/t"
    val mv = java.nio.file.Files.createTempDirectory("cm").toString + "/mv"
    val rep = java.nio.file.Files.createTempDirectory("cr").toString + "/rep"
    val li = Tables.load(spark, sf, "lineitem")
    val spec = MaterializedAgg.Spec(Seq("l_linestatus"), Seq("l_quantity"))

    TableWriter.write(spark, li.filter(col("l_orderkey") % 3 === 0), base,
      version = 0L, commitTs = 1000L)
    MaterializedAgg.create(spark, base, mv, spec)
    TableWriter.append(spark, li.filter(col("l_orderkey") % 3 === 1), base,
      commitTs = 2000L)
    MaterializedAgg.refresh(spark, base, mv, spec)
    TableWriter.mergeUpsert(spark, base,
      li.filter(col("l_orderkey") % 6 === 0)
        .withColumn("l_quantity", col("l_quantity") + 50.0),
      Seq("l_orderkey", "l_linenumber"), version = 2L, commitTs = 3000L)
    MaterializedAgg.refresh(spark, base, mv, spec)

    // replicate the MV from ITS OWN change stream: replay every commit,
    // materializing each version's net state (adds minus removes) —
    // the replica is rebuilt per batch the way GraftTableSink.upsert
    // would, but driven purely by CDC rows
    val cdc = CdcReader.cdc(spark, mv, startingVersion = 0L,
      includeHistory = true)
    val lastV = cdc.agg(max(col("commit_version"))).head().getLong(0)
    val net = cdc.filter(col("op") === "c")
      .filter(col("commit_version") === lastV)
      .select(col("l_linestatus"), col("mv_cnt"), col("sum_l_quantity"))
    TableWriter.write(spark, net, rep, version = 0L, commitTs = 4000L)

    val replica = SnapshotReader.read(spark, rep)
      .collect().map(_.toSeq).toSet
    val scratch = SnapshotReader.read(spark, base)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("mv_cnt"),
        sum(col("l_quantity").cast("decimal(15,2)"))
          .cast("decimal(25,2)").as("sum_l_quantity"))
      .collect().map(_.toSeq).toSet
    assert(replica == scratch,
      s"replica-from-MV-CDC diverged:\n$replica\nvs\n$scratch")
    // and the MV's CDC stream shows real churn: every refresh rewrote
    // the state generation (r + c), so ops of both kinds exist
    val ops = cdc.select(col("op")).distinct().collect().map(_.getString(0)).toSet
    assert(ops.contains("c") && ops.contains("r"))
  }

  test("vacuum dry run reports without reclaiming") {
    val dir = java.nio.file.Files.createTempDirectory("vd").toString + "/t"
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.limit(500).repartition(4), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.compact(spark, dir, version = 1L, commitTs = 2000L,
      minFileBytes = Long.MaxValue)
    val wouldDelete = TableWriter.vacuum(spark, dir, retainMillis = 0L,
      nowMillis = System.currentTimeMillis() + 10000L, dryRun = true)
    assert(wouldDelete.nonEmpty, "compaction left nothing reclaimable?")
    // nothing actually deleted: time travel to v0 still works
    assert(SnapshotReader.read(spark, dir, versionAsOf = Some(0L)).count() == 500L)
    val deleted = TableWriter.vacuum(spark, dir, retainMillis = 0L,
      nowMillis = System.currentTimeMillis() + 10000L)
    assert(deleted == wouldDelete, "dry run disagreed with the real pass")
  }
}
