package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MaterializedAgg
import graft.txn.{DeletionVectors, SnapshotReader, TableWriter}

/** Incremental MV maintenance: the delta-maintained state must land
  * exactly on a from-scratch recompute after every kind of base mutation
  * (append, whole-file remove via upsert, DV row-delete), and a refresh
  * with no base movement must be a no-op.
  */
class MaterializedAggSpec extends AnyFunSuite {
  import SparkTestSession._

  private val spec = MaterializedAgg.Spec(
    Seq("l_linestatus"), Seq("l_quantity", "l_extendedprice"))

  private def recompute(table: String) =
    SnapshotReader.read(spark, table)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("mv_cnt"),
        sum(col("l_quantity").cast("decimal(15,2)"))
          .cast("decimal(25,2)").as("sum_l_quantity"),
        sum(col("l_extendedprice").cast("decimal(15,2)"))
          .cast("decimal(25,2)").as("sum_l_extendedprice"))

  private def mvState(mvPath: String) =
    SnapshotReader.read(spark, mvPath)
      .select("l_linestatus", "mv_cnt", "sum_l_quantity",
        "sum_l_extendedprice")

  private def assertMatches(table: String, mvPath: String): Unit = {
    val mv = mvState(mvPath).collect().map(_.toSeq).toSet
    val full = recompute(table).collect().map(_.toSeq).toSet
    assert(mv == full, s"MV state diverged from recompute:\nmv=$mv\nfull=$full")
  }

  test("MV tracks append, upsert-rewrite, and DV delete exactly") {
    val dir = java.nio.file.Files.createTempDirectory("mv_base").toString
    val mvPath = java.nio.file.Files.createTempDirectory("mv_state").toString + "/mv"
    val li = Tables.load(spark, sf, "lineitem")

    // v0: a third of the table
    TableWriter.write(spark, li.filter(col("l_orderkey") % 3 === 0), dir,
      version = 0L, commitTs = 1000L)
    MaterializedAgg.create(spark, dir, mvPath, spec)
    assertMatches(dir, mvPath)

    // v1: append — op 'c' rows count +1
    TableWriter.append(spark, li.filter(col("l_orderkey") % 3 === 1), dir,
      commitTs = 2000L)
    MaterializedAgg.refresh(spark, dir, mvPath, spec)
    assertMatches(dir, mvPath)

    // v2: upsert rewrites matched files — 'r' removals + 'c' re-adds
    // must cancel exactly for untouched rows in the rewritten files
    val src = li.filter(col("l_orderkey") % 6 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100.0)
    TableWriter.mergeUpsert(spark, dir, src,
      Seq("l_orderkey", "l_linenumber"), version = 2L, commitTs = 3000L)
    MaterializedAgg.refresh(spark, dir, mvPath, spec)
    assertMatches(dir, mvPath)

    // v3: DV row-delete — op 'd' rows count −1, no file rewritten
    DeletionVectors.deleteWhere(spark, dir, col("l_suppkey") % 5 === 0,
      version = 3L, commitTs = 4000L)
    MaterializedAgg.refresh(spark, dir, mvPath, spec)
    assertMatches(dir, mvPath)

    // base unmoved → refresh is a no-op (same refreshed-through version,
    // no new MV commit)
    val before = MaterializedAgg.refreshedThrough(spark, mvPath)
    val mvVersions = new graft.txn.TxnLog(mvPath,
      spark.sessionState.newHadoopConf()).versions()
    assert(MaterializedAgg.refresh(spark, dir, mvPath, spec) == before)
    assert(new graft.txn.TxnLog(mvPath,
      spark.sessionState.newHadoopConf()).versions() == mvVersions)

    // each refresh REPLACED the prior generation, so the generic VACUUM
    // reclaims superseded MV files — state storage doesn't grow with
    // refresh count (the MV trades away time travel past the horizon,
    // same documented trade as any graft table)
    val reclaimed = TableWriter.vacuum(spark, mvPath,
      retainMillis = 0L, nowMillis = System.currentTimeMillis() + 60000L)
    assert(reclaimed.nonEmpty, "superseded MV generations should age out")
    assertMatches(dir, mvPath) // live state untouched by vacuum
  }

  test("CDF refresh lands on the recompute and reads only change " +
      "sidecars for DML ranges") {
    import graft.txn.ChangeDataFeed
    val dir = java.nio.file.Files.createTempDirectory("mvc_base").toString
    val mvPath =
      java.nio.file.Files.createTempDirectory("mvc_state").toString + "/mv"
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 3 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      Map(ChangeDataFeed.Prop -> "true"), version = 1L, commitTs = 1500L)
    MaterializedAgg.create(spark, dir, mvPath, spec)
    // v2 UPDATE + v3 DV delete, then refresh from the change feed
    TableWriter.updateWhere(spark, dir, col("l_quantity") < 10,
      Map("l_quantity" -> (col("l_quantity") + 5.0)),
      version = 2L, commitTs = 2000L)
    DeletionVectors.deleteWhere(spark, dir, col("l_suppkey") % 7 === 0,
      version = 3L, commitTs = 3000L)
    // the DML-only delta must touch ONLY _change_data sidecars — the
    // churned data files (whole rewritten files, survivors included)
    // never enter the scan. This is the scale point of the CDF path.
    val from = MaterializedAgg.refreshedThrough(spark, mvPath)
    val inputs = ChangeDataFeed.tableChanges(spark, dir, from + 1, Some(3L))
      .inputFiles.toSeq
    assert(inputs.nonEmpty && inputs.forall(_.contains("_change_data/")),
      s"delta read outside _change_data: $inputs")
    assert(MaterializedAgg.refreshFromCdf(spark, dir, mvPath, spec) == 3L)
    assertMatches(dir, mvPath)
    // appends flow through inference (no sidecars) — still exact
    TableWriter.append(spark, li.filter(col("l_orderkey") % 3 === 1), dir,
      commitTs = 4000L)
    MaterializedAgg.refreshFromCdf(spark, dir, mvPath, spec)
    assertMatches(dir, mvPath)
  }

  test("streaming CDF MV lands on the recompute, resumes across " +
      "restarts, and replays idempotently") {
    import graft.txn.ChangeDataFeed
    val dir = java.nio.file.Files.createTempDirectory("mvs_base").toString
    val mvPath =
      java.nio.file.Files.createTempDirectory("mvs_state").toString + "/mv"
    val ck = java.nio.file.Files.createTempDirectory("mvs_ck").toString
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 3 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      Map(ChangeDataFeed.Prop -> "true"), version = 1L, commitTs = 1500L)
    MaterializedAgg.create(spark, dir, mvPath, spec)
    TableWriter.updateWhere(spark, dir, col("l_quantity") < 10,
      Map("l_quantity" -> (col("l_quantity") + 5.0)),
      version = 2L, commitTs = 2000L)
    DeletionVectors.deleteWhere(spark, dir, col("l_suppkey") % 7 === 0,
      version = 3L, commitTs = 3000L)
    def drain(): Unit = {
      val q = MaterializedAgg.maintainFromCdfStream(spark, dir, mvPath,
        spec, checkpointLocation = ck)
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assertMatches(dir, mvPath)
    // base moves while the stream is down; a restart on the SAME
    // checkpoint picks up exactly the new versions
    TableWriter.append(spark, li.filter(col("l_orderkey") % 3 === 1), dir,
      commitTs = 4000L)
    drain()
    assertMatches(dir, mvPath)
    // no new data: a further restart must not move the MV
    val log = new graft.txn.TxnLog(mvPath,
      spark.sessionState.newHadoopConf())
    val before = log.latestVersion()
    drain()
    assert(log.latestVersion() == before)
    assertMatches(dir, mvPath)
  }

  test("streaming CDF MV survives a non-row-bearing base commit between " +
      "row commits (benign watermark gap)") {
    import graft.txn.ChangeDataFeed
    val dir = java.nio.file.Files.createTempDirectory("mvg_base").toString
    val mvPath =
      java.nio.file.Files.createTempDirectory("mvg_state").toString + "/mv"
    val ck = java.nio.file.Files.createTempDirectory("mvg_ck").toString
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 4 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      Map(ChangeDataFeed.Prop -> "true"), version = 1L, commitTs = 1500L)
    MaterializedAgg.create(spark, dir, mvPath, spec)
    TableWriter.append(spark, li.filter(col("l_orderkey") % 4 === 1), dir,
      commitTs = 2000L) // v2: rows → watermark lands at 2
    def drain(): Unit = {
      val q = MaterializedAgg.maintainFromCdfStream(spark, dir, mvPath,
        spec, checkpointLocation = ck)
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(MaterializedAgg.refreshedThrough(spark, mvPath) == 2L)
    // v3: compaction only (dataChange=false — no CDF rows); v4: rows.
    // The next batch's min row-bearing version is 4 while the watermark
    // is 2 — the contiguity check must recognize the gap at v3 carries
    // no row events instead of refusing the stream forever (r10 ADVICE).
    assert(TableWriter.compact(spark, dir, version = 3L,
      commitTs = 3000L).nonEmpty)
    TableWriter.append(spark, li.filter(col("l_orderkey") % 4 === 2), dir,
      commitTs = 4000L)
    drain()
    assertMatches(dir, mvPath)
    assert(MaterializedAgg.refreshedThrough(spark, mvPath) == 4L)
    // a REAL gap still refuses: recreate the MV fresh (watermark 4 with
    // only ≤v4 applied is fine) — but an old checkpoint whose offsets
    // start past a RECREATED MV's watermark must refuse, which the
    // resume test in GraftCdfSourceSpec covers; here we just pin that
    // the benign-gap path did not weaken the row-bearing refusal
    TableWriter.deleteWhere(spark, dir, col("l_orderkey") % 8 === 0,
      version = 5L, commitTs = 5000L) // rows at v5
    TableWriter.append(spark, li.filter(col("l_orderkey") % 4 === 3), dir,
      commitTs = 6000L) // rows at v6
    // roll the MV back by recreating it at the CURRENT base, then point
    // the OLD checkpoint (already past v4) at a fresh MV whose watermark
    // is 4: versions 5..6 carry rows, so the gap check must refuse
    val mv2 = java.nio.file.Files
      .createTempDirectory("mvg_state2").toString + "/mv"
    MaterializedAgg.create(spark, dir, mv2, spec,
      versionAsOf = Some(2L)) // watermark 2; checkpoint is past v4
    TableWriter.append(spark, li.filter(col("l_orderkey") % 16 === 5), dir,
      commitTs = 7000L) // v7: new rows so the old checkpoint has a batch
    val q2 = MaterializedAgg.maintainFromCdfStream(spark, dir, mv2,
      spec, checkpointLocation = ck)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(err.getMessage.contains("does not extend") ||
      Option(err.getCause).exists(_.getMessage.contains("does not extend")))
  }

  test("refresh after a compaction-only base commit advances the " +
      "watermark without crashing or rewriting state") {
    val dir = java.nio.file.Files.createTempDirectory("mv_base_c").toString
    val mvPath =
      java.nio.file.Files.createTempDirectory("mv_state_c").toString + "/mv"
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 2 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.append(spark, li.filter(col("l_orderkey") % 2 === 1), dir,
      commitTs = 2000L) // second file so compaction has work
    MaterializedAgg.create(spark, dir, mvPath, spec)
    val stateBefore = mvState(mvPath).collect().map(_.toSeq).toSet

    // dataChange=false commit only: no CDC row events in the range
    val rewritten = TableWriter.compact(spark, dir, version = 2L,
      commitTs = 3000L)
    assert(rewritten.nonEmpty, "compaction should have rewritten files")

    // the r5-ADVICE crash scenario: latest > from but zero row events
    assert(MaterializedAgg.refresh(spark, dir, mvPath, spec) == 2L)
    assert(MaterializedAgg.refreshedThrough(spark, mvPath) == 2L)
    assert(mvState(mvPath).collect().map(_.toSeq).toSet == stateBefore,
      "event-free refresh must not change MV state")

    // watermark advanced → the next refresh is a pure no-op (no commit)
    val mvLog = new graft.txn.TxnLog(mvPath,
      spark.sessionState.newHadoopConf())
    val versions = mvLog.versions()
    assert(MaterializedAgg.refresh(spark, dir, mvPath, spec) == 2L)
    assert(mvLog.versions() == versions)

    // and a later real change still applies exactly once
    TableWriter.append(spark,
      li.filter(col("l_orderkey") % 97 === 0), dir, commitTs = 4000L)
    MaterializedAgg.refresh(spark, dir, mvPath, spec)
    assertMatches(dir, mvPath)
  }

  test("NULL group keys stay one group across refreshes (null-safe merge)") {
    val dir = java.nio.file.Files.createTempDirectory("mv_base_n").toString
    val mvPath =
      java.nio.file.Files.createTempDirectory("mv_state_n").toString + "/mv"
    import spark.implicits._
    def rows(xs: Seq[(String, Double, Double)]) =
      xs.toDF("l_linestatus", "l_quantity", "l_extendedprice")

    TableWriter.write(spark,
      rows(Seq(("A", 1.0, 10.0), (null, 2.0, 20.0), (null, 3.0, 30.0))),
      dir, version = 0L, commitTs = 1000L)
    MaterializedAgg.create(spark, dir, mvPath, spec)
    assertMatches(dir, mvPath)

    // delta carries NULL-key rows: a null-unsafe merge would append a
    // SECOND null row instead of accumulating into the existing one
    TableWriter.append(spark,
      rows(Seq((null, 5.0, 50.0), ("A", 7.0, 70.0))), dir, commitTs = 2000L)
    MaterializedAgg.refresh(spark, dir, mvPath, spec)
    assertMatches(dir, mvPath)
    assert(mvState(mvPath).filter(col("l_linestatus").isNull).count() == 1)

    // second null-carrying refresh exercises cur-null × delta-null
    TableWriter.append(spark, rows(Seq((null, 11.0, 110.0))), dir,
      commitTs = 3000L)
    MaterializedAgg.refresh(spark, dir, mvPath, spec)
    assertMatches(dir, mvPath)
    assert(mvState(mvPath).filter(col("l_linestatus").isNull).count() == 1)
  }
}
