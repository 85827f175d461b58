package graft.sources

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 100×-file-count rehearsal: a 5,000-file lake driven through CONVERT,
  * bloom build+prune, FSCK, VACUUM and COPY INTO over the counting
  * `mockfs://`, pinning the ECONOMICS of the r13/r14 distribution work
  * the way RemoteFsSpec pins placement — driver-side `listStatus` calls
  * must stay O(directories), never O(files); the per-file work runs in
  * tasks. A regression that quietly moves a walk back onto the driver
  * turns these pins red.
  *
  * Bounds are deliberately ~50× below the file count: the point is the
  * ASYMPTOTE (5,000 files, driver ≲ dozens of listings), not an exact
  * call census that would break on a Spark-internal detail.
  */
class FileCountRehearsalSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  private val Files = 5000

  private lazy val scheme: Unit = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mockfs.impl", classOf[CountingMockFs].getName)
  }

  /** One flat mockfs directory holding 5,000 one-row parquet files —
    * built once, then CONVERTed in place by the first test (the later
    * tests operate on it as a graft table).
    */
  private lazy val lake: String = {
    scheme
    val local = java.nio.file.Files.createTempDirectory("mockfs_5k")
    java.nio.file.Files.delete(local)
    val dir = s"mockfs://$local"
    spark.range(0L, Files.toLong, 1L, 32)
      .select(col("id"), (col("id") % 50).as("g"))
      .repartition(Files)
      .write.parquet(dir)
    dir
  }

  /** CONVERT runs exactly once, whatever subset of tests executes;
    * test 1 measures it, later tests just need it done.
    */
  private lazy val converted: Convert.ConvertResult = Convert.run(spark, lake)

  private def driverDelta[A](body: => A): (A, Int, Int) = {
    val d0 = CountingMockFs.driverLists.get()
    val t0 = CountingMockFs.taskLists.get()
    val r = body
    (r, CountingMockFs.driverLists.get() - d0,
      CountingMockFs.taskLists.get() - t0)
  }

  test("CONVERT of a 5k-file lake: zero-ish driver listings, discovery " +
      "and footer stats in tasks") {
    lake // build the fixture OUTSIDE the measurement (its own write
         // committer lists the staging tree on the driver)
    val (r, dl, tl) = driverDelta(converted)
    info(s"convert: driverLists=$dl taskLists=$tl")
    // repartition(N) of N rows leaves some hash buckets empty — the
    // registered FILE count is ~0.6N (still thousands); rows are exact
    assert(r.rowsRegistered == Files.toLong)
    assert(r.filesRegistered >= Files / 2,
      s"expected a thousands-of-files lake, got ${r.filesRegistered}")
    assert(dl <= 100, s"driver listings must stay O(dirs), got $dl")
    assert(tl > 0, "discovery must run in tasks")
  }

  test("bloom build + prune over 5k files stays executor-resident") {
    converted
    val log = new TxnLog(lake, spark.sessionState.newHadoopConf())
    val v = log.latestVersion().get
    val (_, dl, tl) = driverDelta {
      BloomIndex.build(spark, lake, Seq("id"), v)
      val pruned = BloomIndex.prunedFiles(spark, lake,
        Seq(("id", Seq(12345678L)))) // absent key → almost all files drop
      assert(pruned.size > Files / 2,
        s"absent-key probe should prune most files, pruned ${pruned.size}")
    }
    info(s"bloom: driverLists=$dl taskLists=$tl")
    assert(dl <= 100, s"driver listings must stay O(dirs), got $dl")
  }

  test("FSCK existence check on a flat 5k-file table is one listing") {
    converted
    val (missing, dl, _) = driverDelta(Fsck.missingFiles(spark, lake))
    info(s"fsck: driverLists=$dl")
    assert(missing.isEmpty)
    assert(dl <= 20, s"flat table = one distinct dir, got $dl listings")
  }

  test("VACUUM of a 5k-file table: orphan listing in tasks, driver " +
      "O(top dirs)") {
    converted
    val (_, dl, tl) = driverDelta {
      TableWriter.vacuum(spark, lake, retainMillis = 3600 * 1000L,
        nowMillis = System.currentTimeMillis())
    }
    info(s"vacuum: driverLists=$dl taskLists=$tl")
    assert(dl <= 100, s"driver listings must stay O(dirs), got $dl")
    assert(tl > 0, "orphan listing must run in tasks")
    assert(SnapshotReader.read(spark, lake).count() == Files.toLong)
  }

  test("a thousands-of-files COMMIT moves and footer-reads in tasks, " +
      "never a driver-serial loop") {
    scheme
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("mockfs_5k_w")
    java.nio.file.Files.delete(p)
    val table = s"mockfs://$p"
    val d0 = CountingMockFs.driverOpens.get()
    val dl0 = CountingMockFs.driverLists.get()
    TableWriter.write(spark,
      spark.range(0L, 3000L, 1L, 32).select(col("id")).repartition(3000),
      table, version = 0L, commitTs = 1000L)
    val dOpens = CountingMockFs.driverOpens.get() - d0
    val dLists = CountingMockFs.driverLists.get() - dl0
    info(s"bigWrite: driverOpens=$dOpens driverLists=$dLists")
    // footer stats of ~1.8k staged files must read in tasks; the
    // driver's opens are log/schema-scale, its listings staging-dir-scale
    assert(dOpens <= 50, s"driver footer reads must not scale with " +
      s"files, got $dOpens")
    assert(dLists <= 100, s"driver listings must stay O(dirs), got $dLists")
    val snap = new TxnLog(table, spark.sessionState.newHadoopConf())
      .snapshotLatest()
    assert(snap.files.size > 1000)
    assert(snap.files.forall(_.stats.isDefined), "footer stats required")
    assert(SnapshotReader.read(spark, table).count() == 3000L)
  }

  test("row-capped streaming backfill of the 5k-file snapshot: O(1) " +
      "snapshot replays, not O(triggers × files)") {
    converted
    // the drain below runs ~10 row-capped triggers over ONE snapshot
    // version; every trigger needs the snapshot event list in BOTH
    // latestOffset (admission walk) and planInputPartitions — without
    // the per-(phase, version) memo each need replays checkpoint+tail
    // on the driver, so driver log opens would scale with triggers.
    val logOpens0 = CountingMockFs.driverOpens.get() -
      CountingMockFs.driverDataOpens.get()
    val dData0 = CountingMockFs.driverDataOpens.get()
    val q = spark.readStream.format("graft.sources.GraftCdc")
      .option("tablePath", lake)
      .option("startingVersion", "0")
      .option("includeHistory", "true")
      .option("maxRowsPerTrigger", "500")
      .load()
      .writeStream.outputMode("append")
      .format("memory").queryName("rehearsal_drain_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mockfs_5k_drain").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val triggers = q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
      .recentProgress.count(_.numInputRows > 0)
    val logOpens = CountingMockFs.driverOpens.get() -
      CountingMockFs.driverDataOpens.get() - logOpens0
    val dData = CountingMockFs.driverDataOpens.get() - dData0
    info(s"drain: triggers=$triggers driverLogOpens=$logOpens " +
      s"driverDataOpens=$dData")
    assert(spark.table("rehearsal_drain_out").count() == Files.toLong)
    assert(triggers >= 8, s"expected a multi-trigger row-capped drain, " +
      s"got $triggers")
    // one snapshot build + one metadata resolve — NOT 2-3 replays per
    // trigger (each replay of the 3k-AddFile commit is ≥1 driver open,
    // so an unmemoized planner reads ≥2× triggers here)
    assert(logOpens <= triggers,
      s"driver log reads must not replay the snapshot per trigger, " +
        s"got $logOpens over $triggers triggers")
    // admission answers from FileStats.numRecords — zero footer reads
    assert(dData == 0,
      s"row-capped admission must use log stats, got $dData driver " +
        "data-file opens")
  }

  test("COPY INTO ingesting 5k source files: discovery in tasks, one " +
      "commit with 5k idempotence markers") {
    converted
    import spark.implicits._
    val t = {
      val p = java.nio.file.Files.createTempDirectory("mockfs_5k_t")
      java.nio.file.Files.delete(p)
      val table = s"mockfs://$p"
      TableWriter.write(spark, Seq((-1L, -1L)).toDF("id", "g"), table,
        version = 0L, commitTs = 1000L)
      table
    }
    val (r, dl, tl) = driverDelta(CopyInto.run(spark, t, lake))
    info(s"copyInto: driverLists=$dl taskLists=$tl")
    assert(r.filesCopied == converted.filesRegistered)
    assert(r.rowsCopied == Files.toLong)
    assert(dl <= 150, s"driver listings must stay O(dirs), got $dl")
    assert(tl > 0, "source discovery must run in tasks")
    // retry is a full skip — the 5k markers resolve from the snapshot
    val again = CopyInto.run(spark, t, lake)
    assert(again.filesCopied == 0L &&
      again.filesSkipped == converted.filesRegistered)
  }

  test("latest-version tail probe: polling an idle table does ZERO " +
      "log-dir listings; new commits are found by forward probes; an " +
      "unknown hint falls back to the listing") {
    scheme
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("mockfs_probe")
    java.nio.file.Files.delete(p)
    val table = s"mockfs://$p"
    TableWriter.write(spark, Seq((1L, "a")).toDF("id", "tag"), table)
    TableWriter.append(spark, Seq((2L, "b")).toDF("id", "tag"), table)
    TableWriter.append(spark, Seq((3L, "c")).toDF("id", "tag"), table)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val lv = log.latestVersion().get // one listing, seeds the hint
    assert(lv == 2L)
    // the steady-state stream shape: 10 idle polls = 10 exists probes,
    // zero listings of the (potentially 10⁶-entry) log directory
    val (polls, dl, _) = driverDelta((1 to 10).map(_ =>
      log.latestVersionFrom(lv)))
    assert(polls.forall(_.contains(lv)))
    assert(dl == 0,
      s"an idle-table poll must probe forward, not list the log dir ($dl)")
    // a new commit is discovered by the probe alone
    TableWriter.append(spark, Seq((4L, "d")).toDF("id", "tag"), table)
    val (found, dl2, _) = driverDelta(log.latestVersionFrom(lv))
    assert(found.contains(lv + 1))
    assert(dl2 == 0, s"discovery of a new commit must not list ($dl2)")
    // unknown / vacuumed-past hint: correct answer via the fallback
    val (fb, dl3, _) = driverDelta(log.latestVersionFrom(-1L))
    assert(fb.contains(lv + 1))
    assert(dl3 >= 1, "the fallback path is the listing, by design")
  }
}
