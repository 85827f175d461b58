package graft.sources

import graft.SparkTestSession
import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `CALL gcat.system.<proc>(...)` — maintenance at EXECUTION time.
  * The key contract vs the TVF aliases: EXPLAIN must NOT run the side
  * effect (Spark stages the Call plan via ExecutableDuringAnalysis),
  * and one executed statement runs it exactly once.
  */
class ProcedureSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("proc_wh").toString
    spark.conf.set("spark.sql.catalog.gproc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.default")
    dir
  }

  private def log(t: String) =
    new TxnLog(s"$wh/default/$t", spark.sessionState.newHadoopConf())

  private def fragmented(t: String): Unit = {
    wh
    import spark.implicits._
    val path = s"$wh/default/$t"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    TableWriter.write(spark,
      (0L until 1000L).toDF("id").repartition(8),
      path, version = 0L, commitTs = 1000L)
  }

  test("CALL system.optimize compacts and returns its metrics row") {
    fragmented("p1")
    val row = spark.sql("CALL gproc.system.optimize(table => 'default.p1')")
      .collect().head
    assert(row.getLong(0) == 1L, "new version")
    assert(row.getLong(1) == 8L, "files_before")
    assert(row.getLong(2) < 8L, "files_after must shrink")
    assert(log("p1").snapshotLatest().files.size == row.getLong(2))
    assert(spark.sql("SELECT SUM(id) FROM gproc.default.p1")
      .head().getLong(0) == 999L * 1000L / 2)
  }

  test("EXPLAIN CALL does NOT execute the procedure") {
    fragmented("p2")
    val vBefore = log("p2").latestVersion().get
    val plan = spark.sql(
      "EXPLAIN CALL gproc.system.optimize(table => 'default.p2')")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.toLowerCase.contains("call"), plan)
    assert(log("p2").latestVersion().get == vBefore,
      "EXPLAIN must not commit an OPTIMIZE")
    assert(log("p2").snapshotLatest().files.size == 8,
      "EXPLAIN must not compact")
  }

  test("positional arguments and explicit path both resolve") {
    fragmented("p3")
    val row = spark.sql(s"CALL gproc.system.optimize('$wh/default/p3')")
      .collect().head
    assert(row.getLong(2) < row.getLong(1))
  }

  test("CALL system.restore rolls back as a new commit") {
    fragmented("p4")
    spark.sql("INSERT INTO gproc.default.p4 VALUES (100000)")
    assert(spark.sql("SELECT COUNT(*) FROM gproc.default.p4")
      .head().getLong(0) == 1001L)
    val row = spark.sql(
      "CALL gproc.system.restore(table => 'default.p4', version => 0)")
      .collect().head
    assert(row.getLong(0) == 2L && row.getLong(1) == 0L)
    assert(spark.sql("SELECT COUNT(*) FROM gproc.default.p4")
      .head().getLong(0) == 1000L)
    // history preserved: the inserted state stays time-travelable
    assert(spark.sql(
      "SELECT COUNT(*) FROM gproc.default.p4 VERSION AS OF 1")
      .head().getLong(0) == 1001L)
  }

  test("CALL system.vacuum: safety floor refuses, dry run always allowed") {
    fragmented("p5")
    spark.sql("CALL gproc.system.optimize(table => 'default.p5')")
    val e = intercept[Throwable] {
      spark.sql(
        "CALL gproc.system.vacuum(table => 'default.p5', retain_millis => 0)")
        .collect()
    }
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("7-day"))), e)
    // dry run lists the 8 superseded files, deletes nothing
    val dry = spark.sql(
      """CALL gproc.system.vacuum(table => 'default.p5',
        |retain_millis => 0, dry_run => true)""".stripMargin)
      .collect().map(_.getString(0))
    assert(dry.length == 8, dry.toSeq)
    assert(spark.sql("SELECT COUNT(*) FROM gproc.default.p5 VERSION AS OF 0")
      .head().getLong(0) == 1000L, "dry run must not delete")
    // forced vacuum reclaims them
    val gone = spark.sql(
      """CALL gproc.system.vacuum(table => 'default.p5',
        |retain_millis => 0, force => true)""".stripMargin)
      .collect().map(_.getString(0))
    assert(gone.length == 8, gone.toSeq)
  }

  test("CALL system.reorg folds deletion vectors back into plain files") {
    fragmented("p6")
    spark.conf.set("spark.graft.delete.mode", "dv")
    try spark.sql("DELETE FROM gproc.default.p6 WHERE id < 100")
    finally spark.conf.unset("spark.graft.delete.mode")
    assert(log("p6").snapshotLatest().files.exists(_.dv.isDefined))
    val row = spark.sql("CALL gproc.system.reorg(table => 'default.p6')")
      .collect().head
    assert(row.getLong(1) > 0L, "files purged")
    assert(row.getLong(2) == 0L, "no DV pointers remain")
    assert(spark.sql("SELECT COUNT(*) FROM gproc.default.p6")
      .head().getLong(0) == 900L)
  }

  test("CALL system.analyze writes the stats sidecar (full and " +
      "incremental modes)") {
    fragmented("p7")
    val full = spark.sql(
      "CALL gproc.system.analyze(table => 'default.p7', columns => 'id')")
      .collect().head
    assert(full.getString(2) == "full")
    val stats = Analyze.columnStatsFor(spark, s"$wh/default/p7")
    assert(stats("id").n == 1000L && stats("id").nNull == 0L)
    // append → incremental: only the new files scan, counts add
    import spark.implicits._
    TableWriter.append(spark, (1000L until 1200L).toDF("id"),
      s"$wh/default/p7", commitTs = 2000L)
    val inc = spark.sql(
      "CALL gproc.system.analyze(table => 'default.p7', " +
        "columns => 'id', incremental => true)").collect().head
    assert(inc.getString(2) == "incremental", inc.toString)
    val stats2 = Analyze.columnStatsFor(spark, s"$wh/default/p7")
    assert(stats2("id").n == 1200L)
    assert(stats2("id").maxS == "1199")
  }

  test("CALL system.fsck lists lost files dry, repairs on demand") {
    fragmented("p8")
    val path = s"$wh/default/p8"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // lose one file out-of-band
    val victim = log("p8").snapshotLatest().files.head
    fs.delete(new org.apache.hadoop.fs.Path(path, victim.path), false)
    val dry = spark.sql("CALL gproc.system.fsck(table => 'default.p8')")
      .collect()
    assert(dry.map(_.getString(0)).toSeq == Seq(victim.path))
    assert(dry.forall(!_.getBoolean(1)), "dry run must not repair")
    intercept[Throwable] { // still broken (COUNT would answer from
      // footer stats without opening files — SUM must read bytes)
      spark.sql("SELECT SUM(id) FROM gproc.default.p8").collect()
    }
    val rep = spark.sql(
      "CALL gproc.system.fsck(table => 'default.p8', dry_run => false)")
      .collect()
    assert(rep.map(_.getString(0)).toSeq == Seq(victim.path))
    assert(rep.forall(_.getBoolean(1)))
    // scans work again; the lost file's rows are gone
    val n = spark.sql("SELECT COUNT(*) FROM gproc.default.p8")
      .head().getLong(0)
    assert(n == 1000L - victim.stats.get.numRecords)
  }

  test("unknown procedure refuses with the available list") {
    wh
    val e = intercept[Throwable] {
      spark.sql("CALL gproc.system.frobnicate('x')").collect()
    }
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("optimize"))), e)
  }

  test("CALL system.checkpoint forces a checkpoint that anchors expiry") {
    fragmented("p9")
    import spark.implicits._
    TableWriter.append(spark, (1000L until 1100L).toDF("id"),
      s"$wh/default/p9", commitTs = 2000L)
    val l = log("p9")
    assert(l.checkpointVersions().isEmpty, "interval not reached yet")
    val row = spark.sql(
      "CALL gproc.system.checkpoint(table => 'default.p9')").collect().head
    assert(row.getLong(0) == 1L, "checkpointed version")
    assert(l.checkpointVersions() == Seq(1L))
    assert(row.getLong(1) == l.snapshotLatest().files.size.toLong)
    // the forced checkpoint anchors expire_log: v0's commit file drops
    // and the table still reads in full from checkpoint + tail
    val del = spark.sql("CALL gproc.system.expire_log(" +
        "table => 'default.p9', retain_millis => 0)")
      .collect().map(_.getString(0))
    assert(del.contains(f"${0L}%020d.json"), del.mkString(","))
    assert(spark.sql("SELECT COUNT(*), SUM(id) FROM gproc.default.p9")
      .head() match {
        case r => r.getLong(0) == 1100L && r.getLong(1) == 1099L * 1100L / 2
      })
  }
}
