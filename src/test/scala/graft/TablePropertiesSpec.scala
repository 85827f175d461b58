package graft

import graft.txn.{SnapshotReader, TableWriter, TxnLog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Table properties (TBLPROPERTIES): persisted in the Metadata action —
  * one commit per SET/UNSET, checkpoint-surviving, time-traveling with
  * the schema — and LIVE: graft.autoCompact.* on the table configures
  * auto-compaction with precedence over the session conf.
  */
class TablePropertiesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("tp_wh").toString
    spark.conf.set("spark.sql.catalog.tpcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tpcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tpcat.default")
    dir
  }

  test("CREATE TABLE TBLPROPERTIES persists; SET/UNSET round-trip") {
    wh
    spark.sql("DROP TABLE IF EXISTS tpcat.default.tp1")
    spark.sql("CREATE TABLE tpcat.default.tp1 (id BIGINT) " +
      "TBLPROPERTIES ('team' = 'data-eng', 'pii' = 'false')")
    def props(): Map[String, String] =
      spark.sql("SHOW TBLPROPERTIES tpcat.default.tp1").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("team").contains("data-eng"))
    assert(props().get("pii").contains("false"))
    spark.sql("ALTER TABLE tpcat.default.tp1 " +
      "SET TBLPROPERTIES ('pii' = 'true', 'retention' = '30d')")
    assert(props().get("pii").contains("true"))
    assert(props().get("retention").contains("30d"))
    spark.sql("ALTER TABLE tpcat.default.tp1 UNSET TBLPROPERTIES ('team')")
    assert(!props().contains("team"))
    assert(props().get("retention").contains("30d"))
  }

  test("properties survive a parquet checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("tp2").toString + "/t"
    TableWriter.write(spark, Seq((1L, "a")).toDF("id", "v"), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      set = Map("graft.note" -> "kept"), version = 1L, commitTs = 2000L)
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    log.writeCheckpoint(1L)
    TableWriter.append(spark, Seq((2L, "b")).toDF("id", "v"), dir,
      commitTs = 3000L)
    // resolve THROUGH the checkpoint
    assert(log.snapshotLatest().metadata.get.properties
      .get("graft.note").contains("kept"))
  }

  test("graft.autoCompact table property triggers without session conf") {
    val dir = java.nio.file.Files.createTempDirectory("tp3").toString + "/t"
    assert(spark.conf.getOption("spark.graft.autoCompact.enabled").isEmpty)
    TableWriter.write(spark,
      (1L to 4L).map(i => (i, i)).toDF("id", "v").repartition(4), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      set = Map("graft.autoCompact.enabled" -> "true",
        "graft.autoCompact.minFiles" -> "4"), commitTs = 2000L)
    TableWriter.append(spark,
      (5L to 8L).map(i => (i, i)).toDF("id", "v").repartition(4), dir,
      commitTs = 3000L)
    val log0 = new TxnLog(dir, spark.sessionState.newHadoopConf())
    assert(log0.versions() == Seq(0L, 1L, 2L, 3L),
      "write + SET + append + the property-triggered compaction commit")
    assert(log0.snapshotLatest().files.size == 1,
      "auto-compaction must fold the small files")
    assert(SnapshotReader.read(spark, dir).count() == 8L)
    // a table-level 'false' beats a session-level 'true'
    val dir2 = java.nio.file.Files.createTempDirectory("tp4").toString + "/t"
    TableWriter.write(spark,
      (1L to 4L).map(i => (i, i)).toDF("id", "v").repartition(4), dir2,
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir2,
      set = Map("graft.autoCompact.enabled" -> "false"), commitTs = 2000L)
    spark.conf.set("spark.graft.autoCompact.enabled", "true")
    spark.conf.set("spark.graft.autoCompact.minFiles", "4")
    try {
      TableWriter.append(spark,
        (5L to 8L).map(i => (i, i)).toDF("id", "v").repartition(4), dir2,
        commitTs = 3000L)
      // no compaction commit: exactly write + SET + append in the log
      assert(new TxnLog(dir2, spark.sessionState.newHadoopConf())
        .versions() == Seq(0L, 1L, 2L),
        "the table's declared 'false' must win over the session conf")
    } finally {
      spark.conf.unset("spark.graft.autoCompact.enabled")
      spark.conf.unset("spark.graft.autoCompact.minFiles")
    }
  }

  test("a malformed autoCompact property never fails the append") {
    val dir = java.nio.file.Files.createTempDirectory("tp7").toString + "/t"
    TableWriter.write(spark, Seq((1L, 1L)).toDF("id", "v"), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      set = Map("graft.autoCompact.enabled" -> "true",
        "graft.autoCompact.minFiles" -> "sixteen"), commitTs = 2000L)
    // the append must COMMIT and report success — auto-compaction is
    // best-effort, and a bad durable property must not brick writes
    TableWriter.append(spark, Seq((2L, 2L)).toDF("id", "v"), dir,
      commitTs = 3000L)
    assert(SnapshotReader.read(spark, dir).count() == 2L)
  }

  test("SHOW CREATE TABLE reproduces schema and properties") {
    wh
    spark.sql("DROP TABLE IF EXISTS tpcat.default.tp6")
    spark.sql("CREATE TABLE tpcat.default.tp6 (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('team' = 'core')")
    val ddl = spark.sql("SHOW CREATE TABLE tpcat.default.tp6")
      .head().getString(0)
    assert(ddl.contains("id BIGINT") && ddl.contains("v STRING"), ddl)
    assert(ddl.contains("'team' = 'core'") || ddl.contains("team"), ddl)
  }

  test("properties time-travel: an old version shows its old values") {
    val dir = java.nio.file.Files.createTempDirectory("tp5").toString + "/t"
    TableWriter.write(spark, Seq((1L, "a")).toDF("id", "v"), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      set = Map("stage" -> "bronze"), version = 1L, commitTs = 2000L)
    TableWriter.setTableProperties(spark, dir,
      set = Map("stage" -> "silver"), version = 2L, commitTs = 3000L)
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    assert(log.snapshot(1L).metadata.get.properties("stage") == "bronze")
    assert(log.snapshot(2L).metadata.get.properties("stage") == "silver")
    assert(log.snapshot(0L).metadata.get.properties.isEmpty)
  }
}
