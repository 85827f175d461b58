package graft.sources

import graft.SparkTestSession
import graft.txn.{SnapshotReader, TxnLog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TableCatalog surface: DDL/DML round-trips through SQL, pushdown
  * through catalog reads, rebase-backed INSERT, atomic OVERWRITE.
  */
class GraftCatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("gspec_wh").toString
    spark.conf.set("spark.sql.catalog.gspec", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspec.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gspec.default")
    dir
  }

  test("CREATE TABLE is one metadata-only commit; SHOW TABLES lists it") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t1")
    spark.sql("CREATE TABLE gspec.default.t1 (id BIGINT, name STRING)")
    val log = new TxnLog(s"$wh/default/t1", spark.sessionState.newHadoopConf())
    assert(log.versions() == Seq(0L))
    assert(log.snapshot(0L).files.isEmpty)
    val tables = spark.sql("SHOW TABLES IN gspec.default")
      .select("tableName").collect().map(_.getString(0))
    assert(tables.contains("t1"))
  }

  test("INSERT INTO appends through the rebase path; SELECT reads back") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t2")
    spark.sql("CREATE TABLE gspec.default.t2 (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gspec.default.t2 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gspec.default.t2 VALUES (3, 'c')")
    val rows = spark.sql(
      "SELECT id, name FROM gspec.default.t2 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val log = new TxnLog(s"$wh/default/t2", spark.sessionState.newHadoopConf())
    assert(log.versions() == Seq(0L, 1L, 2L), "one commit per INSERT")
  }

  test("INSERT OVERWRITE replaces the table in one atomic commit") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t3")
    spark.sql("CREATE TABLE gspec.default.t3 (id BIGINT)")
    spark.sql("INSERT INTO gspec.default.t3 VALUES (1), (2), (3)")
    spark.sql("INSERT OVERWRITE gspec.default.t3 VALUES (9)")
    val rows = spark.sql("SELECT id FROM gspec.default.t3").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(9L))
    // time travel still sees the pre-overwrite state
    val pre = SnapshotReader.read(spark, s"$wh/default/t3",
      versionAsOf = Some(1L))
    assert(pre.count() == 3)
  }

  test("PARTITIONED BY lands a hive layout readable with pruning") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t4")
    spark.sql(
      "CREATE TABLE gspec.default.t4 (id BIGINT, flag STRING) PARTITIONED BY (flag)")
    spark.sql(
      "INSERT INTO gspec.default.t4 VALUES (1, 'A'), (2, 'B'), (3, 'A')")
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$wh/default/t4/flag=A")))
    val a = spark.sql(
      "SELECT id FROM gspec.default.t4 WHERE flag = 'A' ORDER BY id")
      .collect().map(_.getLong(0))
    assert(a.toSeq == Seq(1L, 3L))
  }

  test("CTAS creates and loads in one statement") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t5")
    spark.sql(
      """CREATE TABLE gspec.default.t5 AS
        |SELECT id, id * 2 AS dbl FROM range(10)""".stripMargin)
    assert(spark.sql("SELECT SUM(dbl) AS s FROM gspec.default.t5")
      .head().getLong(0) == 90L)
  }

  test("catalog reads negotiate pushdown: count(*) is a stats-only scan") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t6")
    spark.sql("CREATE TABLE gspec.default.t6 (id BIGINT)")
    spark.sql("INSERT INTO gspec.default.t6 SELECT id FROM range(1000)")
    val df = spark.sql("SELECT COUNT(*) AS n FROM gspec.default.t6")
    val scan = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => r.scan
    }.getOrElse(fail("no DSv2 scan"))
    assert(scan.isInstanceOf[GraftBatchAggScan])
    assert(df.head().getLong(0) == 1000L)
  }

  test("ALTER TABLE RENAME moves the directory; old name is gone") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t7")
    spark.sql("DROP TABLE IF EXISTS gspec.default.t7b")
    spark.sql("CREATE TABLE gspec.default.t7 (id BIGINT)")
    spark.sql("INSERT INTO gspec.default.t7 VALUES (42)")
    spark.sql("ALTER TABLE gspec.default.t7 RENAME TO default.t7b")
    assert(spark.sql("SELECT id FROM gspec.default.t7b").head().getLong(0) == 42L)
    intercept[Exception] { spark.sql("SELECT * FROM gspec.default.t7").collect() }
  }

  test("DROP TABLE removes it from listing and disk") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t8")
    spark.sql("CREATE TABLE gspec.default.t8 (id BIGINT)")
    spark.sql("DROP TABLE gspec.default.t8")
    val tables = spark.sql("SHOW TABLES IN gspec.default")
      .select("tableName").collect().map(_.getString(0))
    assert(!tables.contains("t8"))
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$wh/default/t8")))
  }

  test("dataframe writeTo appends like INSERT") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t9")
    spark.sql("CREATE TABLE gspec.default.t9 (id BIGINT)")
    import spark.implicits._
    Seq(7L, 8L).toDF("id").writeTo("gspec.default.t9").append()
    assert(spark.sql("SELECT SUM(id) AS s FROM gspec.default.t9")
      .head().getLong(0) == 15L)
  }

  test("SQL time travel: VERSION AS OF reads the old snapshot") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t11")
    spark.sql("CREATE TABLE gspec.default.t11 (id BIGINT)")
    spark.sql("INSERT INTO gspec.default.t11 VALUES (1), (2)")   // v1
    spark.sql("INSERT OVERWRITE gspec.default.t11 VALUES (9)")   // v2
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM gspec.default.t11 VERSION AS OF 1")
      .head().getLong(0) == 2)
    assert(spark.sql(
      "SELECT id FROM gspec.default.t11 VERSION AS OF 2")
      .head().getLong(0) == 9)
    assert(spark.sql("SELECT COUNT(*) AS n FROM gspec.default.t11")
      .head().getLong(0) == 1)
  }

  test("SQL DELETE FROM routes through the versioned rewrite") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t12")
    spark.sql("CREATE TABLE gspec.default.t12 (id BIGINT, flag STRING)")
    spark.sql(
      "INSERT INTO gspec.default.t12 VALUES (1,'a'), (2,'b'), (3,'a'), (4,'c')")
    spark.sql("DELETE FROM gspec.default.t12 WHERE flag = 'a' OR id = 4")
    val rows = spark.sql("SELECT id FROM gspec.default.t12 ORDER BY id")
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(2L))
    // the delete is a commit: pre-delete state stays time-travelable
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM gspec.default.t12 VERSION AS OF 1")
      .head().getLong(0) == 4)
  }

  test("TRUNCATE TABLE empties but keeps the table and its history") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t13")
    spark.sql("CREATE TABLE gspec.default.t13 (id BIGINT)")
    spark.sql("INSERT INTO gspec.default.t13 VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE gspec.default.t13")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gspec.default.t13")
      .head().getLong(0) == 0)
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM gspec.default.t13 VERSION AS OF 1")
      .head().getLong(0) == 2)
    spark.sql("INSERT INTO gspec.default.t13 VALUES (5)")
    assert(spark.sql("SELECT id FROM gspec.default.t13").head().getLong(0) == 5)
  }

  test("CHECK constraints reach SQL writers") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t10")
    spark.sql("CREATE TABLE gspec.default.t10 (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gspec.default.t10 VALUES (1, 'ok')")
    graft.txn.TableWriter.addConstraint(spark, s"$wh/default/t10",
      "id > 0", version = 2L, commitTs = 5000L)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gspec.default.t10 VALUES (-5, 'bad')")
    }
    def rootChain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ rootChain(t.getCause)
    // the engine's one-pass check OR Spark's own enforcement of the
    // constraints the table reports (Table.constraints) — either refusal
    // satisfies the contract
    assert(rootChain(e).exists(m =>
      m.toLowerCase.contains("check constraint")))
    // the good row is still the only row
    assert(spark.sql("SELECT COUNT(*) AS n FROM gspec.default.t10")
      .head().getLong(0) == 1L)
  }

  test("ALTER TABLE ADD COLUMNS is a schema-evolution commit") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t11")
    spark.sql("CREATE TABLE gspec.default.t11 (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gspec.default.t11 VALUES (1, 'pre')")
    spark.sql("ALTER TABLE gspec.default.t11 ADD COLUMNS (score BIGINT)")
    spark.sql("INSERT INTO gspec.default.t11 VALUES (2, 'post', 70)")
    val rows = spark.sql(
      """SELECT id, name, score FROM gspec.default.t11 ORDER BY id""")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // the pre-evolution file surfaces the new column as null
    assert(rows.toSeq == Seq((1L, "pre", -1L), (2L, "post", 70L)))
  }

  test("ALTER TABLE RENAME COLUMN routes through column mapping") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t12")
    spark.sql("CREATE TABLE gspec.default.t12 (id BIGINT, name STRING)")
    spark.sql("INSERT INTO gspec.default.t12 VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gspec.default.t12 RENAME COLUMN name TO label")
    val rows = spark.sql(
      "SELECT id, label FROM gspec.default.t12 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b")),
      "data written under the old physical name must read back")
    // metadata-only: no data files rewritten
    val log = new TxnLog(s"$wh/default/t12", spark.sessionState.newHadoopConf())
    val m = log.snapshotLatest().metadata.get
    assert(m.columnMapping.nonEmpty, "rename must record a column mapping")
  }

  test("CTAS is ONE atomic commit: metadata and files land together") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t14")
    spark.sql(
      """CREATE TABLE gspec.default.t14 AS
        |SELECT * FROM VALUES (1, 'a'), (2, 'b') AS v(id, tag)""".stripMargin)
    val log = new TxnLog(s"$wh/default/t14", spark.sessionState.newHadoopConf())
    assert(log.versions() == Seq(0L),
      s"CTAS must be one commit, got versions ${log.versions()}")
    val v0 = log.read(0L)
    assert(v0.exists(_.isInstanceOf[graft.txn.Metadata]))
    assert(v0.count(_.isInstanceOf[graft.txn.AddFile]) > 0,
      "the staged data files commit in the SAME version as the metadata")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gspec.default.t14")
      .head().getLong(0) == 2L)
  }

  test("REPLACE TABLE AS SELECT is atomic and keeps history") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t15")
    spark.sql(
      """CREATE TABLE gspec.default.t15 AS
        |SELECT * FROM VALUES (1, 'old') AS v(id, tag)""".stripMargin)
    spark.sql(
      """REPLACE TABLE gspec.default.t15 AS
        |SELECT * FROM VALUES (10, 'new', 1.5), (11, 'new', 2.5)
        |  AS v(id, tag, score)""".stripMargin)
    // new shape + data visible
    val rows = spark.sql(
      "SELECT id, tag, CAST(score AS DOUBLE) FROM gspec.default.t15 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((10, "new", 1.5), (11, "new", 2.5)))
    // exactly one commit on top of the CTAS, and the old state is
    // still time-travelable
    val log = new TxnLog(s"$wh/default/t15", spark.sessionState.newHadoopConf())
    assert(log.versions() == Seq(0L, 1L))
    val old = spark.sql(
      "SELECT id, tag FROM gspec.default.t15 VERSION AS OF 0")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(old.toSeq == Seq((1, "old")))
  }

  test("REPLACE refuses a missing table; CREATE OR REPLACE accepts it") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t16")
    intercept[Exception] {
      spark.sql(
        "REPLACE TABLE gspec.default.t16 AS SELECT 1 AS id")
    }
    spark.sql(
      "CREATE OR REPLACE TABLE gspec.default.t16 AS SELECT 1 AS id")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gspec.default.t16")
      .head().getLong(0) == 1L)
  }

  test("unsupported ALTER TABLE shapes refuse loudly") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t13")
    spark.sql("CREATE TABLE gspec.default.t13 (id BIGINT, name STRING)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gspec.default.t13 ALTER COLUMN id TYPE INT")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("not supported") ||
      m.contains("ALTER COLUMN")))
  }

  test("column DEFAULTs fill omitted values on INSERT") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t18")
    spark.sql(
      """CREATE TABLE gspec.default.t18 (
        |  id BIGINT, v BIGINT DEFAULT 7, tag STRING DEFAULT 'none')""".stripMargin)
    spark.sql("INSERT INTO gspec.default.t18 (id) VALUES (1)")
    spark.sql("INSERT INTO gspec.default.t18 VALUES (2, 20, 'x')")
    spark.sql("INSERT INTO gspec.default.t18 (id, v) VALUES (3, DEFAULT)")
    val rows = spark.sql(
      "SELECT id, v, tag FROM gspec.default.t18 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 7L, "none"), (2L, 20L, "x"),
      (3L, 7L, "none")))
  }

  test("ANSI constraint + generated-column DDL round-trips") {
    wh
    spark.sql("DROP TABLE IF EXISTS gspec.default.t17")
    spark.sql(
      """CREATE TABLE gspec.default.t17 (
        |  id BIGINT, v BIGINT,
        |  par BIGINT GENERATED ALWAYS AS (id % 2),
        |  CONSTRAINT v_pos CHECK (v >= 0)
        |) PARTITIONED BY (par)""".stripMargin)
    // the table REPORTS its constraint (DESCRIBE surface + Spark-side
    // write enforcement both hang off Table.constraints)
    val desc = spark.sql("DESCRIBE EXTENDED gspec.default.t17")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("v_pos") && desc.contains("CHECK"))
    // INSERT omitting the generated column: computed by the write path
    spark.sql(
      "INSERT INTO gspec.default.t17 (id, v) VALUES (4, 40), (5, 50)")
    val rows = spark.sql(
      "SELECT id, par FROM gspec.default.t17 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((4L, 0L), (5L, 1L)))
    // ADD CONSTRAINT validates existing rows: a violated rule refuses
    val bad = intercept[Exception] {
      spark.sql(
        "ALTER TABLE gspec.default.t17 ADD CONSTRAINT tiny CHECK (v < 45)")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    // Spark validates against existing data before the catalog sees the
    // change (NEW_CHECK_CONSTRAINT_VIOLATION); the engine's own
    // existing-row scan in addConstraint is the second line of defense
    assert(chain(bad).exists(m => m.contains("existing rows violate") ||
      m.contains("violated by existing data")),
      s"wrong failure: ${chain(bad).mkString(" || ")}")
    // DROP CONSTRAINT lifts enforcement
    spark.sql("ALTER TABLE gspec.default.t17 DROP CONSTRAINT v_pos")
    spark.sql("INSERT INTO gspec.default.t17 (id, v) VALUES (6, -1)")
    assert(spark.sql("SELECT COUNT(*) AS n FROM gspec.default.t17")
      .head().getLong(0) == 3L)
  }
}
