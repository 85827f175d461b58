package graft.sources

import graft.SparkTestSession
import graft.txn._
import org.scalatest.funsuite.AnyFunSuite

/** SQL MERGE INTO / UPDATE through the group-based copy-on-write
  * row-level operation: correctness of the final state, ONE atomic
  * commit per statement, and the group contract — files without matches
  * are never rewritten (runtime `_graft_file` filtering).
  */
class RowLevelSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("rls_wh").toString
    spark.conf.set("spark.sql.catalog.grl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grl.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grl.default")
    dir
  }

  private def log(t: String) =
    new TxnLog(s"$wh/default/$t", spark.sessionState.newHadoopConf())

  /** id-partitioned two-file table: ids 1..3 in bucket 'a', 11..13 in
    * bucket 'b' — so a statement touching only bucket 'a' must leave
    * bucket 'b''s file untouched.
    */
  private def freshTable(t: String): Unit = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS grl.default.$t")
    spark.sql(
      s"""CREATE TABLE grl.default.$t (id BIGINT, bucket STRING, v BIGINT)
         |PARTITIONED BY (bucket)""".stripMargin)
    spark.sql(
      s"""INSERT INTO grl.default.$t VALUES
         |(1, 'a', 10), (2, 'a', 20), (3, 'a', 30),
         |(11, 'b', 110), (12, 'b', 120), (13, 'b', 130)""".stripMargin)
  }

  test("SQL UPDATE rewrites only matching rows, atomically") {
    freshTable("u1")
    val vBefore = log("u1").latestVersion().get
    spark.sql("UPDATE grl.default.u1 SET v = v + 1 WHERE id = 2")
    assert(log("u1").latestVersion().get == vBefore + 1,
      "one UPDATE = one commit")
    val rows = spark.sql(
      "SELECT id, v FROM grl.default.u1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, 21L), (3L, 30L),
      (11L, 110L), (12L, 120L), (13L, 130L)))
  }

  test("UPDATE leaves non-matching file groups untouched") {
    freshTable("u2")
    val before = log("u2").snapshotLatest().files
      .filter(_.partitionValues.get("bucket").contains("b")).map(_.path).toSet
    spark.sql("UPDATE grl.default.u2 SET v = 0 WHERE bucket = 'a'")
    val after = log("u2").snapshotLatest().files
      .filter(_.partitionValues.get("bucket").contains("b")).map(_.path).toSet
    assert(after == before,
      s"bucket b's files must not be rewritten: $before -> $after")
    assert(spark.sql(
      "SELECT SUM(v) AS s FROM grl.default.u2 WHERE bucket = 'a'")
      .head().getLong(0) == 0L)
  }

  test("MERGE INTO: matched update + not-matched insert, one commit") {
    freshTable("m1")
    spark.sql(
      """SELECT * FROM VALUES (2, 'a', 200), (99, 'a', 990)
        |AS s(id, bucket, v)""".stripMargin).createOrReplaceTempView("m1_src")
    val vBefore = log("m1").latestVersion().get
    // the merge keys on id (no partition predicate): bucket b surviving
    // unrewritten below proves the RUNTIME _graft_file group filter, not
    // partition pruning
    val bBefore = log("m1").snapshotLatest().files
      .filter(_.partitionValues.get("bucket").contains("b")).map(_.path).toSet
    spark.sql(
      """MERGE INTO grl.default.m1 t USING m1_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, bucket, v)
        |  VALUES (s.id, s.bucket, CAST(s.v AS BIGINT))""".stripMargin)
    assert(log("m1").latestVersion().get == vBefore + 1,
      "one MERGE = one commit")
    val bAfter = log("m1").snapshotLatest().files
      .filter(_.partitionValues.get("bucket").contains("b")).map(_.path).toSet
    assert(bAfter == bBefore,
      "files without matches must not be rewritten (runtime group filter)")
    val rows = spark.sql("SELECT id, v FROM grl.default.m1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, 200L), (3L, 30L),
      (11L, 110L), (12L, 120L), (13L, 130L), (99L, 990L)))
  }

  test("MERGE with WHEN MATCHED DELETE removes rows") {
    freshTable("m2")
    spark.sql("SELECT * FROM VALUES (1), (3) AS s(id)")
      .createOrReplaceTempView("m2_src")
    spark.sql(
      """MERGE INTO grl.default.m2 t USING m2_src s ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    val ids = spark.sql("SELECT id FROM grl.default.m2 ORDER BY id")
      .collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(2L, 11L, 12L, 13L))
  }

  test("pre-statement state stays time-travelable") {
    freshTable("t1")
    val vBefore = log("t1").latestVersion().get
    spark.sql("UPDATE grl.default.t1 SET v = -1 WHERE id >= 0")
    val old = spark.sql(
      s"SELECT SUM(v) AS s FROM grl.default.t1 VERSION AS OF $vBefore")
      .head().getLong(0)
    assert(old == 10L + 20L + 30L + 110L + 120L + 130L)
  }

  test("a DELETE SupportsDelete can't translate falls back to the rewrite") {
    freshTable("d1")
    val vBefore = log("d1").latestVersion().get
    // v % 2 = 1 has no V1 Filter form, so canDeleteWhere refuses and
    // Spark routes through the row-level copy-on-write path instead
    spark.sql("DELETE FROM grl.default.d1 WHERE v % 20 = 10")
    assert(log("d1").latestVersion().get == vBefore + 1)
    val ids = spark.sql("SELECT id FROM grl.default.d1 ORDER BY id")
      .collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(2L, 12L),
      s"v in {10,30,110,130} (ids 1,3,11,13) must be deleted, got ${ids.toSeq}")
  }

  test("the _graft_file metadata column is selectable") {
    freshTable("t2")
    val files = spark.sql(
      "SELECT DISTINCT _graft_file FROM grl.default.t2")
      .collect().map(_.getString(0))
    val live = log("t2").snapshotLatest().files.map(_.path).toSet
    assert(files.length == live.size,
      s"one distinct value per live file: ${files.toSeq}")
    assert(files.forall(_.contains("bucket=")))
  }
}
