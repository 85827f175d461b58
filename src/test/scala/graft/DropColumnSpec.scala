package graft

import graft.txn.{SnapshotReader, TableWriter, TxnLog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only DROP COLUMN + the resurrection guard: dropping touches
  * no data file, time travel still sees the column, and RE-ADDING a
  * dropped name maps to a fresh physical name so the old bytes can
  * never surface again.
  */
class DropColumnSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("dropc_wh").toString
    spark.conf.set("spark.sql.catalog.gdc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdc.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdc.default")
    dir
  }

  test("DROP COLUMN is metadata-only; time travel still sees the column") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdc.default.d1")
    spark.sql("CREATE TABLE gdc.default.d1 (id BIGINT, secret STRING, v BIGINT)")
    spark.sql(
      "INSERT INTO gdc.default.d1 VALUES (1, 'a', 10), (2, 'b', 20)")
    val log = new TxnLog(s"$wh/default/d1",
      spark.sessionState.newHadoopConf())
    val filesBefore = log.snapshotLatest().files.map(_.path).toSet
    spark.sql("ALTER TABLE gdc.default.d1 DROP COLUMN secret")
    assert(log.snapshotLatest().files.map(_.path).toSet == filesBefore,
      "no data file may be rewritten")
    val cols = spark.sql("SELECT * FROM gdc.default.d1").columns.toSeq
    assert(cols == Seq("id", "v"))
    // the pre-drop version still surfaces the column
    val old = spark.sql(
      "SELECT secret FROM gdc.default.d1 VERSION AS OF 1 ORDER BY secret")
      .collect().map(_.getString(0))
    assert(old.toSeq == Seq("a", "b"))
  }

  test("re-added name maps to a fresh physical name: old bytes stay dead") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdc.default.d2")
    spark.sql("CREATE TABLE gdc.default.d2 (id BIGINT, secret STRING)")
    spark.sql("INSERT INTO gdc.default.d2 VALUES (1, 'classified')")
    spark.sql("ALTER TABLE gdc.default.d2 DROP COLUMN secret")
    spark.sql("ALTER TABLE gdc.default.d2 ADD COLUMNS (secret STRING)")
    // the OLD file physically holds secret='classified'; the re-added
    // column must read as null there, not resurrect it
    val rows = spark.sql("SELECT id, secret FROM gdc.default.d2")
      .collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(rows.toSeq == Seq((1L, true)),
      "dropped bytes must not resurrect under the re-added name")
    // and new writes round-trip under the fresh physical name
    spark.sql("INSERT INTO gdc.default.d2 VALUES (2, 'fresh')")
    val after = spark.sql(
      "SELECT id, secret FROM gdc.default.d2 ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(after.toSeq == Seq((1L, None), (2L, Some("fresh"))))
    val m = new TxnLog(s"$wh/default/d2",
      spark.sessionState.newHadoopConf()).snapshotLatest().metadata.get
    assert(m.columnMapping.get("secret").exists(_ != "secret"),
      s"re-added column needs a fresh physical name, got ${m.columnMapping}")
  }

  test("refusals: partition, generated, constraint-referenced, last column") {
    val path = java.nio.file.Files.createTempDirectory("dropc").toString + "/t"
    val seed = spark.range(1, 5)
      .selectExpr("id", "CAST(id % 2 AS BIGINT) AS par", "id * 2 AS v")
    TableWriter.write(spark, seed, path, partitionBy = Seq("par"),
      version = 0L, commitTs = 1000L, generated = Map("par" -> "id % 2"))
    TableWriter.addConstraint(spark, path, "v >= 0", 1L, 2000L)
    def refuse(c: String): Unit = {
      val e = intercept[Exception] {
        TableWriter.dropColumn(spark, path, c, 2L, 3000L)
      }
      assert(e.getMessage.contains("cannot drop") ||
        e.getMessage.contains("no column"), e.getMessage)
    }
    refuse("par") // partition + generated
    refuse("v")   // constraint-referenced
    refuse("id")  // feeds the generated column
    // content untouched by the refusals
    assert(SnapshotReader.read(spark, path).count() == 4)
  }
}
