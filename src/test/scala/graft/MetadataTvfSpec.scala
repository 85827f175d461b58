package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** graft_partitions / graft_detail answer SHOW PARTITIONS / DESCRIBE
  * DETAIL questions from log metadata alone (q223 certifies the happy
  * path against DuckDB): here the edges — unpartitioned tables collapse
  * to one summary row, a stats-less file makes `n_rows` an honest NULL
  * instead of an undercount, DV dead rows are subtracted without any
  * data-file read, and the null-partition sentinel round-trips to NULL.
  */
class MetadataTvfSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fresh(name: String): String =
    Files.createTempDirectory(name).toString

  test("partitions TVF: exact rows per partition, DV-adjusted, no data read") {
    val path = fresh("ptvf")
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 3)).toDF("id", "p")
    TableWriter.write(spark, df, path, partitionBy = Seq("p"),
      version = 0L, commitTs = 1000L)
    DeletionVectors.deleteWhere(spark, path, col("id") % 10 === 0,
      version = 1L, commitTs = 2000L)
    graft.functions.GraftExtensions.install(spark)
    val out = spark.sql(s"SELECT * FROM graft_partitions('$path')")
      .orderBy("p").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("0", "1", "2"))
    // ids 0..99: p = id%3; deleted = multiples of 10.
    // p=0: 34 rows, deleted {0,30,60,90} -> 30; p=1: 33, deleted {10,40,70}
    // -> 30; p=2: 33, deleted {20,50,80} -> 30.
    assert(out.map(r => r.getLong(r.fieldIndex("n_rows"))).toSeq ==
      Seq(30L, 30L, 30L))
    assert(out.forall(r => r.getLong(r.fieldIndex("n_files")) >= 1L))
    assert(out.forall(r => r.getLong(r.fieldIndex("n_bytes")) > 0L))
  }

  test("detail TVF: one row; unpartitioned table; totals match") {
    val path = fresh("dtvf")
    import spark.implicits._
    TableWriter.write(spark, (0L until 50L).toDF("id"), path,
      partitionBy = Seq.empty, version = 0L, commitTs = 1000L)
    graft.functions.GraftExtensions.install(spark)
    val d = spark.sql(s"SELECT * FROM graft_detail('$path')").collect()
    assert(d.length == 1)
    val r = d.head
    assert(r.getLong(r.fieldIndex("version")) == 0L)
    assert(r.getLong(r.fieldIndex("n_rows")) == 50L)
    assert(r.getString(r.fieldIndex("partition_columns")) == "")
    // unpartitioned graft_partitions: a single summary row, no key cols
    val p = spark.sql(s"SELECT * FROM graft_partitions('$path')").collect()
    assert(p.length == 1 && p.head.getLong(p.head.fieldIndex("n_rows")) == 50L)
  }

  test("stats-less file -> n_rows NULL, never an undercount") {
    val path = fresh("nstvf")
    import spark.implicits._
    TableWriter.write(spark, (0L until 20L).map(i => (i, i % 2)).toDF("id", "p"),
      path, partitionBy = Seq("p"), version = 0L, commitTs = 1000L)
    // simulate a pre-stats engine version: strip stats off p=0's files
    val log = new TxnLog(path, spark.sessionState.newHadoopConf())
    val snap = log.snapshotLatest()
    val victims = snap.files.filter(_.partitionValues.get("p").contains("0"))
    assert(victims.nonEmpty)
    log.commit(1L, victims.flatMap(f => Seq(
      RemoveFile(f.path, 2000L, f.partitionValues, dataChange = false),
      f.copy(stats = None, dataChange = false))) :+ CommitInfo("STRIP", 2000L))
    graft.functions.GraftExtensions.install(spark)
    val out = spark.sql(s"SELECT * FROM graft_partitions('$path')")
      .orderBy("p").collect()
    assert(out.head.isNullAt(out.head.fieldIndex("n_rows"))) // p=0 unknown
    assert(out(1).getLong(out(1).fieldIndex("n_rows")) == 10L)
    val d = spark.sql(s"SELECT * FROM graft_detail('$path')").head()
    assert(d.isNullAt(d.fieldIndex("n_rows"))) // table total unknown too
  }

  test("null partition value sentinel surfaces as NULL") {
    val path = fresh("nulltvf")
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")))
      .toDF("id", "p")
    TableWriter.write(spark, df, path, partitionBy = Seq("p"),
      version = 0L, commitTs = 1000L)
    graft.functions.GraftExtensions.install(spark)
    val out = spark.sql(
      s"SELECT * FROM graft_partitions('$path') WHERE p IS NULL").collect()
    assert(out.length == 1 &&
      out.head.getLong(out.head.fieldIndex("n_rows")) == 1L)
  }

  test("vacuum TVF: sub-7-day retention refuses unless forced; dry runs pass") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("tvf_vac")
      .toString + "/t"
    graft.txn.TableWriter.write(spark, Seq((1L, "a")).toDF("id", "v"),
      path, version = 0L, commitTs = 1000L)
    graft.functions.GraftExtensions.install(spark)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_vacuum('$path', 1000)").collect()
    }
    assert(e.getMessage.contains("safety floor"))
    // dry run and forced run both go through
    spark.sql(s"SELECT * FROM graft_vacuum('$path', 1000, true)").collect()
    spark.sql(s"SELECT * FROM graft_vacuum('$path', 1000, false, true)")
      .collect()
    // a ≥7-day retention needs no force
    spark.sql(
      s"SELECT * FROM graft_vacuum('$path', ${8L * 24 * 3600 * 1000})")
      .collect()
  }
}
