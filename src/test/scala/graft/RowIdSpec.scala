package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stable row ids (the Delta row tracking idea): `_graft_row_id` =
  * AddFile.baseRowId + position, allocated at the TxnLog commit choke
  * point, stable under append and DV delete, preserved through
  * compaction by physical materialization, never recycled after
  * deletes, and NULL (not wrong) for pre-tracking files.
  */
class RowIdSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fresh(name: String): String =
    Files.createTempDirectory(name).toString + "/t"

  private def readIds(path: String) =
    spark.read.format("graft").option("tablePath", path).load()
      .select(col("id"), col(TxnLog.RowIdColumn).as("rid"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
      .toSeq

  private def one(df: org.apache.spark.sql.DataFrame) =
    df.coalesce(1).sortWithinPartitions("id")

  test("appends allocate contiguous ids; later appends continue above") {
    val path = fresh("rid_append")
    import spark.implicits._
    TableWriter.write(spark, one((0L until 10L).toDF("id")), path,
      version = 0L, commitTs = 1000L)
    TableWriter.write(spark, one((10L until 15L).toDF("id")), path,
      version = 1L, commitTs = 2000L)
    val ids = readIds(path)
    // single sorted file per commit -> id i sits at position i
    assert(ids.toMap == (0L until 15L).map(i =>
      i -> java.lang.Long.valueOf(i)).toMap)
    val log = new TxnLog(path, spark.sessionState.newHadoopConf())
    assert(log.rowIdHighWater(log.latestVersion().get) == 15L)
  }

  test("DV delete never renumbers survivors; freed ids are not recycled") {
    val path = fresh("rid_dv")
    import spark.implicits._
    TableWriter.write(spark, one((0L until 10L).toDF("id")), path,
      version = 0L, commitTs = 1000L)
    DeletionVectors.deleteWhere(spark, path, col("id") < 4L,
      version = 1L, commitTs = 2000L)
    assert(readIds(path).toMap == (4L until 10L).map(i =>
      i -> java.lang.Long.valueOf(i)).toMap)
    // append after the delete: ids continue ABOVE the high-water mark —
    // the deleted ids 0..3 are retired forever
    TableWriter.write(spark, one((100L until 103L).toDF("id")), path,
      version = 2L, commitTs = 3000L)
    val after = readIds(path).toMap
    assert(after(100L) == 10L && after(101L) == 11L && after(102L) == 12L)
  }

  test("compaction materializes ids physically; two rewrites still stable") {
    val path = fresh("rid_compact")
    import spark.implicits._
    TableWriter.write(spark, one((0L until 8L).toDF("id")), path,
      version = 0L, commitTs = 1000L)
    TableWriter.write(spark, one((8L until 12L).toDF("id")), path,
      version = 1L, commitTs = 2000L)
    DeletionVectors.deleteWhere(spark, path, col("id") % 5L === 0L,
      version = 2L, commitTs = 3000L)
    val want = readIds(path).toMap
    TableWriter.compact(spark, path, version = 3L, commitTs = 4000L)
    assert(readIds(path).toMap == want, "first compaction changed row ids")
    // the compacted file carries a physical column; rewrite it AGAIN
    TableWriter.write(spark, one((12L until 14L).toDF("id")), path,
      version = 4L, commitTs = 5000L)
    TableWriter.compact(spark, path, version = 5L, commitTs = 6000L)
    val again = readIds(path).toMap
    assert(want.forall { case (k, v) => again(k) == v },
      "second compaction changed surviving row ids")
    // ids stay unique table-wide
    assert(again.values.toSeq.distinct.size == again.size)
  }

  test("pre-tracking files surface NULL ids, never wrong ones") {
    val path = fresh("rid_legacy")
    import spark.implicits._
    // forge a legacy log: data file committed WITHOUT stats (so the
    // choke point cannot allocate) and no high-water marker
    val staging = Files.createTempDirectory("rid_stage").toString
    (0L until 5L).toDF("id").coalesce(1).write.mode("overwrite")
      .parquet(staging)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, new org.apache.hadoop.fs.Path(path, "legacy.parquet"))
    val log = new TxnLog(path, conf)
    log.commit(0L, Seq(
      Metadata((0L until 5L).toDF("id").schema.json, Seq.empty),
      AddFile("legacy.parquet", Map.empty,
        fs.getFileStatus(new org.apache.hadoop.fs.Path(path,
          "legacy.parquet")).getLen, 1000L, dataChange = true),
      CommitInfo("WRITE", 1000L)))
    assert(readIds(path).forall(_._2 == null))
    // a tracked append alongside: new rows get ids, legacy rows stay NULL
    TableWriter.write(spark, one((5L until 8L).toDF("id")), path,
      version = 1L, commitTs = 2000L)
    val ids = readIds(path).toMap
    assert((0L until 5L).forall(ids(_) == null))
    assert((5L until 8L).forall(ids(_) != null))
  }

  test("concurrent rebasing appends never allocate overlapping ids") {
    val path = fresh("rid_conc")
    import spark.implicits._
    TableWriter.write(spark, one((0L until 10L).toDF("id")), path,
      version = 0L, commitTs = 1000L)
    // 6 racing writers of 10 rows each: retries re-read the high-water
    // mark under the new version, so every allocation window is disjoint
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fs = (1 to 6).map { w =>
      Future(TableWriter.appendRebasing(spark,
        one((w * 100L until w * 100L + 10L).toDF("id")), path,
        commitTs = 2000L + w))
    }
    Await.result(Future.sequence(fs), 300.seconds)
    val ids = readIds(path)
    assert(ids.length == 70)
    assert(ids.forall(_._2 != null))
    val rids = ids.map(_._2.longValue)
    assert(rids.distinct.length == 70, "overlapping row id allocation")
    assert(rids.max == 69L, s"expected a dense 0..69 allocation, got max ${rids.max}")
  }

  test("metadata column is selectable through SQL on a catalog table") {
    val wh = Files.createTempDirectory("rid_wh").toString
    spark.conf.set("spark.sql.catalog.ridcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ridcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ridcat.default")
    spark.sql("DROP TABLE IF EXISTS ridcat.default.t")
    spark.sql("CREATE TABLE ridcat.default.t (id BIGINT)")
    spark.sql("INSERT INTO ridcat.default.t VALUES (1), (2), (3)")
    val rows = spark.sql(
      s"SELECT id, ${TxnLog.RowIdColumn} FROM ridcat.default.t")
      .collect()
    assert(rows.length == 3 && rows.forall(!_.isNullAt(1)))
    assert(rows.map(_.getLong(1)).distinct.length == 3)
  }
}
