package graft.sources

import graft.{SparkTestSession, Tables}
import graft.txn.{SnapshotReader, TableWriter, TxnLog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Predicate-scoped OVERWRITE (replaceWhere) + dynamic partition
  * overwrite: atomicity, file-path preservation outside the scope, the
  * incoming-rows scope refusal, three-valued predicate semantics at the
  * rewrite, and the DSv2 writeTo surfaces.
  */
class ReplaceWhereSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val conf = spark.sessionState.newHadoopConf()
  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def liveFiles(dir: String): Set[String] =
    new TxnLog(dir, conf).snapshotLatest().files.map(_.path).toSet

  test("replaceWhere swaps exactly the predicate's rows in one commit") {
    val dir = freshDir("rw1")
    val li = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
      .withColumn("band", (col("l_suppkey") % 3).cast("string"))
    TableWriter.write(spark, li, dir, partitionBy = Seq("band"),
      version = 0L, commitTs = 1000L)
    val before = liveFiles(dir)
    val repl = li.filter(col("band") === "1")
      .withColumn("l_quantity", lit(999.0))
    val log = new TxnLog(dir, conf)
    TableWriter.replaceWhere(spark, dir, repl, col("band") === "1",
      version = 1L, commitTs = 2000L)
    assert(log.latestVersion().contains(1L), "one atomic commit")
    val after = liveFiles(dir)
    // untouched partitions keep their physical paths
    val untouchedBefore = before.filterNot(_.contains("band=1"))
    assert(untouchedBefore.subsetOf(after),
      "files outside the predicate scope must keep their paths")
    val got = SnapshotReader.read(spark, dir)
    assert(got.filter(col("band") === "1")
      .filter(col("l_quantity") =!= 999.0).count() == 0)
    assert(got.count() == li.count())
    assert(got.filter(col("band") =!= "1").count() ==
      li.filter(col("band") =!= "1").count())
  }

  test("replaceWhere refuses incoming rows outside the predicate") {
    val dir = freshDir("rw2")
    val li = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 11 === 0)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    val e = intercept[IllegalArgumentException] {
      TableWriter.replaceWhere(spark, dir,
        li.limit(5), col("l_quantity") < 0,
        version = 1L, commitTs = 2000L)
    }
    assert(e.getMessage.contains("do not satisfy"))
    assert(new TxnLog(dir, conf).latestVersion().contains(0L),
      "a refused replaceWhere must not commit")
  }

  test("rewrite keeps rows whose predicate evaluates NULL (3VL)") {
    val dir = freshDir("rw3")
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None: Option[Long]), (3L, Some(3L)))
      .toDF("id", "x")
    TableWriter.write(spark, df, dir, version = 0L, commitTs = 1000L)
    // x > 5 is TRUE for id=1, NULL for id=2, FALSE for id=3: SQL DELETE
    // removes only id=1; the NULL row must survive the file rewrite
    TableWriter.deleteWhere(spark, dir, col("x") > 5,
      version = 1L, commitTs = 2000L)
    val kept = SnapshotReader.read(spark, dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 3L), s"got $kept")
    // same contract on the replaceWhere survivor side
    val dir2 = freshDir("rw3b")
    TableWriter.write(spark, df, dir2, version = 0L, commitTs = 1000L)
    TableWriter.replaceWhere(spark, dir2,
      Seq((9L, Some(100L))).toDF("id", "x"), col("x") > 5,
      version = 1L, commitTs = 2000L)
    val kept2 = SnapshotReader.read(spark, dir2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept2 == Seq(2L, 3L, 9L), s"got $kept2")
  }

  test("writeTo(...).overwrite(condition) reaches replaceWhere") {
    val dir = java.nio.file.Files.createTempDirectory("rwcat").toString
    spark.conf.set("spark.sql.catalog.grw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grw.warehouse", dir)
    try {
      spark.sql("CREATE TABLE grw.default.t (id BIGINT, p BIGINT)")
      spark.sql("INSERT INTO grw.default.t VALUES (1, 0), (2, 0), (3, 1)")
      import spark.implicits._
      Seq((30L, 1L), (31L, 1L)).toDF("id", "p")
        .writeTo("grw.default.t").overwrite(col("p") === 1L)
      val got = spark.table("grw.default.t")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 30L, 31L), s"got $got")
    } finally {
      spark.conf.unset("spark.sql.catalog.grw")
      spark.conf.unset("spark.sql.catalog.grw.warehouse")
    }
  }

  test("dynamic partition overwrite replaces only present partitions") {
    // programmatic surface only: Spark has no V1Write fallback exec for
    // OverwritePartitionsDynamic, so writeTo().overwritePartitions()
    // cannot bridge (documented at GraftBatchTable.capabilities)
    val dir = freshDir("rwdyn")
    import spark.implicits._
    Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)).toDF("id", "p")
      .createOrReplaceTempView("rwdyn_seed")
    TableWriter.write(spark,
      spark.table("rwdyn_seed"), dir, partitionBy = Seq("p"),
      version = 0L, commitTs = 1000L)
    val before = new TxnLog(dir, conf).snapshotLatest().files
      .filterNot(_.partitionValues.get("p").contains("1"))
      .map(_.path)
    TableWriter.overwritePartitionsDynamic(spark, dir,
      Seq((30L, 1L), (31L, 1L)).toDF("id", "p"),
      version = 1L, commitTs = 2000L)
    val got = SnapshotReader.read(spark, dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 4L, 30L, 31L), s"got $got")
    val after = new TxnLog(dir, conf).snapshotLatest().files.map(_.path).toSet
    assert(before.forall(after.contains),
      "partitions absent from the incoming frame must keep their files")
  }

  test("dynamic partition overwrite refuses an unpartitioned table") {
    val dir = freshDir("rwdyn2")
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("id", "p")
    TableWriter.write(spark, df, dir, version = 0L, commitTs = 1000L)
    val e = intercept[IllegalArgumentException] {
      TableWriter.overwritePartitionsDynamic(spark, dir, df,
        version = 1L, commitTs = 2000L)
    }
    assert(e.getMessage.contains("partitioned"))
  }
}
