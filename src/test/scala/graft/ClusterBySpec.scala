package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Declared clustering (liquid-clustering surface): after SET CLUSTER
  * BY, an argument-less OPTIMIZE lays files out by the declared
  * columns — single-column range clustering gives DISJOINT per-file
  * spans; explicit layout arguments still override; refusals guard
  * schema and partition columns.
  */
class ClusterBySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshTable(): (String, TxnLog) = {
    val path = java.nio.file.Files.createTempDirectory("cb").toString + "/t"
    // 4 small files, each spanning the WHOLE id range (worst layout)
    val df = (0L until 400L).map(i => (i % 100, i)).toDF("id", "seq")
    TableWriter.write(spark, df.repartition(4), path,
      version = 0L, commitTs = 1000L)
    (path, new TxnLog(path, spark.sessionState.newHadoopConf()))
  }

  private def idSpans(log: TxnLog): Seq[(Long, Long)] =
    log.snapshotLatest().files.map { f =>
      val st = f.stats.get
      (st.minValues("id").toLong, st.maxValues("id").toLong)
    }

  private def disjoint(spans: Seq[(Long, Long)]): Boolean = {
    val s = spans.sortBy(_._1)
    s.zip(s.drop(1)).forall { case ((_, hi), (lo, _)) => hi <= lo }
  }

  test("argument-less OPTIMIZE follows the declared cluster column") {
    val (path, log) = freshTable()
    assert(!disjoint(idSpans(log)), "fixture must start unclustered")
    TableWriter.setClusterBy(spark, path, Seq("id"),
      version = 1L, commitTs = 2000L)
    TableWriter.compact(spark, path, version = 2L, commitTs = 3000L,
      targetFiles = 4)
    assert(disjoint(idSpans(log)),
      s"expected disjoint id spans after clustered OPTIMIZE: ${idSpans(log)}")
    val t = spark.read.format("graft").option("tablePath", path).load()
    assert(t.count() == 400L)
    assert(t.agg(sum(col("seq"))).head().getLong(0) == (0L until 400L).sum)
  }

  test("explicit layout arguments override the declaration") {
    val (path, log) = freshTable()
    TableWriter.setClusterBy(spark, path, Seq("id"),
      version = 1L, commitTs = 2000L)
    TableWriter.compact(spark, path, version = 2L, commitTs = 3000L,
      targetFiles = 4, clusterBy = Some("seq"))
    val seqSpans = log.snapshotLatest().files.map { f =>
      val st = f.stats.get
      (st.minValues("seq").toLong, st.maxValues("seq").toLong)
    }
    assert(disjoint(seqSpans), s"explicit seq clustering ignored: $seqSpans")
  }

  test("unknown and partition columns refuse") {
    val (path, _) = freshTable()
    val e1 = intercept[IllegalArgumentException] {
      TableWriter.setClusterBy(spark, path, Seq("nope"),
        version = 1L, commitTs = 2000L)
    }
    assert(e1.getMessage.contains("not in schema"))
    val p2 = java.nio.file.Files.createTempDirectory("cb2").toString + "/t"
    TableWriter.write(spark,
      (0L until 40L).map(i => (i, i % 2)).toDF("id", "p"), p2,
      partitionBy = Seq("p"), version = 0L, commitTs = 1000L)
    val e2 = intercept[IllegalArgumentException] {
      TableWriter.setClusterBy(spark, p2, Seq("p"),
        version = 1L, commitTs = 2000L)
    }
    assert(e2.getMessage.contains("partition column"))
  }

  test("the SQL TVF declares and a later optimize maintains") {
    val (path, log) = freshTable()
    graft.functions.GraftExtensions.install(spark)
    val row = spark.sql(s"SELECT * FROM graft_cluster_by('$path', 'id')")
      .head()
    assert(row.getString(1) == "id")
    spark.sql(s"SELECT * FROM graft_optimize('$path')").collect()
    assert(disjoint(idSpans(log)))
  }
}
