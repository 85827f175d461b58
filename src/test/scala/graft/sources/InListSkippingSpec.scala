package graft.sources

import graft.SparkTestSession
import graft.txn.{BloomIndex, TableWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IN-list file skipping: a file survives an IN iff ANY candidate value
  * may sit in its [min, max] — the disjunction a single conjunctive
  * range cannot express — and the bloom index tightens point probes the
  * same way. Values outside every file prune the whole scan.
  */
class InListSkippingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** four files with disjoint id ranges: [1,10] [21,30] [41,50] [61,70] */
  private def build(): String = {
    val dir = java.nio.file.Files.createTempDirectory("inl").toString + "/t"
    TableWriter.write(spark,
      (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1),
      dir, version = 0L, commitTs = 1000L)
    Seq(21L to 30L, 41L to 50L, 61L to 70L).foreach { r =>
      TableWriter.append(spark,
        r.map(i => (i, s"r$i")).toDF("id", "v").coalesce(1), dir,
        commitTs = 2000L)
    }
    dir
  }

  private def read(dir: String): DataFrame =
    spark.read.format("graft").option("tablePath", dir).load()

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("an IN list scans only the files that may hold a value") {
    val dir = build()
    val q = read(dir).filter(col("id").isin(5L, 25L, 26L))
    assert(planOf(q).contains("files=2/4"), planOf(q))
    assert(q.count() == 3L)
    // values in gaps between files prune everything
    val none = read(dir).filter(col("id").isin(15L, 35L, 55L))
    assert(planOf(none).contains("files=0/4"), planOf(none))
    assert(none.count() == 0L)
  }

  test("IN composes with ranges and null terms conjunctively") {
    val dir = build()
    val q = read(dir)
      .filter(col("id").isin(5L, 45L, 65L) && col("id") >= 40L)
    assert(planOf(q).contains("files=2/4"), planOf(q))
    assert(q.collect().map(_.getLong(0)).toSet == Set(45L, 65L))
  }

  test("string IN lists prune on string bounds") {
    val dir = java.nio.file.Files.createTempDirectory("inl2").toString + "/t"
    TableWriter.write(spark,
      Seq("apple", "berry").zipWithIndex.map(_.swap)
        .map(p => (p._1.toLong, p._2)).toDF("id", "s").coalesce(1),
      dir, version = 0L, commitTs = 1000L)
    TableWriter.append(spark,
      Seq("mango", "peach").zipWithIndex.map(_.swap)
        .map(p => (p._1.toLong + 10, p._2)).toDF("id", "s").coalesce(1),
      dir, commitTs = 2000L)
    val q = read(dir).filter(col("s").isin("mango", "zebra"))
    assert(planOf(q).contains("files=1/2"), planOf(q))
    assert(q.count() == 1L)
  }

  test("the bloom index tightens IN probes past min/max overlap") {
    val dir = java.nio.file.Files.createTempDirectory("inl3").toString + "/t"
    // two files with OVERLAPPING ranges but disjoint actual values
    TableWriter.write(spark,
      (1L to 99L by 2).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1),
      dir, version = 0L, commitTs = 1000L)
    TableWriter.append(spark,
      (2L to 100L by 2).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1),
      dir, commitTs = 2000L)
    BloomIndex.build(spark, dir, Seq("id"), version = 1L)
    val q = read(dir).filter(col("id").isin(4L, 6L))
    assert(planOf(q).contains("files=1/2"),
      s"bloom must drop the odd-only file: ${planOf(q)}")
    assert(q.count() == 2L)
  }
}
