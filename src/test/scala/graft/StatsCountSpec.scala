package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{DeletionVectors, SnapshotReader, TableWriter}

/** Metadata-only counts must equal full-scan counts — through appends,
  * stacked DV deletes, and compaction — without opening a data file.
  */
class StatsCountSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def scanCounts(dir: String, partCol: Option[String]) = partCol match {
    case Some(c) => SnapshotReader.read(spark, dir).groupBy(col(c)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    case None => Map("" -> SnapshotReader.read(spark, dir).count())
  }

  test("partitioned + stacked DVs: stats counts equal scan counts") {
    val dir = freshDir("sc1")
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 5 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    TableWriter.append(spark, li.filter(col("l_orderkey") % 5 === 1), dir,
      commitTs = 1500L)
    DeletionVectors.deleteWhere(spark, dir, col("l_suppkey") % 4 === 0,
      version = 2L, commitTs = 2000L)
    DeletionVectors.deleteWhere(spark, dir, col("l_partkey") % 6 === 0,
      version = 3L, commitTs = 3000L)
    val got = SnapshotReader.statsCount(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == scanCounts(dir, Some("l_returnflag")))
    assert(got.values.sum > 0)
  }

  test("unpartitioned: one global row; compaction folds DVs away") {
    val dir = freshDir("sc2")
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 9 === 0), dir,
      version = 0L, commitTs = 1000L)
    DeletionVectors.deleteWhere(spark, dir, col("l_linenumber") === 2,
      version = 1L, commitTs = 2000L)
    val want = scanCounts(dir, None)("")
    assert(SnapshotReader.statsCount(spark, dir).head().getLong(0) == want)
    // compaction rewrites DV-carrying files into plain ones: stats
    // counts must stay exact with zero DV arithmetic left
    TableWriter.compact(spark, dir, version = 2L, commitTs = 3000L,
      minFileBytes = Long.MaxValue)
    assert(SnapshotReader.statsCount(spark, dir).head().getLong(0) == want)
  }

  test("stats min/max: exact clean, exact through the DV fallback") {
    val dir = freshDir("sc4")
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 3 === 0), dir,
      version = 0L, commitTs = 1000L)
    def want() = {
      val r = SnapshotReader.read(spark, dir)
        .agg(min(col("l_extendedprice")), max(col("l_extendedprice"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    assert(SnapshotReader.statsMinMax(spark, dir, "l_extendedprice") == want())
    // delete the current max row via DV: the metadata answer must
    // change with it (the fallback scans only the DV-carrying files)
    val mx = want()._2
    DeletionVectors.deleteWhere(spark, dir, col("l_extendedprice") === mx,
      version = 1L, commitTs = 2000L)
    assert(SnapshotReader.statsMinMax(spark, dir, "l_extendedprice") == want())
  }

  test("time travel: counts at an earlier version ignore later deletes") {
    val dir = freshDir("sc3")
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 11 === 0), dir,
      version = 0L, commitTs = 1000L)
    val v0 = li.filter(col("l_orderkey") % 11 === 0).count()
    DeletionVectors.deleteWhere(spark, dir, col("l_linenumber") === 1,
      version = 1L, commitTs = 2000L)
    assert(SnapshotReader.statsCount(spark, dir, versionAsOf = Some(0L))
      .head().getLong(0) == v0)
    assert(SnapshotReader.statsCount(spark, dir).head().getLong(0) < v0)
  }
}
