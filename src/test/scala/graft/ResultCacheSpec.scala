package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{ResultCache, SnapshotReader, TableWriter}

/** Version-keyed result cache: hits until an input table commits. */
class ResultCacheSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("second call serves the cache; a commit invalidates it") {
    val dir = freshDir("rc")
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      version = 0L, commitTs = 1000L)
    ResultCache.invalidate(spark, "rc_spec_agg")
    var computes = 0
    def query = {
      computes += 1
      SnapshotReader.read(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
    }
    val first = ResultCache.run(spark, "rc_spec_agg", Seq(dir))(query)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(computes == 1)
    val second = ResultCache.run(spark, "rc_spec_agg", Seq(dir))(query)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(computes == 1, "same versions must serve the cache, not rerun")
    assert(second == first)
    // a commit moves the version key: recompute, and see the new rows
    TableWriter.write(spark, li.filter(col("l_orderkey") % 11 === 0), dir,
      version = 1L, commitTs = 2000L)
    val third = ResultCache.run(spark, "rc_spec_agg", Seq(dir))(query)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(computes == 2, "new table version must recompute")
    assert(third.values.sum > first.values.sum)
    // the stale generation still exists (time-travel-consistent reads
    // could still serve it); invalidate clears every generation
    ResultCache.invalidate(spark, "rc_spec_agg")
    ResultCache.run(spark, "rc_spec_agg", Seq(dir))(query)
    assert(computes == 3)
  }
}
