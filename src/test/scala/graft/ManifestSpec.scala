package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{DeletionVectors, Manifest, SnapshotReader, TableWriter}

/** Symlink-manifest export: the external reader's consistent view. */
class ManifestSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def li = Tables.load(spark, sf, "lineitem")

  test("manifest read equals snapshot read") {
    val dir = freshDir("man1")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    Manifest.generate(spark, dir)
    assert(Manifest.read(spark, dir).count() ==
      SnapshotReader.read(spark, dir).count())
    // partitioned tables export too: partition values live in the file
    // payload? No — hive-style dirs don't carry columns in the files;
    // the manifest reader sees data columns only, counts must still agree
  }

  test("stale manifest keeps serving the OLD version until regenerated") {
    val dir = freshDir("man2")
    val v0 = li.filter(col("l_orderkey") % 7 === 0)
    TableWriter.write(spark, v0, dir, version = 0L, commitTs = 1000L)
    Manifest.generate(spark, dir)
    TableWriter.write(spark, li.filter(col("l_orderkey") % 11 === 0), dir,
      version = 1L, commitTs = 2000L)
    // still v0's list — a manifest is a CONSISTENT snapshot, not a view
    assert(Manifest.read(spark, dir).count() == v0.count())
    Manifest.generate(spark, dir)
    assert(Manifest.read(spark, dir).count() ==
      SnapshotReader.read(spark, dir).count())
  }

  test("DV-carrying snapshots refuse to export") {
    val dir = freshDir("man3")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      version = 0L, commitTs = 1000L)
    DeletionVectors.deleteWhere(spark, dir, col("l_suppkey") % 5 === 0,
      version = 1L, commitTs = 2000L)
    val e = intercept[IllegalArgumentException] {
      Manifest.generate(spark, dir)
    }
    assert(e.getMessage.contains("deletion vectors"))
    // OPTIMIZE folds the vectors back; export works again
    TableWriter.compact(spark, dir, version = 2L, commitTs = 3000L)
    Manifest.generate(spark, dir)
    assert(Manifest.read(spark, dir).count() ==
      SnapshotReader.read(spark, dir).count())
  }
}
