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

  test("SnapshotFiles.filesDF equals TxnLog.snapshot across checkpoint, " +
      "tail, removes and DV transitions") {
    import graft.txn.{SnapshotFiles, TxnLog}
    val dir = freshDir("man_sf")
    val base = li.filter(col("l_orderkey") % 7 === 0)
    // enough commits to cross a parquet checkpoint, then a tail: append,
    // DV delete (remove + re-add same version), compact (removes + add)
    TableWriter.write(spark, base, dir, version = 0L, commitTs = 1000L)
    (1L to 10L).foreach { v =>
      TableWriter.write(spark, li.filter(col("l_orderkey") === 7L * v),
        dir, version = v, commitTs = 1000L + v)
    }
    DeletionVectors.deleteWhere(spark, dir, col("l_suppkey") % 5 === 0,
      version = 11L, commitTs = 20000L)
    TableWriter.compact(spark, dir, version = 12L, commitTs = 30000L)
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    assert(log.checkpointVersions().nonEmpty, "fixture must cross a checkpoint")
    val want = log.snapshotLatest().files
      .map(f => (f.path, f.dv.orNull)).toSet
    val got = SnapshotFiles.filesDF(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want)
  }

  test("legacy single-file manifests still read") {
    val dir = freshDir("man_legacy")
    val v0 = li.filter(col("l_orderkey") % 7 === 0)
    TableWriter.write(spark, v0, dir, version = 0L, commitTs = 1000L)
    // hand-write the pre-r14 single-file form
    val conf = spark.sessionState.newHadoopConf()
    val log = new graft.txn.TxnLog(dir, conf)
    val tableQ = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(conf).makeQualified(p)
    }
    val fs = tableQ.getFileSystem(conf)
    val dest = new org.apache.hadoop.fs.Path(tableQ,
      "_manifest/manifest-00000000000000000000.txt")
    fs.mkdirs(dest.getParent)
    val body = log.snapshotLatest().files
      .map(f => new org.apache.hadoop.fs.Path(tableQ, f.path).toString)
      .sorted.mkString("", "\n", "\n")
    val out = fs.create(dest, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    assert(Manifest.read(spark, dir).count() == v0.count())
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
