package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{ChangeDataFeed, DeletionVectors, TableDiff, TableWriter}

/** Snapshot diff: the change-feed fold and the snapshot multiset
  * compare must produce the SAME net deltas, updates must telescope,
  * and the fallback must serve feed-less tables.
  */
class TableDiffSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def base = {
    import spark.implicits._
    (0L until 120L).map(k => (k, (k % 3).toString, k * 10L))
      .toDF("k", "grp", "cents")
  }

  /** v0 base → v2 update → v3 cow-delete → v4 dv-delete → v5 re-insert. */
  private def history(dir: String, withFeed: Boolean): Unit = {
    import spark.implicits._
    TableWriter.write(spark, base, dir, version = 0L, commitTs = 1000L)
    if (withFeed)
      TableWriter.setTableProperties(spark, dir,
        Map(ChangeDataFeed.Prop -> "true"), version = 1L, commitTs = 1500L)
    else
      TableWriter.setTableProperties(spark, dir,
        Map("owner" -> "spec"), version = 1L, commitTs = 1500L)
    TableWriter.updateWhere(spark, dir, col("k") % 10 === 0,
      Map("cents" -> (col("cents") + 5L)), version = 2L, commitTs = 2000L)
    TableWriter.deleteWhere(spark, dir, col("k") < 6, version = 3L,
      commitTs = 3000L)
    DeletionVectors.deleteWhere(spark, dir, col("k") >= 114, version = 4L,
      commitTs = 4000L)
    TableWriter.append(spark,
      Seq((3L, "0", 999L)).toDF("k", "grp", "cents"), dir,
      commitTs = 5000L)
  }

  private def netOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getLong(0), r.getString(1), r.getLong(2)),
      r.getLong(3))).toMap

  test("cdf fold and snapshot compare agree exactly; updates telescope") {
    val dir = freshDir("tdiff_cdf")
    history(dir, withFeed = true)
    val viaCdf = netOf(TableDiff.cdfDiff(spark, dir, 0L, 5L))
    val viaSnap = netOf(TableDiff.snapshotDiff(spark, dir, 0L, 5L))
    assert(viaCdf == viaSnap && viaCdf.nonEmpty)
    // an updated-THEN-deleted row telescopes to one net loss of the
    // ORIGINAL value: k=0 updated at v2 (cents 5), deleted at v3
    assert(viaCdf.get((0L, "0", 0L)).contains(-1L) &&
      !viaCdf.contains((0L, "0", 5L)))
    // a surviving update is -1 old / +1 new: k=10 → cents 100 → 105
    assert(viaCdf.get((10L, "1", 100L)).contains(-1L) &&
      viaCdf.get((10L, "1", 105L)).contains(1L))
    // re-inserting a deleted key with a NEW value nets loss + gain
    assert(viaCdf.get((3L, "0", 30L)).contains(-1L) &&
      viaCdf.get((3L, "0", 999L)).contains(1L))
    // no zero rows survive the filter
    assert(viaCdf.values.forall(_ != 0L))
  }

  test("diff() falls back to snapshots when the feed is off; empty " +
      "range diffs to an empty frame") {
    val dir = freshDir("tdiff_nofeed")
    history(dir, withFeed = false)
    val viaDiff = netOf(TableDiff.diff(spark, dir, 0L, 5L))
    val viaSnap = netOf(TableDiff.snapshotDiff(spark, dir, 0L, 5L))
    assert(viaDiff == viaSnap && viaDiff.nonEmpty)
    val same = TableDiff.diff(spark, dir, 2L, 2L)
    assert(same.columns.last == TableDiff.NetCol && same.count() == 0L)
  }
}
