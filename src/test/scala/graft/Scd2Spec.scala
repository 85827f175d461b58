package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2
import graft.txn.{DeletionVectors, SnapshotReader, TableWriter}

/** SCD Type-2 interval reconstruction: for EVERY version v of the table,
  * the intervals covering v (valid_from <= v < valid_to, null = open)
  * must rebuild exactly the per-key aggregate state of snapshot v — and
  * keys absent at v must have no covering interval. This is the full
  * correctness contract: it implies closes-on-delete, reopens-on-
  * reappear, and change-only interval breaks, without hand-enumerating
  * cases.
  */
class Scd2Spec extends AnyFunSuite {
  import SparkTestSession._

  private val keys = Seq("l_orderkey", "l_linenumber")
  private val cents = floor(col("l_quantity") * 100)

  private def snapshotState(dir: String, v: Long) =
    SnapshotReader.read(spark, dir, versionAsOf = Some(v))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(cents.cast("long")).as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  private def coveringState(
      intervals: Array[org.apache.spark.sql.Row], v: Long) =
    intervals.collect {
      case r if r.getAs[Long]("valid_from") <= v &&
        (r.isNullAt(r.fieldIndex("valid_to")) ||
          r.getAs[Long]("valid_to") > v) =>
        (r.getLong(0), r.getInt(1)) ->
          (r.getAs[Long]("n"), r.getAs[Long]("cents"))
    }.toMap

  private def assertReconstructs(dir: String, versions: Seq[Long]): Unit = {
    val iv = Scd2.intervals(spark, dir, keys, cents).collect()
    // no key may hold two intervals covering the same version
    versions.foreach { v =>
      val covering = iv.filter(r => r.getAs[Long]("valid_from") <= v &&
        (r.isNullAt(r.fieldIndex("valid_to")) || r.getAs[Long]("valid_to") > v))
      assert(covering.length ==
        covering.map(r => (r.getLong(0), r.getInt(1))).distinct.length,
        s"overlapping intervals at v=$v")
      assert(coveringState(iv, v) == snapshotState(dir, v),
        s"interval reconstruction of v=$v diverges from the snapshot")
    }
  }

  test("intervals reconstruct every snapshot across update/delete/reappear") {
    val dir = java.nio.file.Files.createTempDirectory("scd2").toString + "/t"
    val li = Tables.load(spark, sf, "lineitem")

    // v0: seed
    TableWriter.write(spark, li.filter(col("l_orderkey") % 5 === 0), dir,
      version = 0L, commitTs = 1000L)
    // v1: update a subset + insert brand-new keys
    val upd = li.filter(col("l_orderkey") % 10 === 0)
      .withColumn("l_quantity", col("l_quantity") + 7)
    val ins = li.filter(col("l_orderkey") % 5 =!= 0 &&
      col("l_orderkey") % 11 === 0)
    TableWriter.mergeUpsert(spark, dir, upd.unionByName(ins),
      keys, version = 1L, commitTs = 2000L)
    // v2: delete whole keys (some updated, some untouched, some inserted)
    TableWriter.deleteWhere(spark, dir, col("l_orderkey") % 4 === 0,
      version = 2L, commitTs = 3000L)
    // v3: a deleted key REAPPEARS (fresh interval must open at 3)
    TableWriter.append(spark,
      li.filter(col("l_orderkey") % 20 === 0), dir, commitTs = 4000L)
    // v4: DV row-delete shrinks n for some keys without a file rewrite
    DeletionVectors.deleteWhere(spark, dir,
      col("l_linenumber") % 3 === 0 && col("l_orderkey") % 8 === 0,
      version = 4L, commitTs = 5000L)

    assertReconstructs(dir, 0L to 4L)
  }

  test("incremental maintenance lands exactly on the batch recompute") {
    val dir = java.nio.file.Files.createTempDirectory("scd2i").toString + "/t"
    val hist = java.nio.file.Files.createTempDirectory("scd2h").toString + "/h"
    val li = Tables.load(spark, sf, "lineitem")

    def histState() = SnapshotReader.read(spark, hist)
      .select((keys.map(col) :+ col("n") :+ col("cents") :+
        col("valid_from") :+ col("valid_to")): _*)
      .collect().map(_.toSeq).toSet
    def batchState() = Scd2.intervals(spark, dir, keys, cents)
      .collect().map(_.toSeq).toSet

    // v0+v1 exist BEFORE create: the seed covers multi-version history
    TableWriter.write(spark, li.filter(col("l_orderkey") % 5 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.mergeUpsert(spark, dir,
      li.filter(col("l_orderkey") % 10 === 0)
        .withColumn("l_quantity", col("l_quantity") + 7)
        .unionByName(li.filter(col("l_orderkey") % 5 =!= 0 &&
          col("l_orderkey") % 11 === 0)),
      keys, version = 1L, commitTs = 2000L)
    Scd2.create(spark, dir, hist, keys, cents)
    assert(histState() == batchState(), "seed diverges")

    // v2: delete whole keys → refresh closes their intervals
    TableWriter.deleteWhere(spark, dir, col("l_orderkey") % 4 === 0,
      version = 2L, commitTs = 3000L)
    Scd2.refresh(spark, dir, hist, keys, cents)
    assert(histState() == batchState(), "delete diverges")

    // v3: reappearance; v4: DV row-delete — ONE refresh walks both
    TableWriter.append(spark, li.filter(col("l_orderkey") % 20 === 0), dir,
      commitTs = 4000L)
    DeletionVectors.deleteWhere(spark, dir,
      col("l_linenumber") % 3 === 0 && col("l_orderkey") % 8 === 0,
      version = 4L, commitTs = 5000L)
    Scd2.refresh(spark, dir, hist, keys, cents)
    assert(histState() == batchState(), "reappear+DV diverges")
    assert(Scd2.refreshedThrough(spark, hist) == 4L)

    // no base movement → refresh is a pure no-op (no new history commit)
    val before = new graft.txn.TxnLog(hist,
      spark.sessionState.newHadoopConf()).latestVersion()
    Scd2.refresh(spark, dir, hist, keys, cents)
    assert(new graft.txn.TxnLog(hist,
      spark.sessionState.newHadoopConf()).latestVersion() == before)
  }

  test("CDF interval build reconstructs every snapshot (unique keys)") {
    import spark.implicits._
    import graft.txn.ChangeDataFeed
    val dir = java.nio.file.Files.createTempDirectory("scd2c").toString + "/t"
    // unique-key dimension (the intervalsFromCdf contract)
    TableWriter.write(spark,
      (0L until 200L).map(k => (k, k * 10L)).toDF("k", "cents"),
      dir, version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      Map(ChangeDataFeed.Prop -> "true"), version = 1L, commitTs = 1500L)
    TableWriter.updateWhere(spark, dir, col("k") % 4 === 0,
      Map("cents" -> (col("cents") + 1L)), version = 2L, commitTs = 2000L)
    DeletionVectors.deleteWhere(spark, dir, col("k") % 10 === 0,
      version = 3L, commitTs = 3000L)
    TableWriter.deleteWhere(spark, dir, col("k") % 7 === 0, version = 4L,
      commitTs = 4000L)
    // merge: update survivors %6, resurrect %70 (killed at v3), insert
    // fresh keys
    val src = ((0L until 200L).filter(k =>
        (k % 6 == 0 && k % 10 != 0 && k % 7 != 0) || k % 70 == 0) ++
        Seq(900L, 901L)).map(k => (k, k + 5L)).toDF("k", "cents")
    TableWriter.mergeUpsert(spark, dir, src, Seq("k"), version = 5L,
      commitTs = 5000L)
    TableWriter.append(spark, Seq((950L, 1L)).toDF("k", "cents"), dir,
      commitTs = 6000L)

    val iv = Scd2.intervalsFromCdf(spark, dir, Seq("k"), col("cents"),
      baseVersion = 1L).collect()
    def stateAt(v: Long) = SnapshotReader
      .read(spark, dir, versionAsOf = Some(v))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 6L).foreach { v =>
      val covering = iv.filter(r => r.getAs[Long]("valid_from") <= v &&
        (r.isNullAt(r.fieldIndex("valid_to")) ||
          r.getAs[Long]("valid_to") > v))
      assert(covering.length == covering.map(_.getLong(0)).distinct.length,
        s"overlapping intervals at v=$v")
      val got = covering.map(r => r.getLong(0) -> r.getAs[Long]("cents"))
        .toMap
      assert(got == stateAt(v), s"CDF intervals diverge at v=$v")
    }
  }

  test("intervalsFromCdf pushes the open/close split into the sidecar " +
      "scans and leaves no cached blocks behind") {
    import spark.implicits._
    import graft.txn.ChangeDataFeed
    val dir = java.nio.file.Files.createTempDirectory("scd2r").toString + "/t"
    TableWriter.write(spark,
      (0L until 50L).map(k => (k, k * 10L)).toDF("k", "cents"),
      dir, version = 0L, commitTs = 1000L)
    TableWriter.setTableProperties(spark, dir,
      Map(ChangeDataFeed.Prop -> "true"), version = 1L, commitTs = 1500L)
    TableWriter.updateWhere(spark, dir, col("k") % 4 === 0,
      Map("cents" -> (col("cents") + 1L)), version = 2L, commitTs = 2000L)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val iv = Scd2.intervalsFromCdf(spark, dir, Seq("k"), col("cents"),
      baseVersion = 1L)
    // the opens and closes branches both derive from ONE events
    // aggregate split by `_open`; Catalyst pushes that split below the
    // aggregate and into the sidecar scans as _change_type PushedFilters,
    // so the branches aggregate DISJOINT row sets — combined work equals
    // one unfiltered pass, with no persist() to leak (r10 ADVICE)
    val plan = iv.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(_change_type") &&
      plan.contains("PushedFilters: [Not(In(_change_type"),
      s"expected the open/close split pushed into both sidecar scans:\n$plan")
    iv.count() // materialize
    assert(spark.sparkContext.getPersistentRDDs.size == cachedBefore,
      "intervalsFromCdf must not leak cached blocks")
  }

  test("unchanged keys yield exactly one open interval") {
    val dir = java.nio.file.Files.createTempDirectory("scd2b").toString + "/t"
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.append(spark, li.filter(col("l_orderkey") % 7 === 1), dir,
      commitTs = 2000L)
    val iv = Scd2.intervals(spark, dir, keys, cents)
    // every key appears once; appended keys open at 1, seeded keys at 0
    assert(iv.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).count() == 0)
    assert(iv.filter(col("valid_to").isNotNull).count() == 0)
    val opens = iv.groupBy(col("valid_from")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(opens.keySet == Set(0L, 1L) && opens.values.forall(_ > 0))
  }
}
