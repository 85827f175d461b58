package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Metadata-only RENAME COLUMN via column mapping (TableWriter
  * .renameColumn / Metadata.columnMapping): files keep their
  * creation-time field names; readers and writers translate at the file
  * boundary. The whole point is that renaming costs one JSON commit at
  * any table size.
  */
class ColumnMappingSpec extends AnyFunSuite {
  import SparkTestSession._

  /** v0: 4-column lineitem slice; v1: RENAME l_quantity → qty. */
  private def build(): String = {
    val table = Files.createTempDirectory("colmap").toString + "/t"
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .filter(col("l_orderkey") % 7 === 0)
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    TableWriter.renameColumn(spark, table, "l_quantity", "qty",
      version = 1L, commitTs = 2000L)
    table
  }

  private def dataFiles(table: String): Set[String] = {
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    log.snapshotLatest().files.map(_.path).toSet
  }

  test("rename is metadata-only: same files, new name, same values") {
    val table = build()
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    assert(log.snapshot(0L).files.map(_.path).toSet == dataFiles(table),
      "rename must not add or remove a single data file")
    val df = SnapshotReader.read(spark, table)
    assert(df.columns.contains("qty") && !df.columns.contains("l_quantity"))
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
      .agg(sum("l_quantity")).head.getDouble(0)
    assert(df.agg(sum("qty")).head.getDouble(0) == expected)
  }

  test("files on disk keep the physical name; time travel shows the old") {
    val table = build()
    // raw parquet (no mapping) still spells the creation-time name
    val raw = spark.read.parquet(
      dataFiles(table).map(p => s"$table/$p").toSeq: _*)
    assert(raw.columns.contains("l_quantity") && !raw.columns.contains("qty"))
    // pre-rename version reads under the old logical name
    val v0 = SnapshotReader.read(spark, table, versionAsOf = Some(0L))
    assert(v0.columns.contains("l_quantity") && !v0.columns.contains("qty"))
  }

  test("appends after rename write PHYSICAL names and read back logical") {
    val table = build()
    val more = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .filter(col("l_orderkey") % 11 === 0 && col("l_orderkey") % 7 =!= 0)
      .withColumnRenamed("l_quantity", "qty") // caller speaks logical
    TableWriter.write(spark, more, table, version = 2L, commitTs = 3000L)
    val newFiles = dataFiles(table) --
      new TxnLog(table, spark.sessionState.newHadoopConf())
        .snapshot(0L).files.map(_.path).toSet
    assert(newFiles.nonEmpty)
    val rawNew = spark.read.parquet(newFiles.map(p => s"$table/$p").toSeq: _*)
    assert(rawNew.columns.contains("l_quantity"),
      "post-rename appends must keep the physical file name")
    val df = SnapshotReader.read(spark, table)
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 7 === 0 ||
        col("l_orderkey") % 11 === 0)
      .agg(sum("l_quantity")).head.getDouble(0)
    assert(df.agg(sum("qty")).head.getDouble(0) == expected)
  }

  test("rewrite-delete and CDC replay translate after a rename") {
    val table = build()
    TableWriter.deleteWhere(spark, table, col("qty") > 25,
      version = 2L, commitTs = 3000L)
    val df = SnapshotReader.read(spark, table)
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 7 === 0 && col("l_quantity") <= 25)
      .count()
    assert(df.count() == expected)
    assert(df.filter(col("qty") > 25).count() == 0)
    // batch CDC replay across the rename surfaces the LATEST logical name
    val cdc = CdcReader.cdc(spark, table, startingVersion = 0L,
      includeHistory = true)
    assert(cdc.columns.contains("qty") && !cdc.columns.contains("l_quantity"))
    assert(cdc.filter(col("op") === "c" && col("qty").isNull).count() == 0,
      "a mapping-blind read would surface the renamed column as nulls")
  }

  test("stats skipping prunes on the renamed column") {
    val table = Files.createTempDirectory("colmap_skip").toString + "/t"
    TableWriter.write(spark,
      Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .repartitionByRange(6, col("l_orderkey")),
      table, version = 0L, commitTs = 1000L)
    TableWriter.renameColumn(spark, table, "l_orderkey", "okey",
      version = 1L, commitTs = 2000L)
    val (kept, _, _) = DataSkipping.filesFor(spark, table,
      col("okey").between(100L, 800L))
    val all = dataFiles(table)
    assert(kept.size < all.size,
      s"expected pruning on the renamed column: kept ${kept.size}/${all.size}")
    val got = DataSkipping.readWhere(spark, table,
        col("okey").between(100L, 800L))
      .agg(count(lit(1)), sum("l_quantity")).head
    val want = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey").between(100L, 800L))
      .agg(count(lit(1)), sum("l_quantity")).head
    assert(got == want)
  }

  test("rename refuses ambiguity, partition columns, and constraints") {
    val table = Files.createTempDirectory("colmap_guard").toString + "/t"
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .filter(col("l_orderkey") % 7 === 0)
    TableWriter.write(spark, li, table, partitionBy = Seq("l_returnflag"),
      version = 0L, commitTs = 1000L)
    TableWriter.addConstraint(spark, table, "l_quantity >= 0",
      version = 1L, commitTs = 2000L)
    intercept[IllegalArgumentException] { // partition column
      TableWriter.renameColumn(spark, table, "l_returnflag", "rf", 2L, 3000L)
    }
    intercept[IllegalArgumentException] { // constraint references it
      TableWriter.renameColumn(spark, table, "l_quantity", "qty", 2L, 3000L)
    }
    intercept[IllegalArgumentException] { // target exists
      TableWriter.renameColumn(spark, table, "l_orderkey", "l_linenumber",
        2L, 3000L)
    }
    intercept[IllegalArgumentException] { // source absent
      TableWriter.renameColumn(spark, table, "nope", "x", 2L, 3000L)
    }
    // legal rename still works on this table
    TableWriter.renameColumn(spark, table, "l_orderkey", "okey", 2L, 3000L)
    // ... and renaming BACK to a name that is now another column's
    // physical spelling is refused (ambiguous translation)
    intercept[IllegalArgumentException] {
      TableWriter.renameColumn(spark, table, "l_linenumber", "l_orderkey",
        3L, 4000L)
    }
    // a mapped table demands reader v2 — protocol committed with rename
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    assert(log.snapshotLatest().protocol.exists(_.minReaderVersion >= 2))
  }

  test("rename chains compose: a→b→c reads creation-time files") {
    val table = build()
    TableWriter.renameColumn(spark, table, "qty", "quantity",
      version = 2L, commitTs = 3000L)
    val df = SnapshotReader.read(spark, table)
    assert(df.columns.contains("quantity") && !df.columns.contains("qty"))
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
      .agg(sum("l_quantity")).head.getDouble(0)
    assert(df.agg(sum("quantity")).head.getDouble(0) == expected)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val m = log.snapshotLatest().metadata.get
    assert(m.columnMapping == Map("quantity" -> "l_quantity"))
  }
}
