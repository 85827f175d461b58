package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{CdcReader, SnapshotReader, TableWriter, TxnLog}

/** MERGE full-sync: the scoped WHEN-NOT-MATCHED-BY-SOURCE shape. */
class FullSyncSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def li = Tables.load(spark, sf, "lineitem")

  test("scope slice lands exactly on the source; out-of-scope untouched") {
    val dir = freshDir("fsync1")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    val scope = col("l_returnflag") === "R"
    val src = li.filter(scope && col("l_orderkey") % 7 === 0 &&
        col("l_orderkey") % 5 =!= 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
    TableWriter.mergeFullSync(spark, dir, src, scope,
      version = 1L, commitTs = 2000L)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sorted.toSeq
    val state = SnapshotReader.read(spark, dir)
    // in scope: exactly the source rows
    assert(key(state.filter(scope)) == key(src))
    // out of scope: exactly the v0 rows
    assert(key(state.filter(!scope)) ==
      key(li.filter(!scope && col("l_orderkey") % 7 === 0)))
  }

  test("out-of-scope files keep their paths") {
    val dir = freshDir("fsync2")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    val conf = spark.sessionState.newHadoopConf()
    val before = new TxnLog(dir, conf).snapshotLatest().files
      .filterNot(_.partitionValues.get("l_returnflag").contains("R"))
      .map(_.path).toSet
    val scope = col("l_returnflag") === "R"
    TableWriter.mergeFullSync(spark, dir,
      li.filter(scope && col("l_orderkey") % 35 === 0), scope,
      version = 1L, commitTs = 2000L)
    val after = new TxnLog(dir, conf).snapshotLatest().files
      .filterNot(_.partitionValues.get("l_returnflag").contains("R"))
      .map(_.path).toSet
    assert(before == after, "non-R files must survive byte-identical")
  }

  test("source rows outside the scope throw") {
    val dir = freshDir("fsync3")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    val e = intercept[IllegalArgumentException] {
      TableWriter.mergeFullSync(spark, dir,
        li.filter(col("l_orderkey") % 7 === 0), // all flags — out of scope
        col("l_returnflag") === "R", version = 1L, commitTs = 2000L)
    }
    assert(e.getMessage.contains("outside the sync scope"))
  }

  test("CDC shows the in-scope churn and nothing else") {
    val dir = freshDir("fsync4")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    val scope = col("l_returnflag") === "R"
    TableWriter.mergeFullSync(spark, dir,
      li.filter(scope && col("l_orderkey") % 35 === 0), scope,
      version = 1L, commitTs = 2000L)
    // changes AFTER v0 only — no snapshot backfill
    val cdc = CdcReader.cdc(spark, dir, startingVersion = 0L,
      includeHistory = false)
    val flags = cdc.select(col("l_returnflag")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(flags == Set("R"), s"CDC must churn only the scope, got $flags")
    // removes (old R rows) and adds (source rows) both present
    val ops = cdc.select(col("op")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(ops == Set("c", "r"), s"expected add+remove churn, got $ops")
  }
}
