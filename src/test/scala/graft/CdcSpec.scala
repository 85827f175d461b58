package graft

import graft.functions.Murmur3X86
import graft.queries.Cdc
import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CDC semantics over the engine's own table format:
  * full-copy + incremental replay, time travel, resume equivalence
  * (FIXTURES.md C; reference intent per SURVEY.md §2.8).
  */
class CdcSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val table = Cdc.buildFixture(spark, sf)
  private lazy val li = Tables.load(spark, sf, "lineitem")

  private lazy val nAll = li.count()
  private lazy val nR = li.filter(col("l_returnflag") === "R").count()
  private lazy val n97 = li.filter(col("l_orderkey") % 97 === 0).count()
  private lazy val n89 = li.filter(col("l_orderkey") % 89 === 0).count()

  test("routed sink: every file's rows hash to the file's route slot") {
    val dir = java.nio.file.Files.createTempDirectory("routed_sink").toString + "/t"
    val n = 8
    TableWriter.writeRouted(spark, li.limit(2000), dir,
      partitionBy = Seq("l_returnflag"), routeBuckets = n, commitTs = 1000L)
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    val files = log.snapshotLatest().files
    assert(files.nonEmpty)
    // file ↔ slot alignment: the route dir of each file equals
    // murmur3(canonical pv) % n of the file's own partition values
    files.foreach { f =>
      val route = f.partitionValues("route").toInt
      val pv = CdcReader.partitionValueString(f.partitionValues - "route")
      assert(route == Murmur3X86.partitionIndex(pv, n),
        s"file ${f.path}: route=$route pv=$pv")
    }
    // row-level: reading any single route dir yields only rows whose
    // partition value hashes to that slot — and all rows are preserved
    val back = spark.read.option("basePath", dir)
      .parquet(files.map(f => s"$dir/${f.path}").distinct: _*)
    assert(back.count() == 2000)
    val slots = back.select(col("route"),
        Murmur3X86.routeIndex(concat_ws("=", lit("l_returnflag"),
          col("l_returnflag").cast("string")), n).as("want"))
      .filter(col("route") =!= col("want")).count()
    assert(slots == 0)
  }

  test("routed sink: null partition values route by the canonical hive form") {
    val dir = java.nio.file.Files.createTempDirectory("routed_null").toString + "/t"
    val n = 4
    val src = li.limit(300).withColumn("pcol",
      when(col("l_orderkey") % 3 === 0, lit(null))
        .otherwise(col("l_returnflag")))
    TableWriter.writeRouted(spark, src, dir,
      partitionBy = Seq("pcol"), routeBuckets = n, commitTs = 1000L)
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    val files = log.snapshotLatest().files
    // null rows exist and land under the hive default-partition dir
    assert(files.exists(_.partitionValues("pcol") == "__HIVE_DEFAULT_PARTITION__"))
    // the file ↔ slot contract must hold for null partitions too: the
    // route dir equals murmur3 of the SAME canonical string the txn log
    // records (concat_ws would drop the null part and break this)
    files.foreach { f =>
      val route = f.partitionValues("route").toInt
      val pv = CdcReader.partitionValueString(f.partitionValues - "route")
      assert(route == Murmur3X86.partitionIndex(pv, n),
        s"file ${f.path}: route=$route pv=$pv")
    }
  }

  test("cdc replay op counts match the commit contents") {
    val m = CdcReader.cdc(spark, table).groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("c") == nAll + n97 + n89)
    assert(m("r") == nR)
    assert(m("m") == 1L)
  }

  test("incremental-only read sees just v1+v2 events") {
    val m = CdcReader.cdc(spark, table, startingVersion = 0L, includeHistory = false)
      .groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("c") == n97 + n89)
    assert(m("r") == nR)
  }

  test("time travel reproduces every version's row count") {
    def n(v: Long) = SnapshotReader.read(spark, table, versionAsOf = Some(v)).count()
    assert(n(0) == nAll)
    assert(n(1) == nAll - nR + n97)
    assert(n(2) == nAll - nR + n97 + n89)
  }

  test("timestampAsOf resolves through commit timestamps") {
    def n(ts: Long) = SnapshotReader.read(spark, table, timestampAsOf = Some(ts)).count()
    assert(n(1000L) == nAll)
    assert(n(2500L) == nAll - nR + n97)
    assert(n(9999L) == nAll - nR + n97 + n89)
    intercept[IllegalArgumentException] {
      SnapshotReader.read(spark, table, timestampAsOf = Some(1L))
    }
  }

  test("versionAsOf and timestampAsOf are mutually exclusive") {
    intercept[IllegalArgumentException] {
      SnapshotReader.read(spark, table,
        versionAsOf = Some(0L), timestampAsOf = Some(1000L))
    }
  }

  test("two-phase poll resume equals uninterrupted replay") {
    // phase 1: full copy at v0
    val start = CdcOffset(CdcOffset.FullCopy, 0L, -1, -1)
    val (b1, o1) = CdcReader.pollIncremental(spark, table, start)
    // phase 2 resumes from the persisted offset (json round-trip = restart)
    val resumed = CdcOffset.fromJson(o1.json)
    val (b2, o2) = CdcReader.pollIncremental(spark, table, resumed)
    val total = b1.get.count() + b2.get.count()
    val uninterrupted = CdcReader.cdc(spark, table).count()
    assert(total == uninterrupted)
    // stream is drained: a third poll yields nothing
    val (b3, o3) = CdcReader.pollIncremental(spark, table, o2)
    assert(b3.isEmpty && o3 == o2)
  }

  test("snapshot read prunes partitions (plan-level check)") {
    val plan = SnapshotReader.read(spark, table, versionAsOf = Some(0L))
      .filter(col("l_returnflag") === "N")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("l_returnflag=A"))
  }
}
