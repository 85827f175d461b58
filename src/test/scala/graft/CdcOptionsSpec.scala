package graft

import graft.queries.Cdc
import graft.txn.{CdcOptions, Metadata, TableWriter, TxnLog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcOptionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("tablePath is required and non-empty") {
    intercept[IllegalArgumentException] { CdcOptions.parse(Map.empty) }
    intercept[IllegalArgumentException] { CdcOptions.parse(Map("tablePath" -> " ")) }
  }

  test("startingVersion XOR startingTimestamp") {
    intercept[IllegalArgumentException] {
      CdcOptions.parse(Map("tablePath" -> "t",
        "startingVersion" -> "1",
        "startingTimestamp" -> "2021-09-29T20:17:46.384Z"))
    }
  }

  test("defaults to latest; parses number, 'latest', ISO-8601") {
    // "latest" / no start option → both start fields empty, so
    // resolveStartVersion falls through to the log's newest version
    val dflt = CdcOptions.parse(Map("tablePath" -> "t"))
    assert(dflt.startingVersion.isEmpty && dflt.startingTimestamp.isEmpty)
    val lat = CdcOptions.parse(
      Map("tablePath" -> "t", "startingVersion" -> "latest"))
    assert(lat.startingVersion.isEmpty && lat.startingTimestamp.isEmpty)
    assert(CdcOptions.parse(Map("tablePath" -> "t", "startingVersion" -> "3"))
      .startingVersion.contains(3L))
    assert(CdcOptions.parse(Map("tablePath" -> "t",
      "startingTimestamp" -> "2021-09-29T20:17:46.384Z"))
      .startingTimestamp.contains(1632946666384L))
    intercept[IllegalArgumentException] {
      CdcOptions.parse(Map("tablePath" -> "t", "startingVersion" -> "abc"))
    }
    intercept[IllegalArgumentException] {
      CdcOptions.parse(Map("tablePath" -> "t", "startingTimestamp" -> "yesterday"))
    }
  }

  test("option-driven cdc read resolves version/timestamp starts") {
    val table = Cdc.buildFixture(spark, sf)
    // startingVersion=0 + history = everything
    val full = CdcOptions.cdc(spark,
      Map("tablePath" -> table, "startingVersion" -> "0", "includeHistory" -> "true"))
    // startingTimestamp resolving to v1 (commit ts 2000) — incremental from v1
    val fromV1 = CdcOptions.cdc(spark,
      Map("tablePath" -> table, "startingTimestamp" -> "1970-01-01T00:00:02Z"))
    val v2Only = fromV1.filter(col("commit_version") === 2)
    assert(full.count() > fromV1.count())
    assert(fromV1.count() > 0 && v2Only.count() > 0)
    // nonexistent startingVersion errors (strict, unlike the reference's
    // silent fallback-to-latest)
    intercept[IllegalArgumentException] {
      CdcOptions.cdc(spark, Map("tablePath" -> table, "startingVersion" -> "99"))
    }
  }

  test("metadata-only commit range yields op='m' rows, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("meta_only").toString
    val li = Tables.load(spark, sf, "lineitem").limit(50)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    // v1 is a pure schema-change commit: Metadata + CommitInfo, no files
    val newSchema = li.withColumn("extra_flag", lit(1)).schema
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    log.commit(1L, Seq(Metadata(newSchema.json, Seq.empty),
      graft.txn.CommitInfo("SET_SCHEMA", 2000L)))
    // incremental read of (0, latest] sees only the 'm' control row
    val df = graft.txn.CdcReader.cdc(spark, dir, startingVersion = 0L,
      includeHistory = false)
    assert(df.count() == 1)
    val m = df.collect()(0)
    assert(m.getAs[String]("op") == "m")
    assert(m.getAs[Long]("commit_version") == 1L)
    assert(df.columns.contains("extra_flag"))
  }

  test("schema-change commit surfaces op='m' and the new schema (T7)") {
    val dir = java.nio.file.Files.createTempDirectory("schema_change").toString
    val li = Tables.load(spark, sf, "lineitem").limit(100)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    // v1: add a column (schema change) + new data carrying it
    val li2 = li.withColumn("extra_flag", lit(1)).limit(10)
    TableWriter.write(spark, li2, dir, version = 1L, commitTs = 2000L,
      extraActions = Seq(Metadata(li2.schema.json, Seq.empty)))
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    assert(log.snapshotLatest().metadata.get.schemaJson.contains("extra_flag"))
    val cdc = graft.txn.CdcReader.cdc(spark, dir)
    assert(cdc.filter(col("op") === "m").count() == 1)
    assert(cdc.columns.contains("extra_flag"))
    // rows from v0 files have null extra_flag; v1 rows carry it
    assert(cdc.filter(col("op") === "c" && col("commit_version") === 1 &&
      col("extra_flag").isNotNull).count() == 10)
  }
}
