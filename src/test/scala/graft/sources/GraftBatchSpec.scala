package graft.sources

import graft.SparkTestSession
import graft.txn._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{sources => f}
import org.scalatest.funsuite.AnyFunSuite

/** Batch DSv2 source: result parity with SnapshotReader, file pruning
  * from pushed filters, genuine column pruning, limit pushdown, DV
  * application, time travel, and post-pushdown scan statistics.
  */
class GraftBatchSpec extends AnyFunSuite {
  import SparkTestSession._

  // 6 range-partitioned files on l_orderkey (disjoint footer ranges)
  private lazy val skipDir = graft.queries.Maintenance.skippingFixture(spark, sf)
  // hive-partitioned by l_returnflag, then compacted at v2
  private lazy val optDir = graft.queries.Maintenance.compactionFixture(spark, sf)
  // two generations of deletion vectors, no file rewritten
  private lazy val dvDir = graft.queries.Maintenance.dvFixture(spark, sf)

  private def readGraft(dir: String): DataFrame =
    spark.read.format("graft").option("tablePath", dir).load()

  // column order differs legitimately: the DSv2 source keeps the DECLARED
  // schema order while SnapshotReader's hive inference appends partition
  // columns — align by name before comparing values
  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(col)
    df.select(cols.toSeq: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  // AQE hides the physical scan inside AdaptiveSparkPlanExec until
  // execution; the optimized LOGICAL plan always exposes the pushed scan
  private def logicalScanOf(df: DataFrame): Scan =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => r.scan
    }.getOrElse(fail("no DSv2 scan in plan"))

  private def scanOf(df: DataFrame): GraftBatchScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[GraftBatchScan]
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("short name 'graft' resolves via DataSourceRegister") {
    assert(readGraft(skipDir).count() ==
      SnapshotReader.read(spark, skipDir).count())
  }

  test("full read matches SnapshotReader row-for-row (partitioned table)") {
    assert(sortedRows(readGraft(optDir)) ==
      sortedRows(SnapshotReader.read(spark, optDir)))
  }

  test("pushed range filter prunes the planned file set") {
    val total = new TxnLog(skipDir,
      spark.sessionState.newHadoopConf()).snapshotLatest().files.size
    assert(total == 6)
    val df = readGraft(skipDir).filter(col("l_orderkey").between(100L, 400L))
    val scan = scanOf(df)
    assert(scan.kept.size < total,
      s"expected pruning below $total files, planned ${scan.kept.size}")
    // and the answer is still exact (residual applies)
    val expect = SnapshotReader.read(spark, skipDir)
      .filter(col("l_orderkey").between(100L, 400L))
    assert(sortedRows(df) == sortedRows(expect))
  }

  test("an unprunable filter keeps all files but stays correct") {
    val df = readGraft(skipDir).filter(col("l_linestatus").contains("O"))
    assert(scanOf(df).kept.size == 6)
    val expect = SnapshotReader.read(spark, skipDir)
      .filter(col("l_linestatus").contains("O"))
    assert(df.count() == expect.count())
  }

  test("column pruning reaches the scan's read schema") {
    val df = readGraft(skipDir).select(col("l_orderkey"))
    assert(scanOf(df).required.fieldNames.toSeq == Seq("l_orderkey"))
    assert(df.distinct().count() ==
      SnapshotReader.read(spark, skipDir).select("l_orderkey")
        .distinct().count())
  }

  test("partition columns materialize from the log, not the files") {
    val flags = readGraft(optDir).select("l_returnflag").distinct()
      .collect().map(_.getString(0)).sorted
    assert(flags.sameElements(Array("A", "N", "R")))
  }

  test("limit pushes into the partition readers") {
    val df = readGraft(skipDir).limit(3)
    assert(df.count() == 3)
    assert(scanOf(df).limit == 3)
  }

  test("deletion vectors apply on the default read path") {
    val viaGraft = readGraft(dvDir)
    val viaSnapshot = SnapshotReader.read(spark, dvDir)
    assert(sortedRows(viaGraft) == sortedRows(viaSnapshot))
    // and rows really died: both DV generations are in force
    val li = graft.Tables.load(spark, sf, "lineitem")
    val expect = li.filter(col("l_orderkey") % 7 === 0 &&
      col("l_suppkey") % 5 =!= 0 && col("l_partkey") % 3 =!= 0).count()
    assert(viaGraft.count() == expect)
  }

  test("versionAsOf time travel binds the scan to the old snapshot") {
    val v0 = spark.read.format("graft")
      .option("tablePath", optDir).option("versionAsOf", "0").load()
    assert(sortedRows(v0) ==
      sortedRows(SnapshotReader.read(spark, optDir, versionAsOf = Some(0L))))
  }

  test("versionAsOf and timestampAsOf are mutually exclusive") {
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("tablePath", optDir)
        .option("versionAsOf", "0").option("timestampAsOf", "1000")
        .load().count()
    }
  }

  test("scan statistics are post-pushdown: a filter shrinks sizeInBytes") {
    val all = readGraft(skipDir)
    val filtered = readGraft(skipDir)
      .filter(col("l_orderkey").between(100L, 400L))
    val sAll = scanOf(all).estimateStatistics()
    val sFiltered = scanOf(filtered).estimateStatistics()
    assert(sFiltered.sizeInBytes().getAsLong < sAll.sizeInBytes().getAsLong)
    // row counts come from footer stats and match reality
    assert(sAll.numRows().getAsLong ==
      SnapshotReader.read(spark, skipDir).count())
  }

  test("direct builder API: pushFilters reports pushed, residual is total") {
    val builder = new GraftBatchScanBuilder(
      GraftBatch.resolve(Map("tablePath" -> skipDir)))
    val filters: Array[f.Filter] = Array(
      f.GreaterThanOrEqual("l_orderkey", 100L),
      f.LessThanOrEqual("l_orderkey", 400L),
      f.StringContains("l_linestatus", "O"))
    val residual = builder.pushFilters(filters)
    assert(residual.length == 3) // everything re-checked post-scan
    assert(builder.pushedFilters().length == 2) // only range shapes prune
    val scan = builder.build().asInstanceOf[GraftBatchScan]
    assert(scan.kept.size < 6)
  }

  test("IN filter prunes via its min/max envelope") {
    val builder = new GraftBatchScanBuilder(
      GraftBatch.resolve(Map("tablePath" -> skipDir)))
    builder.pushFilters(Array[f.Filter](f.In("l_orderkey",
      Array[Any](100L, 150L, 200L))))
    val scan = builder.build().asInstanceOf[GraftBatchScan]
    assert(scan.kept.size < 6)
  }

  test("count/min/max push down to a stats-only scan (no file opens)") {
    val df = readGraft(skipDir)
      .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("mn"),
        max(col("l_orderkey")).as("mx"), max(col("l_linestatus")).as("ms"))
    val scan = logicalScanOf(df)
    assert(scan.isInstanceOf[GraftBatchAggScan],
      s"expected stats-only agg scan, got ${scan.getClass.getSimpleName}")
    val r = df.head()
    val base = SnapshotReader.read(spark, skipDir)
    assert(r.getLong(0) == base.count())
    val exp = base.agg(min(col("l_orderkey")), max(col("l_orderkey")),
      max(col("l_linestatus"))).head()
    assert(r.getLong(1) == exp.getLong(0))
    assert(r.getLong(2) == exp.getLong(1))
    assert(r.getString(3) == exp.getString(2))
  }

  test("aggregate pushdown refuses on a DV table and stays correct") {
    val df = readGraft(dvDir).agg(count(lit(1)).as("n"))
    val scan = logicalScanOf(df)
    assert(!scan.isInstanceOf[GraftBatchAggScan],
      "file stats cannot see DV-killed rows — push must refuse")
    assert(df.head().getLong(0) == SnapshotReader.read(spark, dvDir).count())
  }

  test("aggregate pushdown refuses under a residual filter") {
    val df = readGraft(skipDir)
      .filter(col("l_orderkey") > 100L).agg(count(lit(1)).as("n"))
    val scan = logicalScanOf(df)
    assert(!scan.isInstanceOf[GraftBatchAggScan])
    assert(df.head().getLong(0) ==
      SnapshotReader.read(spark, skipDir).filter(col("l_orderkey") > 100L).count())
  }

  test("schema evolution: pre-evolution files surface new columns as null") {
    val dir = graft.queries.Maintenance.evolutionFixture(spark, sf)
    assert(sortedRows(readGraft(dir)) ==
      sortedRows(SnapshotReader.read(spark, dir)))
  }

  test("a large file SPLITS into byte ranges; DVs and row ids stay " +
      "file-absolute across splits") {
    import spark.implicits._
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val confKey = "spark.sql.files.maxPartitionBytes"
    val prevMax = spark.conf.get(confKey)
    val dir = java.nio.file.Files.createTempDirectory("split_t").toString + "/t"
    try {
      // many small row groups in ONE file, then a split budget far
      // below the file size — the multi-GB-converted-file shape in
      // miniature
      hc.setInt("parquet.block.size", 16 * 1024)
      TableWriter.write(spark,
        (0L until 50000L).map(i => (i, i * 3)).toDF("id", "v").coalesce(1),
        dir, version = 0L, commitTs = 1000L)
      hc.unset("parquet.block.size")
      DeletionVectors.deleteWhere(spark, dir, col("id") % 7 === 0,
        version = 1L, commitTs = 2000L)
      def ridSet(): Set[(Long, Long)] = readGraft(dir)
        .select(col("id"), col(TxnLog.RowIdColumn).as("rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val whole = ridSet()
      val wholeParts = readGraft(dir).rdd.getNumPartitions
      spark.conf.set(confKey, (64 * 1024).toString)
      val split = readGraft(dir)
      assert(split.rdd.getNumPartitions > math.max(wholeParts, 4),
        s"expected many range splits, got ${split.rdd.getNumPartitions}")
      // DV-filtered content AND base+position row ids identical:
      // positions are file-absolute, not split-relative
      assert(ridSet() == whole)
      assert(split.count() == 50000L - 50000L / 7 - 1)
    } finally {
      spark.conf.set(confKey, prevMax)
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
  }
}
