package graft.sources

import graft.SparkTestSession
import graft.txn._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Storage-partitioned join: two graft tables hive-partitioned on the
  * same key join with ZERO shuffle under
  * `spark.sql.sources.v2.bucketing.enabled` — the scan reports
  * KeyGroupedPartitioning(identity(partition cols)) and every input
  * partition carries its typed key, so Spark co-locates same-key files
  * instead of exchanging both sides. The guard rails (non-bit-comparable
  * types, pruned-away partition columns, partition evolution) must fall
  * back to unknown partitioning, never to a wrong plan.
  */
class SpjSpec extends AnyFunSuite {
  import SparkTestSession._

  private def writeSide(prefix: String, rows: Seq[(Long, Long, String)])
      : String = {
    val path = Files.createTempDirectory(prefix).toString + "/t"
    import spark.implicits._
    val df = rows.toDF("k", "v", "tag")
    TableWriter.write(spark, df.repartition(col("k")), path,
      partitionBy = Seq("k"), version = 0L, commitTs = 1000L)
    path
  }

  private def load(path: String): DataFrame =
    spark.read.format("graft").option("tablePath", path).load()

  private def withSpj[T](enabled: Boolean)(body: => T): T = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, enabled.toString))
    val prevBroadcast =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      prevBroadcast match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  private val left = (0L until 200L).map(i => (i % 8, i, s"L$i"))
  private val right = (0L until 120L).map(i => (i % 8, i * 10, s"R$i"))

  test("scan reports KeyGroupedPartitioning over the partition column") {
    val path = writeSide("spjrep", left)
    val resolved = GraftBatch.resolve(Map("tablePath" -> path))
    val scan = new GraftBatchScanBuilder(resolved).build()
      .asInstanceOf[GraftBatchScan]
    scan.outputPartitioning() match {
      case k: KeyGroupedPartitioning =>
        assert(k.keys.length == 1)
        assert(k.numPartitions == 8, s"expected 8 keys, got ${k.numPartitions}")
      case other => fail(s"expected KeyGroupedPartitioning, got $other")
    }
    val parts = scan.planInputPartitions()
    assert(parts.forall(
      _.asInstanceOf[GraftBatchPartition].keyValues.isDefined))
  }

  test("same-key join runs with zero shuffle and identical results") {
    val lp = writeSide("spjl", left)
    val rp = writeSide("spjr", right)
    def joined: DataFrame =
      load(lp).as("a").join(load(rp).as("b"), Seq("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("a.v")).as("sv"))
    val expected = withSpj(enabled = false) {
      joined.orderBy(col("k")).collect().toSeq
    }
    withSpj(enabled = true) {
      val df = joined
      val shuffles = df.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      // the final single-key groupBy reuses the key-grouped distribution
      // too, so the whole plan is exchange-free
      assert(shuffles.isEmpty,
        s"expected a shuffle-free storage-partitioned plan, got:\n" +
          df.queryExecution.executedPlan)
      assert(df.orderBy(col("k")).collect().toSeq == expected)
    }
  }

  test("mismatched partition-value sets still join correctly") {
    // right side misses keys 5..7 entirely; pushPartValues must align
    val lp = writeSide("spjml", left)
    val rp = writeSide("spjmr", right.filter(_._1 < 5))
    def joined: DataFrame =
      load(lp).join(load(rp), Seq("k"), "left")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val expected = withSpj(enabled = false) {
      joined.orderBy(col("k")).collect().toSeq
    }
    withSpj(enabled = true) {
      assert(joined.orderBy(col("k")).collect().toSeq == expected)
    }
  }

  test("row-level rewrite scans and pruned partition columns opt out") {
    val path = writeSide("spjopt", left)
    val resolved = GraftBatch.resolve(Map("tablePath" -> path))
    // partition column pruned away -> no key grouping to report
    val b = new GraftBatchScanBuilder(resolved)
    b.pruneColumns(org.apache.spark.sql.types.StructType(
      resolved.schema.fields.filter(_.name != "k")))
    b.build().asInstanceOf[GraftBatchScan].outputPartitioning() match {
      case _: UnknownPartitioning => ()
      case other => fail(s"expected UnknownPartitioning, got $other")
    }
  }

  test("partition evolution keeps the scan at unknown partitioning") {
    // v0 unpartitioned, v1 partitioned by k: v0 files carry no stored
    // value for k, so key grouping is impossible and must not be claimed
    val path = Files.createTempDirectory("spjevo").toString + "/t"
    import spark.implicits._
    TableWriter.write(spark,
      Seq((99L, 1L, "old")).toDF("k", "v", "tag"), path,
      version = 0L, commitTs = 1000L)
    TableWriter.setPartitioning(spark, path, Seq("k"),
      version = 1L, commitTs = 1500L)
    TableWriter.append(spark,
      Seq((1L, 2L, "new")).toDF("k", "v", "tag"), path,
      commitTs = 2000L)
    val resolved = GraftBatch.resolve(Map("tablePath" -> path))
    val scan = new GraftBatchScanBuilder(resolved).build()
      .asInstanceOf[GraftBatchScan]
    scan.outputPartitioning() match {
      case _: UnknownPartitioning => ()
      case other => fail(s"expected UnknownPartitioning, got $other")
    }
    assert(load(path).count() == 2)
  }
}
