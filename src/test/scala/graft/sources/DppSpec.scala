package graft.sources

import graft.{SparkTestSession, Tables}
import graft.txn._
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Dynamic partition pruning for the DSv2 scan: partition columns are
  * advertised for runtime filtering, an IN filter prunes the file list
  * before any file opens, and the unsafe cases (temporal encodings,
  * partition evolution, NULL partitions) stay conservative or provably
  * sound.
  */
class DppSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshTable(bands: Long = 4L): String = {
    val path = Files.createTempDirectory("dpp").toString + "/t"
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, i % bands)).toDF("id", "band")
    TableWriter.write(spark, df.repartition(col("band")), path,
      partitionBy = Seq("band"), version = 0L, commitTs = 1000L)
    path
  }

  private def scanOf(path: String): GraftBatchScan = {
    val resolved = GraftBatch.resolve(Map("tablePath" -> path))
    new GraftBatchScanBuilder(resolved).build()
      .asInstanceOf[GraftBatchScan]
  }

  private def inPredicate(col: String, values: Seq[Any],
      dt: org.apache.spark.sql.types.DataType): Predicate =
    new Predicate("IN",
      (Expressions.column(col) +:
        values.map(v => Expressions.literal(v)
          : org.apache.spark.sql.connector.expressions.Expression)).toArray)

  test("an IN runtime filter on the partition column prunes the file list") {
    val scan = scanOf(freshTable())
    val before = scan.kept.size
    assert(before >= 4, s"expected >=4 partition files, got $before")
    scan.filter(Array(inPredicate("band",
      Seq(1L, 3L), LongType)))
    val keptBands = scan.kept.flatMap(_.partitionValues.get("band")).toSet
    assert(keptBands == Set("1", "3"),
      s"expected only bands 1,3 to survive, got $keptBands")
  }

  test("advertises prunable partition columns, not temporal ones") {
    val scan = scanOf(freshTable())
    assert(scan.filterAttributes().map(_.fieldNames().head)
      .contains("band"))
    // a timestamp-partitioned table must NOT advertise the column: the
    // runtime literal (epoch micros) and the hive string can't compare
    val path = Files.createTempDirectory("dpp_ts").toString + "/t"
    import spark.implicits._
    val df = (0L until 10L)
      .map(i => (i, new java.sql.Timestamp(86400000L * i)))
      .toDF("id", "day")
    TableWriter.write(spark, df, path, partitionBy = Seq("day"),
      version = 0L, commitTs = 1000L)
    val advertised = scanOf(path).filterAttributes()
      .map(_.fieldNames().head).toSet
    assert(!advertised.contains("day"),
      s"temporal partition column must not advertise, got $advertised")
    // the stats-covered LONG data column still advertises (file pruning)
    assert(advertised.contains("id"))
  }

  test("unknown values and nulls: files of other generations survive") {
    val path = freshTable()
    // simulate partition evolution: add a file whose partitionValues
    // lack `band` (older generation where band was a data column)
    val log = new TxnLog(path, spark.sessionState.newHadoopConf())
    import spark.implicits._
    val staging = Files.createTempDirectory("dpp_old").toString
    Seq((9999L, 99L)).toDF("id", "band").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, new org.apache.hadoop.fs.Path(path, "oldgen.parquet"))
    log.commit(1L, Seq(
      AddFile("oldgen.parquet", Map.empty, 1L, 2000L, dataChange = true),
      CommitInfo("WRITE", 2000L)))
    val scan = scanOf(path)
    scan.filter(Array(inPredicate("band", Seq(0L), LongType)))
    val keptPaths = scan.kept.map(_.path)
    assert(keptPaths.contains("oldgen.parquet"),
      "a file from a pre-evolution generation must never be pruned")
    assert(scan.kept.count(_.partitionValues.nonEmpty) >= 1)
    assert(scan.kept.flatMap(_.partitionValues.get("band")).toSet == Set("0"))
  }

  test("end-to-end: a selective dim join plans dynamic pruning, same result") {
    val path = freshTable()
    import spark.implicits._
    val dimDir = Files.createTempDirectory("dpp_dim").toString + "/dim"
    (0L until 4L).map(b => (b, s"name_$b")).toDF("band", "name")
      .write.mode("overwrite").parquet(dimDir)
    def run(dpp: Boolean): (Array[(Long, Long)], String) = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
        dpp.toString)
      try {
        val fact = spark.read.format("graft").option("tablePath", path).load()
        val dim = spark.read.parquet(dimDir).filter(col("name") === "name_2")
        val joined = fact.join(dim, Seq("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        (joined.collect().map(r => (r.getLong(0), r.getLong(1))).sorted, plan)
      } finally spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    }
    val (withDpp, plan) = run(dpp = true)
    val (without, _) = run(dpp = false)
    assert(withDpp.sameElements(without))
    assert(withDpp.toSeq == Seq((2L, 100L)))
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery in:\n$plan")
  }

  test("dynamic FILE pruning: IN on a clustered data column prunes by stats") {
    val path = Files.createTempDirectory("dfp").toString + "/t"
    import spark.implicits._
    // 4 range-clustered files: ids 0-99, 100-199, 200-299, 300-399
    val df = (0L until 400L).map(i => (i, i % 7)).toDF("id", "v")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    TableWriter.write(spark, df, path, version = 0L, commitTs = 1000L)
    val scan = scanOf(path)
    assert(scan.kept.size == 4)
    assert(scan.filterAttributes().map(_.fieldNames().head).toSet
      .contains("id"), "a stats-covered data column must advertise")
    scan.filter(Array(inPredicate("id", Seq(42L, 250L), LongType)))
    assert(scan.kept.size == 2,
      s"expected 2 files containing ids 42 and 250, kept ${scan.kept.size}")
    // e2e: a selective dim join on the clustered key — identical results
    val dimDir = Files.createTempDirectory("dfp_dim").toString + "/d"
    Seq((42L, "x"), (250L, "y")).toDF("id", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.format("graft").option("tablePath", path).load()
    val out = fact.join(spark.read.parquet(dimDir), Seq("id"))
      .select(col("id"), col("v"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((42L, 0L, "x"), (250L, 5L, "y")))
  }
}
