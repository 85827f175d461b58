package graft.sources

import graft.{SparkTestSession, Tables}
import graft.txn.{CommitInfo, RemoveFile, TableWriter, TxnLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generated-column partition pruning: a range on the BASE column
  * derives a formatted range on the generated PARTITION column, so
  * month directories prune without the query ever naming them. The
  * fixtures STRIP the base column's min/max stats first — making the
  * derivation the ONLY pruning signal, as on converted foreign files.
  */
class GeneratedPruningSpec extends AnyFunSuite {
  import SparkTestSession._

  private def stripStats(dir: String, column: String): Unit = {
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    val snap = log.snapshotLatest()
    val stripped = snap.files.map(f => f.copy(dataChange = false,
      stats = f.stats.map(st => st.copy(
        minValues = st.minValues - column,
        maxValues = st.maxValues - column,
        nullCounts = st.nullCounts - column))))
    log.commit(snap.version + 1,
      snap.files.map(f => RemoveFile(f.path, 9000L, f.partitionValues,
        dataChange = false)) ++ stripped :+ CommitInfo("STRIP", 9000L))
  }

  private def read(dir: String): DataFrame =
    spark.read.format("graft").option("tablePath", dir).load()

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("a base-column range prunes month partitions (date_format)") {
    val dir = java.nio.file.Files.createTempDirectory("gp1").toString + "/t"
    val orders = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 5 === 0)
    TableWriter.write(spark, orders, dir, partitionBy = Seq("o_month"),
      version = 0L, commitTs = 1000L,
      generated = Map("o_month" -> "date_format(o_orderdate, 'yyyy-MM')"))
    stripStats(dir, "o_orderdate")
    val total = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.size
    val q = read(dir).filter(
      col("o_orderdate") >= lit("1996-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-06-01").cast("timestamp"))
    // months 1996-03..1996-06 survive (f(hi) is inclusive at month
    // granularity); everything else is pruned by the DERIVED range
    val keptRe = "files=(\\d+)/(\\d+)".r
    val m = keptRe.findFirstMatchIn(planOf(q)).get
    assert(m.group(2).toInt == total)
    assert(m.group(1).toInt <= 4,
      s"derived month range must prune, got ${m.group(0)}")
    assert(q.count() == orders.filter(
      col("o_orderdate") >= lit("1996-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-06-01").cast("timestamp")).count())
  }

  test("CAST AS DATE generation prunes day partitions; one-sided ranges") {
    val dir = java.nio.file.Files.createTempDirectory("gp2").toString + "/t"
    // one month of orders → ~30 day partitions
    val orders = Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
    assert(orders.count() > 0)
    TableWriter.write(spark, orders, dir, partitionBy = Seq("o_day"),
      version = 0L, commitTs = 1000L,
      generated = Map("o_day" -> "CAST(o_orderdate AS DATE)"))
    stripStats(dir, "o_orderdate")
    val total = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.size
    val q = read(dir).filter(
      col("o_orderdate") >= lit("1996-01-25").cast("timestamp"))
    val keptRe = "files=(\\d+)/(\\d+)".r
    val m = keptRe.findFirstMatchIn(planOf(q)).get
    assert(m.group(2).toInt == total && m.group(1).toInt < total,
      s"one-sided derived range must prune, got ${m.group(0)}")
    assert(q.count() == orders.filter(
      col("o_orderdate") >= lit("1996-01-25").cast("timestamp")).count())
  }

  test("a DATE base column derives in epoch-DAYS, not micros") {
    val dir = java.nio.file.Files.createTempDirectory("gp4").toString + "/t"
    val orders = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 5 === 1)
      .withColumn("o_date", col("o_orderdate").cast("date"))
      .drop("o_orderdate")
    TableWriter.write(spark, orders, dir, partitionBy = Seq("o_month"),
      version = 0L, commitTs = 1000L,
      generated = Map("o_month" -> "date_format(o_date, 'yyyy-MM')"))
    stripStats(dir, "o_date")
    val total = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.size
    // DATE bounds push as Int epoch-days; interpreting them as micros
    // would derive '1970-01' and wrongly prune EVERYTHING
    val q = read(dir).filter(
      col("o_date") >= lit("1996-03-01").cast("date") &&
        col("o_date") < lit("1996-06-01").cast("date"))
    val want = orders.filter(
      col("o_date") >= lit("1996-03-01").cast("date") &&
        col("o_date") < lit("1996-06-01").cast("date")).count()
    assert(want > 0)
    assert(q.count() == want,
      "a mis-derived range must never drop matching rows")
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(planOf(q)).get
    assert(m.group(2).toInt == total && m.group(1).toInt <= 4,
      s"date-based derivation must prune months, got ${m.group(0)}")
  }

  test("unrecognized generation expressions derive nothing (sound)") {
    val dir = java.nio.file.Files.createTempDirectory("gp3").toString + "/t"
    val orders = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 7 === 0)
    TableWriter.write(spark, orders, dir, partitionBy = Seq("o_bucket"),
      version = 0L, commitTs = 1000L,
      generated = Map("o_bucket" -> "CAST(o_orderkey % 4 AS STRING)"))
    stripStats(dir, "o_orderdate")
    val total = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.size
    val q = read(dir).filter(
      col("o_orderdate") >= lit("1996-03-01").cast("timestamp"))
    assert(planOf(q).contains(s"files=$total/$total"),
      "a non-monotone generation must keep every file")
    assert(q.count() == orders.filter(
      col("o_orderdate") >= lit("1996-03-01").cast("timestamp")).count())
  }
}
