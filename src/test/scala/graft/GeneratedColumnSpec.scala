package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Generated columns (Metadata.generatedColumns): the write path computes
  * omitted values from the declared expression and rejects disagreeing
  * writer-supplied values, so a generated PARTITION column is
  * trustworthy for pruning — the Delta generated-columns contract.
  */
class GeneratedColumnSpec extends AnyFunSuite {
  import SparkTestSession._

  private val GenExpr = "date_format(o_orderdate, 'yyyy-MM')"

  private def build(): String = {
    val table = Files.createTempDirectory("gencol").toString + "/t"
    val orders = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 5 === 0)
    TableWriter.write(spark, orders, table, partitionBy = Seq("o_month"),
      version = 0L, commitTs = 1000L,
      generated = Map("o_month" -> GenExpr))
    table
  }

  test("omitted generated column is computed and partitions the table") {
    val table = build()
    val df = SnapshotReader.read(spark, table)
    assert(df.columns.contains("o_month"))
    assert(df.filter(!(col("o_month") <=> expr(GenExpr))).count() == 0,
      "stored values must equal the generating expression")
    // the partitionValues of every file carry the generated column
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    assert(log.snapshotLatest().files.forall(_.partitionValues.contains("o_month")))
    // definition recorded and carried in metadata
    assert(log.snapshotLatest().metadata.get.generatedColumns ==
      Map("o_month" -> GenExpr))
  }

  test("appends compute when omitted, validate when supplied") {
    val table = build()
    val more = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 5 =!= 0)
    // omitted: computed (definition carried forward, not re-passed)
    TableWriter.write(spark, more, table, partitionBy = Seq("o_month"),
      version = 1L, commitTs = 2000L)
    val df = SnapshotReader.read(spark, table)
    val want = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 5 === 0 ||
        (col("o_orderkey") % 7 === 0 && col("o_orderkey") % 5 =!= 0)).count()
    assert(df.count() == want)
    assert(df.filter(!(col("o_month") <=> expr(GenExpr))).count() == 0)
    // supplied and CORRECT: accepted
    val withCol = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 11 === 0 && col("o_orderkey") % 5 =!= 0
        && col("o_orderkey") % 7 =!= 0)
      .withColumn("o_month", expr(GenExpr))
    TableWriter.write(spark, withCol, table, partitionBy = Seq("o_month"),
      version = 2L, commitTs = 3000L)
    // supplied and WRONG: rejected before any file is staged
    val lying = withCol.withColumn("o_month", lit("1900-01"))
    val ex = intercept[IllegalArgumentException] {
      TableWriter.write(spark, lying, table, partitionBy = Seq("o_month"),
        version = 3L, commitTs = 4000L)
    }
    assert(ex.getMessage.contains("generated column violation"))
  }

  test("generated partition column prunes at the file level") {
    val table = build()
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val files = log.snapshotLatest().files
    val hit = files.filter(_.partitionValues("o_month") == "1996-03")
    assert(hit.nonEmpty && hit.size < files.size,
      s"expected a selective partition: ${hit.size}/${files.size}")
    // and the filtered read matches a recompute from the source table
    val got = SnapshotReader.read(spark, table)
      .filter(col("o_month") === "1996-03").count()
    val want = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 5 === 0 &&
        date_format(col("o_orderdate"), "yyyy-MM") === "1996-03").count()
    assert(got == want)
  }

  test("rename refuses generated columns and their inputs") {
    val table = build()
    intercept[IllegalArgumentException] {
      TableWriter.renameColumn(spark, table, "o_orderdate", "odate", 1L, 2000L)
    }
    // o_month is also a partition column; the generated-column guard is
    // what a non-partitioned generated column would still hit
    intercept[IllegalArgumentException] {
      TableWriter.renameColumn(spark, table, "o_month", "m", 1L, 2000L)
    }
    // unrelated columns still rename fine on a generated-column table
    TableWriter.renameColumn(spark, table, "o_totalprice", "price", 1L, 2000L)
    assert(SnapshotReader.read(spark, table).columns.contains("price"))
  }
}
