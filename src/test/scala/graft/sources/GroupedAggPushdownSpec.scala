package graft.sources

import graft.SparkTestSession
import graft.txn._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GROUP BY partition-column aggregate pushdown: per-partition
  * COUNT/MIN/MAX answered from the log's file stats — zero data files
  * open — with every unsound case (DVs, non-partition grouping,
  * missing stats on a referenced column) refusing the push and falling
  * back to the plain scan.
  */
class GroupedAggPushdownSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshTable(nulls: Boolean = false): String = {
    val path = java.nio.file.Files.createTempDirectory("gap").toString + "/t"
    val rows = (0L until 120L).map(i =>
      (i, if (nulls && i % 3 == 0) null else s"b${i % 4}", i * 7 % 31))
    TableWriter.write(spark, rows.toDF("id", "band", "v")
      .repartition(col("band")), path,
      partitionBy = Seq("band"), version = 0L, commitTs = 1000L)
    path
  }

  private def load(p: String): DataFrame =
    spark.read.format("graft").option("tablePath", p).load()

  private def pushedToStats(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("GraftBatchAgg")

  test("per-partition count/min/max answer from stats alone") {
    val p = freshTable()
    val df = load(p).groupBy(col("band"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
        max(col("id")).as("hi"))
    assert(pushedToStats(df), s"expected stats-only plan:\n" +
      df.queryExecution.executedPlan)
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val plain = (0L until 120L).groupBy(i => s"b${i % 4}")
      .map { case (b, is) => (b, is.size.toLong, is.min, is.max) }.toSet
    assert(got == plain, s"got $got")
  }

  test("a NULL partition groups as NULL, not as the hive sentinel") {
    val p = freshTable(nulls = true)
    val df = load(p).groupBy(col("band")).agg(count(lit(1)).as("n"))
    assert(pushedToStats(df))
    val got = df.collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got(None) == 40L, s"null group wrong: $got")
  }

  test("deletion vectors refuse the push; results stay correct") {
    val p = freshTable()
    DeletionVectors.deleteWhere(spark, p, col("id") % 2 === 0,
      version = 1L, commitTs = 2000L)
    val df = load(p).groupBy(col("band")).agg(count(lit(1)).as("n"))
    assert(!pushedToStats(df), "DV table must not answer from stats")
    assert(df.agg(sum(col("n"))).head().getLong(0) == 60L)
  }

  test("grouping by a non-partition column refuses the push") {
    val p = freshTable()
    val df = load(p).groupBy(col("v")).agg(count(lit(1)).as("n"))
    assert(!pushedToStats(df))
    assert(df.agg(sum(col("n"))).head().getLong(0) == 120L)
  }

  test("the ungrouped total-row path still pushes") {
    val p = freshTable()
    val df = load(p).agg(count(lit(1)).as("n"), max(col("id")).as("hi"))
    assert(pushedToStats(df))
    assert(df.head() == org.apache.spark.sql.Row(120L, 119L))
  }
}
