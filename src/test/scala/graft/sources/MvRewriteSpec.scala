package graft.sources

import graft.SparkTestSession
import graft.Tables
import graft.operators.MaterializedAgg
import graft.txn.{DeletionVectors, TableWriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** MV auto-rewrite: an aggregate over the base table is transparently
  * served from a fresh registered MV — identical values, MV-scanning
  * plan — and every unsound case (stale MV, pushed filter, non-subset
  * grouping, non-distributive aggregate, time travel) keeps the base
  * plan. Freshness is re-checked per planning pass from the logs.
  */
class MvRewriteSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    Files.createTempDirectory(tag).toString + "/t"

  private val keys = Seq("l_returnflag", "l_linestatus")
  private val sums = Seq("l_extendedprice")
  private val spec = MaterializedAgg.Spec(keys, sums)

  /** base table + fresh MV + registration; caller must unregister. */
  private def setUp(tag: String): (String, String) = {
    val base = freshDir(tag)
    val mv = freshDir(tag + "_mv")
    val li = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
    TableWriter.write(spark, li, base, version = 0L, commitTs = 1000L)
    MaterializedAgg.create(spark, base, mv, spec)
    MvRewrite.register(spark, base, mv, keys, sums)
    (base, mv)
  }

  private def baseRead(path: String): DataFrame =
    spark.read.format("graft").option("tablePath", path).load()

  private def scansOf(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan.description()
    }

  private def grouped(df: DataFrame): DataFrame =
    df.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(15,2)")).as("s"))

  test("an eligible aggregate is served from the MV, bit-identical") {
    val (base, mv) = setUp("mvr1")
    try {
      val q = grouped(baseRead(base))
      val scans = scansOf(q)
      assert(scans.exists(_.contains(mv)), s"expected MV scan, got $scans")
      assert(!scans.exists(_.contains(base)), "base must not be scanned")
      val expected = grouped(Tables.load(spark, sf, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)).collect().toSet
      assert(q.collect().toSet == expected)
    } finally MvRewrite.unregister(base)
  }

  test("rollup to a key subset rewrites (distributive re-aggregation)") {
    val (base, mv) = setUp("mvr2")
    try {
      val q = baseRead(base).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(15,2)")).as("s"))
      assert(scansOf(q).exists(_.contains(mv)))
      val expected = Tables.load(spark, sf, "lineitem")
        .filter(col("l_orderkey") % 7 === 0).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(15,2)")).as("s"))
        .collect().toSet
      assert(q.collect().toSet == expected)
    } finally MvRewrite.unregister(base)
  }

  test("a stale MV is never served; refresh re-enables the rewrite") {
    val (base, mv) = setUp("mvr3")
    try {
      TableWriter.append(spark,
        Tables.load(spark, sf, "lineitem")
          .filter(col("l_orderkey") % 11 === 3),
        base, commitTs = 2000L)
      val q1 = grouped(baseRead(base))
      assert(scansOf(q1).exists(_.contains(base)),
        "stale MV must leave the base plan intact")
      // values stay correct either way
      val expected = grouped(baseRead(base)).collect().toSet
      MaterializedAgg.refresh(spark, base, mv, spec)
      val q2 = grouped(baseRead(base))
      assert(scansOf(q2).exists(_.contains(mv)),
        "refreshed MV must serve again")
      assert(q2.collect().toSet == expected)
    } finally MvRewrite.unregister(base)
  }

  test("the MV tracks deletes through refresh (DV delta) and still serves") {
    val (base, mv) = setUp("mvr4")
    try {
      DeletionVectors.deleteWhere(spark, base, col("l_suppkey") % 3 === 0,
        version = 1L, commitTs = 2000L)
      MaterializedAgg.refresh(spark, base, mv, spec)
      val q = grouped(baseRead(base))
      assert(scansOf(q).exists(_.contains(mv)))
      val expected = grouped(Tables.load(spark, sf, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)
        .filter(!(col("l_suppkey") % 3 === 0))).collect().toSet
      assert(q.collect().toSet == expected)
    } finally MvRewrite.unregister(base)
  }

  test("ineligible shapes keep the base plan") {
    val (base, mv) = setUp("mvr5")
    try {
      // pushed filter: the MV does not maintain the filtered answer
      val f = grouped(baseRead(base).filter(col("l_extendedprice") > 100.0))
      assert(!scansOf(f).exists(_.contains(mv)))
      // grouping outside the MV keys
      val g = baseRead(base).groupBy(col("l_shipdate"))
        .agg(count(lit(1)).as("cnt"))
      assert(!scansOf(g).exists(_.contains(mv)))
      // non-distributive aggregate
      val a = baseRead(base).groupBy(col("l_returnflag"))
        .agg(avg(col("l_extendedprice")).as("a"))
      assert(!scansOf(a).exists(_.contains(mv)))
      // time travel binds an older version than the MV watermark
      TableWriter.append(spark,
        Tables.load(spark, sf, "lineitem")
          .filter(col("l_orderkey") % 11 === 5),
        base, commitTs = 3000L)
      MaterializedAgg.refresh(spark, base, mv, spec)
      val tt = grouped(spark.read.format("graft")
        .option("tablePath", base).option("versionAsOf", "0").load())
      assert(!scansOf(tt).exists(_.contains(mv)),
        "a time-travel scan must never be served from the newer MV")
      assert(scansOf(grouped(baseRead(base))).exists(_.contains(mv)))
    } finally MvRewrite.unregister(base)
  }

  test("the global (ungrouped) aggregate rewrites with sum+count") {
    val (base, mv) = setUp("mvr6")
    try {
      val q = baseRead(base)
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(15,2)")).as("s"))
      assert(scansOf(q).exists(_.contains(mv)))
      val r = q.head()
      val want = Tables.load(spark, sf, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(15,2)")).as("s")).head()
      assert(r == want)
    } finally MvRewrite.unregister(base)
  }
}
