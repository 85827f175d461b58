package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Smoke + semantic checks for every registry query at sf0.001. The full
  * value-level verification is the DuckDB oracle (tools/check_oracle.py /
  * the driver's t2 gate); here we assert shape and a few pinned facts.
  */
class QueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("registry names are unique and every oracle key exists") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.fn(spark, sf)
      assert(df.count() > 0, s"${q.name} returned no rows at sf0.001")
    }
  }

  test("q1 aggregates to the six flag/status groups") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    // sf0.001 lineitem has 6000 rows, ~54% pass the shipdate cutoff
    assert(totalCount > 3000 && totalCount <= 6000)
  }

  test("q28 approx distinct within 5% of exact") {
    val rows = SparkEntry.queries("q28_approx_distinct")(spark, sf).collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_orders").toDouble
      val approx = r.getAs[Long]("approx_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("q69 approx percentiles track the exact q37 values") {
    val exact = SparkEntry.queries("q37_percentile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q69_approx_percentile")(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (m, p90) = exact(r.getString(0))
      // l_quantity spans ~[1,50]; the 1000-bucket sketch should land
      // within a couple of quantity units of the exact interpolation
      assert(math.abs(r.getDouble(1) - m) <= 2.0, s"median ${r.getDouble(1)} vs $m")
      assert(math.abs(r.getDouble(2) - p90) <= 2.0, s"p90 ${r.getDouble(2)} vs $p90")
    }
  }

  test("q16 set ops satisfy |union| = |A| + |B| - |intersect|") {
    val m = SparkEntry.queries("q16_setops")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = Tables.load(spark, sf, "customer")
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      .select("c_custkey").distinct().count()
    val b = Tables.load(spark, sf, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "O")
      .select("o_custkey").distinct().count()
    assert(m("union") == a + b - m("intersect"))
    assert(m("except") == a - m("intersect"))
  }

  test("q109 share_ppm equals exact BigInt floor division") {
    import org.apache.spark.sql.functions.{col, sum}
    val rows = SparkEntry.queries("q109_revenue_share")(spark, sf).collect()
    assert(rows.nonEmpty)
    // Independent exact reference: per-nation cents via lossless decimal,
    // shares via arbitrary-precision BigInt floor division.
    val cents = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(15, 2))).as("rev"))
      .collect()
      .map(r => r.getString(0) -> BigInt(
        r.getDecimal(1).movePointRight(2).toBigIntegerExact))
      .toMap
    val tot = cents.values.sum
    rows.foreach { r =>
      val exact = (cents(r.getString(0)) * 1000000) / tot
      assert(BigInt(r.getAs[Long]("share_ppm")) == exact,
        s"${r.getString(0)}: ${r.getAs[Long]("share_ppm")} vs $exact")
    }
  }
}
