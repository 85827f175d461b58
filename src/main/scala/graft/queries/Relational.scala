package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory (SURVEY.md §2.3–2.7) over the TPC-H-ish
  * TESTDATA tables. Every query here is SQL-expressible, so each carries a
  * DuckDB oracle with IDENTICAL column aliases.
  *
  * Float-determinism convention: aggregation over double money columns is
  * order-dependent in the last ulp, so any SUM over a non-integral double is
  * computed in exact decimal (money = DECIMAL(15,2), rate = DECIMAL(4,2);
  * both lossless for the 2-decimal synthetic data) and cast to double only
  * at the end. Exact decimal → double conversion is deterministic and
  * identical across Spark and DuckDB, making the driver's hash compare
  * stable. Integral doubles (l_quantity) sum exactly in binary and need no
  * cast. Every window/order-by carries a unique tiebreak so ranking is
  * deterministic.
  */
object Relational {

  private def money(c: Column): Column = c.cast(DecimalType(15, 2))
  private def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  private val oneD: Column = lit(BigDecimal(1)).cast(DecimalType(3, 2))

  // DuckDB-side mirrors of the helpers above.
  private val M = "DECIMAL(15,2)"
  private val R = "DECIMAL(4,2)"
  private val ONE = "CAST(1 AS DECIMAL(3,2))"

  def defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Aggregation (§2.4)
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS $M)) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS $M) * ($ONE - CAST(l_discount AS $R))) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS $M) * ($ONE - CAST(l_discount AS $R)) * ($ONE + CAST(l_tax AS $R))) AS DOUBLE) AS sum_charge,
         |  SUM(l_quantity) / COUNT(*) AS avg_qty,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(money(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(money(col("l_extendedprice")) * (oneD - rate(col("l_discount"))) *
            (oneD + rate(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Filter + projection pushdown + top-n (§2.2 P1/P2, §2.6 O3)
    QueryDef.sqlBacked(
      "q2_filter_topn",
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
          col("l_quantity") >= 45)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // ------------------------------------------------------------------
    // Joins (§2.3)
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q3_shipping_priority",
      s"""SELECT l_orderkey,
         |  CAST(SUM(CAST(l_extendedprice AS $M) * ($ONE - CAST(l_discount AS $R))) AS DOUBLE) AS revenue,
         |  o_orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(money(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Left-semi join (EXISTS)
    QueryDef.sqlBacked(
      "q4_order_priority",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem")
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // 6-way star join (broadcast dims) — TPC-H Q5 shape
    QueryDef.sqlBacked(
      "q5_local_supplier_volume",
      s"""SELECT n_name,
         |  CAST(SUM(CAST(l_extendedprice AS $M) * ($ONE - CAST(l_discount AS $R))) AS DOUBLE) AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem")
      val su = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(money(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Selective single-row aggregate (pushdown showcase) — TPC-H Q6 shape
    QueryDef.sqlBacked(
      "q6_forecast_revenue",
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS $M) * CAST(l_discount AS $R)) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(money(col("l_extendedprice")) * rate(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // Left-anti join (NOT EXISTS)
    QueryDef.sqlBacked(
      "q7_customers_without_orders",
      """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      val n = Tables.load(s, dir, "nation")
      c.join(o, col("o_custkey") === col("c_custkey"), "left_anti")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_name"))
    },

    // Left-outer join preserving unmatched rows
    QueryDef.sqlBacked(
      "q8_customer_order_counts",
      """SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },

    // Full-outer join of two aggregates
    QueryDef.sqlBacked(
      "q9_nation_balances",
      s"""SELECT COALESCE(s.nk, c.nk) AS nationkey, s.supp_bal, c.cust_bal
         |FROM (SELECT s_nationkey AS nk,
         |        CAST(SUM(CAST(s_acctbal AS $M)) AS DOUBLE) AS supp_bal
         |      FROM supplier GROUP BY s_nationkey) s
         |FULL JOIN (SELECT c_nationkey AS nk,
         |        CAST(SUM(CAST(c_acctbal AS $M)) AS DOUBLE) AS cust_bal
         |      FROM customer GROUP BY c_nationkey) c
         |ON s.nk = c.nk
         |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val sb = Tables.load(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("nk"))
        .agg(sum(money(col("s_acctbal"))).cast("double").as("supp_bal"))
      val cb = Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk"))
        .agg(sum(money(col("c_acctbal"))).cast("double").as("cust_bal"))
      sb.as("s").join(cb.as("c"), col("s.nk") === col("c.nk"), "full_outer")
        .select(coalesce(col("s.nk"), col("c.nk")).as("nationkey"),
          col("supp_bal"), col("cust_bal"))
        .orderBy(col("nationkey"))
    },

    // Right-outer join preserving unmatched right-side rows (J3): parts
    // never ordered keep a zero count.
    QueryDef.sqlBacked(
      "q29_right_outer",
      """SELECT p_partkey, CAST(COUNT(l_orderkey) AS BIGINT) AS n_lines
        |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"), "right_outer")
        .groupBy(col("p_partkey"))
        .agg(count(col("l_orderkey")).as("n_lines"))
        .orderBy(col("p_partkey"))
    },

    // Join + agg + top-k — TPC-H Q10 shape
    QueryDef.sqlBacked(
      "q10_returned_items",
      s"""SELECT c_custkey, c_name,
         |  CAST(SUM(CAST(l_extendedprice AS $M) * ($ONE - CAST(l_discount AS $R))) AS DOUBLE) AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(money(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ------------------------------------------------------------------
    // Window functions (§2.5)
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q11_topk_per_supplier",
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
        |        ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.load(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_suppkey"), col("rn"))
    },

    QueryDef.sqlBacked(
      "q12_running_total",
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(SUM(CAST(o_totalprice AS $M)) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
         |FROM orders
         |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(money(col("o_totalprice"))).over(w).cast("double").as("run_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    QueryDef.sqlBacked(
      "q13_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice) OVER w AS prev_price,
        |  LEAD(o_totalprice) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    QueryDef.sqlBacked(
      "q14_rank_ntile",
      """SELECT o_orderkey,
        |  RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rk,
        |  DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS drk,
        |  NTILE(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val byPrice = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice").desc)
      val total = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          rank().over(byPrice).as("rk"),
          dense_rank().over(byPrice).as("drk"),
          ntile(4).over(total).as("quartile"))
        .orderBy(col("o_orderkey"))
    },

    // ------------------------------------------------------------------
    // Distinct / set ops (§2.7)
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q15_distinct_counts",
      """SELECT c_mktsegment,
        |  CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },

    QueryDef.sqlBacked(
      "q16_setops",
      """SELECT 'intersect' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'except' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'union' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY op""".stripMargin) { (s, dir) =>
      val b = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val inter = b.intersect(o).agg(count(lit(1)).as("n"))
        .select(lit("intersect").as("op"), col("n"))
      val exc = b.except(o).agg(count(lit(1)).as("n"))
        .select(lit("except").as("op"), col("n"))
      val uni = b.union(o).distinct().agg(count(lit(1)).as("n"))
        .select(lit("union").as("op"), col("n"))
      inter.union(exc).union(uni).orderBy(col("op"))
    },

    // ------------------------------------------------------------------
    // Rollup / cube (§2.4)
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q17_rollup_docs",
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY ROLLUP(lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
    },

    QueryDef.sqlBacked(
      "q18_cube_orders",
      s"""SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(o_totalprice AS $M)) AS DOUBLE) AS total
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ------------------------------------------------------------------
    // Scalar functions (§2.7)
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q19_string_funcs",
      """SELECT n_nationkey,
        |  UPPER(n_name) AS uname,
        |  LOWER(r_name) AS lrname,
        |  SUBSTR(n_name, 1, 6) AS prefix,
        |  CONCAT_WS('/', n_name, r_name) AS path,
        |  CAST(LENGTH(n_name) AS BIGINT) AS name_len,
        |  REPLACE(n_name, 'NATION', 'N') AS short_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"),
          upper(col("n_name")).as("uname"),
          lower(col("r_name")).as("lrname"),
          substring(col("n_name"), 1, 6).as("prefix"),
          concat_ws("/", col("n_name"), col("r_name")).as("path"),
          length(col("n_name")).cast("long").as("name_len"),
          regexp_replace(col("n_name"), "NATION", "N").as("short_name"))
        .orderBy(col("n_nationkey"))
    },

    QueryDef.sqlBacked(
      "q20_date_funcs",
      s"""SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
         |  CAST(MONTH(o_orderdate) AS INT) AS m,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(o_totalprice AS $M)) AS DOUBLE) AS total
         |FROM orders
         |GROUP BY 1, 2
         |ORDER BY y, m""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("int").as("y"),
          month(col("o_orderdate")).cast("int").as("m"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("y"), col("m"))
    },

    QueryDef.sqlBacked(
      "q21_case_buckets",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },

    // ------------------------------------------------------------------
    // Theta / range / as-of joins (§2.3)
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q22_theta_join",
      """SELECT a.n_regionkey AS regionkey, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        |GROUP BY a.n_regionkey
        |ORDER BY regionkey""".stripMargin) { (s, dir) =>
      val a = Tables.load(s, dir, "nation").as("a")
      val b = Tables.load(s, dir, "nation").as("b")
      a.join(b, col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_nationkey") < col("b.n_nationkey"))
        .groupBy(col("a.n_regionkey").as("regionkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("regionkey"))
    },

    QueryDef.sqlBacked(
      "q23_range_join",
      s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_shipped,
         |  CAST(SUM(CAST(l_extendedprice AS $M)) AS DOUBLE) AS value_shipped
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  AND l_shipdate >= o_orderdate
         |  AND l_shipdate < o_orderdate + INTERVAL 60 DAY
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAY"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_shipped"),
          sum(money(col("l_extendedprice"))).cast("double").as("value_shipped"))
        .orderBy(col("o_orderpriority"))
    },

    // As-of join: latest order (by o_orderdate <= event ts) per event,
    // matching events.user_id = orders.o_custkey. Composed from an
    // equi-join + window (SURVEY §2.3) — no O(n²).
    QueryDef.sqlBacked(
      "q24_asof_join",
      """SELECT event_id, o_orderkey AS asof_orderkey
        |FROM (
        |  SELECT e.event_id, o.o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      // Sort-merge-shaped as-of: tag both sides, union, and carry the
      // running "latest order so far" down a per-user (ts, kind) sort.
      // The intermediate is |events| + |orders| rows and ONE shuffle on
      // the user key — never events × orders-per-user like the naive
      // join+rank composition (PlanSpec asserts the plan has no join).
      // kind 0 (orders) sorts before kind 1 (events) at equal ts, making
      // the o_orderdate <= ts bound inclusive; same-date orders resolve
      // to the max o_orderkey because last() takes the sort's latest.
      val o = Tables.load(s, dir, "orders").select(
        col("o_custkey").as("u"), col("o_orderdate").cast("timestamp").as("t"),
        lit(0).as("kind"), col("o_orderkey").as("ok"),
        lit(null).cast("long").as("event_id"))
      val e = Tables.load(s, dir, "events").select(
        col("user_id").as("u"), col("ts").as("t"),
        lit(1).as("kind"), lit(null).cast("long").as("ok"),
        col("event_id"))
      val w = Window.partitionBy(col("u"))
        .orderBy(col("t"), col("kind"), col("ok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.unionAll(e)
        .withColumn("asof_orderkey", last(col("ok"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1 && col("asof_orderkey").isNotNull)
        .select(col("event_id"), col("asof_orderkey"))
        .orderBy(col("event_id"))
    },

    // AS-OF join WITH TOLERANCE (q24's production variant — pandas
    // merge_asof's `tolerance`): each purchase takes its single most
    // recent preceding click by the same user, but the match only
    // COUNTS within 30 minutes — older matches classify as expired,
    // users with no preceding click as unmatched. Same union-tag +
    // one-shuffle running-state shape as q24 (never purchases ×
    // clicks-per-user); the tolerance compares exact MICROSECONDS
    // (unix_micros ↔ epoch_us) so a 1800.4 s gap cannot classify
    // differently across engines the way floor-second arithmetic would.
    QueryDef.sqlBacked(
      "q324_asof_tolerance",
      """WITH p AS (SELECT event_id AS pid, user_id, ts AS pt
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS cid, user_id, ts AS ct
        |      FROM events WHERE event_type = 'click'),
        |best AS (SELECT pid, cid, ct, pt,
        |    ROW_NUMBER() OVER (PARTITION BY pid
        |      ORDER BY ct DESC, cid DESC) AS rn
        |  FROM p JOIN c USING (user_id) WHERE ct <= pt),
        |m AS (SELECT pid, cid,
        |    epoch_us(pt) - epoch_us(ct) <= 1800000000 AS ok
        |  FROM best WHERE rn = 1)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM m WHERE ok) AS BIGINT) AS n_matched,
        |  CAST((SELECT COUNT(*) FROM m WHERE NOT ok) AS BIGINT)
        |    AS n_expired,
        |  CAST((SELECT COUNT(*) FROM p) - (SELECT COUNT(*) FROM m)
        |    AS BIGINT) AS n_no_click,
        |  CAST((SELECT COALESCE(SUM(cid), 0) FROM m WHERE ok) AS BIGINT)
        |    AS matched_click_sum""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val c = ev.filter(col("event_type") === "click").select(
        col("user_id").as("u"), col("ts").as("t"), lit(0).as("kind"),
        col("event_id").as("cid"), lit(null).cast("long").as("pid"))
      val p = ev.filter(col("event_type") === "purchase").select(
        col("user_id").as("u"), col("ts").as("t"), lit(1).as("kind"),
        lit(null).cast("long").as("cid"), col("event_id").as("pid"))
      val w = Window.partitionBy(col("u"))
        .orderBy(col("t"), col("kind"), col("cid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.unionAll(p)
        .withColumn("acid", last(col("cid"), ignoreNulls = true).over(w))
        .withColumn("act", last(when(col("kind") === 0, col("t")),
          ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("pid"), col("acid"),
          (unix_micros(col("t")) - unix_micros(col("act")) <=
            1800000000L).as("ok"))
        .agg(
          count(when(col("acid").isNotNull && col("ok"), 1)).cast("long")
            .as("n_matched"),
          count(when(col("acid").isNotNull && !col("ok"), 1)).cast("long")
            .as("n_expired"),
          count(when(col("acid").isNull, 1)).cast("long").as("n_no_click"),
          coalesce(sum(when(col("acid").isNotNull && col("ok"),
            col("acid"))), lit(0L)).cast("long").as("matched_click_sum"))
    },

    // Global top-k with deterministic tiebreak (§2.6 O3)
    QueryDef.sqlBacked(
      "q25_global_topk",
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"))
        .limit(20)
    },

    // Custom typed aggregate (§2.4, Aggregator[IN,BUF,OUT]) — quantity-
    // weighted average price per return flag, exact-decimal buffer.
    QueryDef.sqlBacked(
      "q27_weighted_avg",
      s"""SELECT l_returnflag,
         |  CAST(SUM(CAST(l_extendedprice AS $M) * CAST(l_quantity AS $M)) AS DOUBLE)
         |    / CAST(SUM(CAST(l_quantity AS $M)) AS DOUBLE) AS wavg_price
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val wavg = udaf(graft.operators.TypedAggs.WeightedAvg)
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
        .orderBy(col("l_returnflag"))
    },

    // HyperLogLog approximate distinct (§2.4) — Spark-only (DuckDB's HLL
    // implementation differs); QueriesSpec bounds the relative error.
    // Driver-hash gate for the HLL path (q28 stays `no_oracle`; this
    // twin is oracle-checkable): the exact distinct count is the
    // oracle-recomputed anchor, and the boolean asserts the rsd=0.02
    // sketch landed within 5% of it — an HLL regression flips the row.
    QueryDef.sqlBacked(
      "q200_hll_error_gate",
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx_orders") - col("exact_orders")) * 100 <=
            col("exact_orders") * 5).as("within_5pct"))
        .orderBy(col("l_returnflag"))
    },

    // Driver-hash gate for approx_percentile (q69's sketch twin): the
    // approximate median's EXACT rank must land within ±1% of the true
    // median position — the rank-error contract of the quantile sketch,
    // checked against an oracle that recomputes only the anchors.
    QueryDef.sqlBacked(
      "q201_percentile_rank_gate",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  TRUE AS rank_within_1pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val med = li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, 0.5)").as("m"))
      li.join(broadcast(med), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("l_extendedprice") <= col("m"), 1)).as("r"))
        .select(col("l_returnflag"), col("n_rows"),
          (col("r") * 100 >= col("n_rows") * 49 &&
            col("r") * 100 <= col("n_rows") * 51).as("rank_within_1pct"))
        .orderBy(col("l_returnflag"))
    },

    // MERGEABLE quantile sketch gate (KLL, the 100 TB quantile path the
    // built-in approx_percentile can't offer: per-partition sketches
    // persist and MERGE — the incremental-ANALYZE shape at query
    // level): one pass builds a sketch per (partition, flag), merges
    // run on a |flags|×|partitions| frame, and the EXACT ranks of the
    // merged sketch's p10/p50/p90 must land within ±2% of their
    // targets. PROBABILISTIC GATE, deliberately: DataSketches KLL has
    // no seeding API (compaction uses its own RNG), so the booleans
    // are nondeterministic in principle — k = 800 puts the 99%-
    // confidence rank error at ~0.22%, nine-sigma-class margin under
    // the 2% gate, so a red here means a BUG (merge/serialization
    // corruption), not sketch luck. Oracle recomputes only the exact
    // anchors.
    QueryDef.sqlBacked(
      "q364_kll_quantile_gate",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  TRUE AS p10_within_2pct, TRUE AS p50_within_2pct,
        |  TRUE AS p90_within_2pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      val K = 800
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      val sk = li.as[(String, Double)]
        .mapPartitions(it =>
          graft.operators.KllQuantile.sketchPartition(it, K))
        .groupByKey(_._1)
        .reduceGroups((a, b) =>
          (a._1, graft.operators.KllQuantile.merge(a._2, b._2, K)))
        .map { case (g, (_, bytes)) =>
          (g, graft.operators.KllQuantile.quantile(bytes, 0.1),
            graft.operators.KllQuantile.quantile(bytes, 0.5),
            graft.operators.KllQuantile.quantile(bytes, 0.9))
        }.toDF("l_returnflag", "q10", "q50", "q90")
      li.toDF("l_returnflag", "v")
        .join(broadcast(sk), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("v") <= col("q10"), 1)).as("r10"),
          count(when(col("v") <= col("q50"), 1)).as("r50"),
          count(when(col("v") <= col("q90"), 1)).as("r90"))
        .select(col("l_returnflag"), col("n_rows"),
          (abs(col("r10") * 100 - col("n_rows") * 10) <=
            col("n_rows") * 2).as("p10_within_2pct"),
          (abs(col("r50") * 100 - col("n_rows") * 50) <=
            col("n_rows") * 2).as("p50_within_2pct"),
          (abs(col("r90") * 100 - col("n_rows") * 90) <=
            col("n_rows") * 2).as("p90_within_2pct"))
        .orderBy(col("l_returnflag"))
    },

    QueryDef.sparkOnly("q28_approx_distinct") { (s, dir) =>
      // exact and approx in SEPARATE aggregates: combining countDistinct
      // with approx_count_distinct in one agg triggers the distinct-rewrite
      // Expand, which allocates an HLL partial buffer per (flag, orderkey)
      // group — ~GBs of churn at sf0.1, unbounded at scale. Two scans of a
      // 2-column pruned parquet + a 3-row broadcast join is strictly better.
      val li = Tables.load(s, dir, "lineitem")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      exact.join(approx, "l_returnflag").orderBy(col("l_returnflag"))
    },

    // Grouping sets (§2.4)
    QueryDef.sqlBacked(
      "q26_grouping_sets",
      s"""SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      // DataFrame API has no grouping-sets builder pre-3.4 groupingSets; SQL is the
      // canonical Spark surface for it and still plans a single Expand node.
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    // Pivot (§2.4): order-status columns per priority — Spark's relational
    // pivot; the oracle expresses the identical FILTERed aggregation.
    QueryDef.sqlBacked(
      "q36_pivot",
      s"""SELECT o_orderpriority,
         |  CAST(COALESCE(SUM(CAST(o_totalprice AS $M)) FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS F,
         |  CAST(COALESCE(SUM(CAST(o_totalprice AS $M)) FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) AS O,
         |  CAST(COALESCE(SUM(CAST(o_totalprice AS $M)) FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) AS P
         |FROM orders
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        // explicit value list: no extra distinct-values job, stable columns
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(coalesce(sum(money(col("o_totalprice"))),
          lit(BigDecimal(0)).cast(DecimalType(15, 2))).cast("double"))
        .orderBy(col("o_orderpriority"))
    },

    // Unpivot / melt (§2.4, inverse of q36): wide money columns to long
    // (metric, value) rows — Spark's unpivot API, UNION ALL oracle.
    QueryDef.sqlBacked(
      "q73_unpivot",
      s"""SELECT o_orderpriority, metric,
         |  CAST(SUM(CAST(value AS $M)) AS DOUBLE) AS total
         |FROM (
         |  SELECT o_orderpriority, 'price' AS metric, o_totalprice AS value
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderpriority, 'key_parity' AS metric,
         |    CAST(o_orderkey % 2 AS DOUBLE) AS value
         |  FROM orders)
         |GROUP BY o_orderpriority, metric
         |ORDER BY o_orderpriority, metric""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"),
          col("o_totalprice").as("price"),
          (col("o_orderkey") % 2).cast("double").as("key_parity"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("price"), col("key_parity")), "metric", "value")
        .groupBy(col("o_orderpriority"), col("metric"))
        .agg(sum(money(col("value"))).cast("double").as("total"))
        .orderBy(col("o_orderpriority"), col("metric"))
    },

    // Exact percentiles (§2.4): continuous-interpolation quantiles over an
    // integral double column (interpolation of integers is exact in
    // binary, so both engines agree bit-for-bit).
    QueryDef.sqlBacked(
      "q37_percentile",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    },

    // Approximate percentiles (§2.4 sketch path): the scale twin of
    // q37 — exact percentile needs a per-group sort of all values, the
    // approx sketch is a bounded-size mergeable summary. Spark-only
    // (sketch internals are engine-specific); QueriesSpec bounds its
    // error against the exact q37 values.
    QueryDef.sparkOnly("q69_approx_percentile") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("median_qty"),
          expr("approx_percentile(l_quantity, 0.9, 1000)").as("p90_qty"))
        .orderBy(col("l_returnflag"))
    },

    // Distribution windows (§2.5): percent_rank/cume_dist are rational
    // (rank-1)/(n-1), k/n — IEEE division of the same integers in both
    // engines, so values are deterministic; first/last/nth over an
    // explicit ROWS frame with a unique tiebreak.
    QueryDef.sqlBacked(
      "q38_window_analytics",
      """SELECT o_orderkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS first_ok,
        |  last_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING) AS last_ok,
        |  nth_value(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING) AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val head = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("o_orderkey")).over(head).as("first_ok"),
          last(col("o_orderkey")).over(full).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_ok"))
        .orderBy(col("o_orderkey"))
    },

    // Bucketed co-located join (§2.3 at scale): both sides pre-bucketed on
    // the join key, so the join plans WITHOUT a shuffle (PlanSpec asserts
    // no Exchange feeds it) — the Spark form of the 100 TB "co-partition
    // your fact tables" discipline. The bucketed copies are written once
    // per scale dir and reused.
    QueryDef.sqlBacked(
      "q39_bucketed_join",
      s"""SELECT o.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_li,
         |  CAST(SUM(CAST(l.l_extendedprice AS $M)) AS DOUBLE) AS revenue
         |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |GROUP BY o.o_custkey
         |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val (ot, lt) = Bucketing.ensureBucketed(s, dir)
      s.table(ot).as("o").join(s.table(lt).as("l"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .groupBy(col("o.o_custkey"))
        .agg(count(lit(1)).as("n_li"),
          sum(money(col("l.l_extendedprice"))).cast("double").as("revenue"))
        .orderBy(col("o_custkey"))
    },

    // Salted join (§2.3 at scale): the hot-key mitigation when AQE's
    // skew split isn't enough — the dim side replicates n_salt ways, the
    // fact side salts deterministically, and the exchange partitions on
    // (key, salt) so one hot key spreads over n_salt reducers. The
    // oracle is the PLAIN join: salting must never change results.
    QueryDef.sqlBacked(
      "q58_salted_join",
      s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(l_extendedprice AS $M)) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val nSalt = 8
      val fact = Tables.load(s, dir, "lineitem")
        .withColumn("fsalt",
          pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(nSalt)))
      val dim = Tables.load(s, dir, "orders")
        .withColumn("dsalt", explode(sequence(lit(0), lit(nSalt - 1))))
      fact.join(dim, col("l_orderkey") === col("o_orderkey") &&
          col("fsalt") === col("dsalt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("l_extendedprice"))).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    // Filtered aggregates (§2.4): several differently-predicated
    // aggregates in ONE pass over the fact table — the alternative
    // (one scan per predicate + join) multiplies I/O at scale. Spark's
    // conditional-aggregation form (agg over CASE) compiles to the same
    // single hash-aggregate as SQL's FILTER clause.
    QueryDef.sqlBacked(
      "q92_filtered_agg",
      s"""SELECT l_returnflag,
         |  CAST(COUNT(*) AS BIGINT) AS n_all,
         |  CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
         |  CAST(COUNT(*) FILTER (WHERE l_discount >= 0.05) AS BIGINT) AS n_discounted,
         |  CAST(SUM(CAST(l_extendedprice AS $M)) FILTER (WHERE l_tax >= 0.04) AS DOUBLE) AS taxed_rev,
         |  SUM(l_quantity) FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00') AS recent_qty
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_all"),
          count(when(col("l_quantity") > 25, 1)).as("n_bulk"),
          count(when(col("l_discount") >= 0.05, 1)).as("n_discounted"),
          sum(when(col("l_tax") >= 0.04, money(col("l_extendedprice"))))
            .cast("double").as("taxed_rev"),
          sum(when(col("l_shipdate") >=
              lit("1995-01-01 00:00:00").cast("timestamp"), col("l_quantity")))
            .as("recent_qty"))
        .orderBy(col("l_returnflag"))
    },

    // Correlated subqueries through Catalyst's subquery machinery (run
    // as SQL on temp views, not hand-decorrelated DataFrames): customers
    // above their NATION's average balance who have at least one order.
    // The above-average test cross-multiplies in exact decimal — no
    // decimal division whose scale rules could differ between engines.
    // Catalyst decorrelates both subqueries into aggregate+join; EXISTS
    // becomes a left-semi join.
    QueryDef.sqlBacked(
      "q98_correlated_subquery",
      s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
         |FROM customer c
         |WHERE CAST(c_acctbal AS $M) *
         |    (SELECT COUNT(*) FROM customer c2
         |     WHERE c2.c_nationkey = c.c_nationkey)
         |  > (SELECT SUM(CAST(c_acctbal AS $M)) FROM customer c2
         |     WHERE c2.c_nationkey = c.c_nationkey)
         |  AND EXISTS (SELECT 1 FROM orders o
         |              WHERE o.o_custkey = c.c_custkey)
         |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
           |FROM customer c
           |WHERE CAST(c_acctbal AS $M) *
           |    (SELECT COUNT(*) FROM customer c2
           |     WHERE c2.c_nationkey = c.c_nationkey)
           |  > (SELECT SUM(CAST(c_acctbal AS $M)) FROM customer c2
           |     WHERE c2.c_nationkey = c.c_nationkey)
           |  AND EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey)
           |ORDER BY c_custkey""".stripMargin)
    },

    // Time-RANGE framed window (§2.5): per-customer rolling 90-day order
    // total. The frame is RANGE over epoch-µs (identical tie semantics in
    // both engines: all peers at the same instant join the frame). Scale
    // shape: one shuffle on the partition key; frames never materialize
    // beyond the running window.
    QueryDef.sqlBacked(
      "q99_rolling_range",
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(SUM(CAST(o_totalprice AS $M)) OVER (
         |    PARTITION BY o_custkey ORDER BY EPOCH_US(o_orderdate)
         |    RANGE BETWEEN 7776000000000 PRECEDING AND CURRENT ROW)
         |    AS DOUBLE) AS rolling_90d
         |FROM orders
         |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      // NTZ → session-UTC timestamp is identity here (timeZone=UTC)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
        .rangeBetween(-7776000000000L, Window.currentRow)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(money(col("o_totalprice"))).over(w)
            .cast("double").as("rolling_90d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Date-spine densification: a calendar spine (min..max order day)
    // left-joined against daily counts so zero-order days appear
    // explicitly — the gap-filling shape time-series pipelines need
    // before resampling/forecasting. Scale shape: the spine is tiny
    // (days), the fact side reduces in ONE hash aggregate before the
    // join, so the join is broadcast-sized no matter the fact rows.
    QueryDef.sqlBacked(
      "q101_date_spine",
      """WITH bounds AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
        |                       MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
        |days AS (SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        |         FROM bounds),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
        |          FROM orders GROUP BY 1)
        |SELECT days.d AS d, CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_orders
        |FROM days LEFT JOIN daily ON days.d = daily.d
        |ORDER BY d""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val days = o
        .agg(min(col("o_orderdate").cast("date")).as("lo"),
          max(col("o_orderdate").cast("date")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("d"))
      val daily = o.groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      days.join(daily, Seq("d"), "left")
        .select(col("d"), coalesce(col("n"), lit(0L)).as("n_orders"))
        .orderBy(col("d"))
    },

    // Wide→long melt (UNPIVOT) of a per-flag aggregate — the reshape
    // every metrics exporter needs. Spark's native Dataset.unpivot is a
    // zero-shuffle Expand over the aggregated frame; the oracle spells
    // the same semantics as UNION ALL (engine-portable).
    QueryDef.sqlBacked(
      "q102_unpivot",
      s"""WITH a AS (SELECT l_returnflag, SUM(l_quantity) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS $M)) AS DOUBLE) AS sum_price,
         |  CAST(COUNT(*) AS DOUBLE) AS n_rows FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM a
         |UNION ALL SELECT l_returnflag, 'sum_price' AS metric, sum_price AS val FROM a
         |UNION ALL SELECT l_returnflag, 'n_rows' AS metric, n_rows AS val FROM a
         |ORDER BY l_returnflag, metric""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(money(col("l_extendedprice"))).cast("double").as("sum_price"),
          count(lit(1)).cast("double").as("n_rows"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n_rows")),
          "metric", "val")
        .orderBy(col("l_returnflag"), col("metric"))
    },

    // Fuzzy-match dedup candidates: blocked self-join scored by
    // Levenshtein edit distance (both engines implement classic
    // Wagner-Fischer, so the distances agree exactly). The blocking key
    // is (brand, head-noun token) — record-linkage style: the join never
    // crosses blocks, so the pair space is sum(block²), not corpus².
    // Candidates pass a length-band prefilter (|len diff| ≤ k is implied
    // by dist ≤ k, so it changes nothing semantically), then Spark scores
    // with the BANDED levenshtein(l, r, threshold) — O(n·k) per pair,
    // not O(n²). A skewed block would get the q58 salting treatment.
    QueryDef.sqlBacked(
      "q103_fuzzy_pairs",
      """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  a.p_name AS name1, b.p_name AS name2,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand
        |  AND str_split(a.p_name, ' ')[-1] = str_split(b.p_name, ' ')[-1]
        |  AND a.p_partkey < b.p_partkey
        |WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY k1, k2""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "part").select(col("p_partkey"),
        col("p_brand"), col("p_name"),
        element_at(split(col("p_name"), " "), -1).as("noun"))
      val a = p.select(col("p_partkey").as("k1"), col("p_brand").as("brand1"),
        col("noun").as("noun1"), col("p_name").as("name1"))
      val b = p.select(col("p_partkey").as("k2"), col("p_brand").as("brand2"),
        col("noun").as("noun2"), col("p_name").as("name2"))
      a.join(b, col("brand1") === col("brand2") &&
          col("noun1") === col("noun2") && col("k1") < col("k2"))
        .filter(abs(length(col("name1")) - length(col("name2"))) <= 2)
        .withColumn("dist", levenshtein(col("name1"), col("name2"), 2))
        .filter(col("dist").between(0, 2))
        .select(col("k1"), col("k2"), col("name1"), col("name2"),
          col("dist").cast("int").as("dist"))
        .orderBy(col("k1"), col("k2"))
    },

    // Order-independent table checksum — the anti-entropy primitive for
    // replication verification (pairs with GraftTableSink replication):
    // per-row md5 over a canonical '|'-joined key projection, 8 hex chars
    // → int64, SUMMED per group. Addition commutes, so the digest needs
    // NO sort and no single-point collection — each executor sums its
    // partition and partials merge; two 100 TB replicas compare in one
    // tiny exchange. Engine-portable because md5-of-UTF8 and hex parsing
    // agree everywhere. Canonicalization is explicit FLOOR-then-cast:
    // a bare double→int cast rounds half-away-from-zero in DuckDB but
    // truncates toward zero in Spark, so non-integral values would drift
    // the digest — FLOOR pins identical semantics in both engines.
    QueryDef.sqlBacked(
      "q107_table_checksum",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(('0x' || substring(md5(concat_ws('|',
        |      CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
        |      l_returnflag, l_linestatus,
        |      CAST(CAST(FLOOR(l_quantity) AS BIGINT) AS VARCHAR))), 1, 8))
        |    AS BIGINT)) AS BIGINT) AS digest
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(conv(substring(md5(concat_ws("|",
              col("l_orderkey").cast("string"),
              col("l_linenumber").cast("string"),
              col("l_returnflag"), col("l_linestatus"),
              floor(col("l_quantity")).cast("long").cast("string"))), 1, 8),
            16, 10).cast("long")).as("digest"))
        .orderBy(col("l_returnflag"))
    },

    // Percent-of-total (ratio-to-report): each nation's revenue share in
    // parts-per-million. The share is PURE INTEGER arithmetic, split into
    // TWO floor-division steps so every intermediate stays far below 2⁵³:
    //   q1        = (cents·10³) ⌊÷⌋ tot
    //   share_ppm = q1·10³ + ((cents·10³ mod tot)·10³) ⌊÷⌋ tot
    // Algebraically identical to (cents·10⁶)⌊÷⌋tot, but cents·10³ and
    // rem·10³ < tot·10³ are both exactly representable even in a DOUBLE, so
    // an engine build that routes integer floor-division through float
    // hardware still produces the exact quotient. Magnitude bounds: long
    // arithmetic is exact until total revenue ≈ $92 T (cents·10³ < 2⁶³);
    // double-routed floor-div stays exact until tot·10³ < 2⁵³ ≈ $90 B —
    // both comfortably above the test scales. The windowed total runs over
    // the 25-row post-agg frame (single-partition by design).
    QueryDef.sqlBacked(
      "q109_revenue_share",
      s"""WITH r AS (
         |  SELECT n.n_name,
         |    SUM(CAST(o_totalprice AS $M)) AS rev,
         |    CAST(SUM(CAST(o_totalprice AS $M)) * 100 AS BIGINT) AS cents
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |    JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  GROUP BY n.n_name),
         |t AS (SELECT n_name, rev, cents, SUM(cents) OVER () AS tot FROM r)
         |SELECT n_name, CAST(rev AS DOUBLE) AS revenue,
         |  CAST(((cents * 1000) // tot) * 1000
         |    + (((cents * 1000) % tot) * 1000) // tot AS BIGINT) AS share_ppm
         |FROM t ORDER BY n_name""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(money(col("o_totalprice"))).as("rev"),
          (sum(money(col("o_totalprice"))) * 100).cast("long").as("cents"))
      r.select(col("n_name"), col("rev").cast("double").as("revenue"),
          col("cents"), sum(col("cents")).over(Window.partitionBy()).as("tot"))
        .select(col("n_name"), col("revenue"),
          expr("((cents * 1000L) div tot) * 1000L" +
            " + (((cents * 1000L) % tot) * 1000L) div tot").as("share_ppm"))
        .orderBy(col("n_name"))
    },

    // Pareto / ABC inventory classification: parts ranked by revenue,
    // cumulative-share thresholds at 80% / 95% decided in PURE INTEGER
    // arithmetic (cum·5 ≤ tot·4, cum·20 ≤ tot·19 over exact cents) so no
    // division or float threshold can drift the class boundary between
    // engines. The threshold products are computed in 128-bit integers
    // (DECIMAL(38,0) / HUGEINT) so they cannot wrap however large total
    // revenue grows — BIGINT cum·20 would overflow past ~$4.6e15.
    // (cents DESC, l_partkey) is a total order, so the running sum is
    // deterministic. Scale shape: the fact table meets one hash
    // aggregate; the running sum over the per-PART frame is a
    // DISTRIBUTED range sort + per-partition prefix offsets
    // (operators.DistributedOrder) — even an entity-sized frame never
    // funnels through a single-task ordered window.
    QueryDef.sqlBacked(
      "q110_pareto_class",
      s"""WITH r AS (
         |  SELECT l_partkey,
         |    SUM(CAST(l_extendedprice AS $M)) AS rev,
         |    CAST(SUM(CAST(l_extendedprice AS $M)) * 100 AS BIGINT) AS cents
         |  FROM lineitem GROUP BY l_partkey),
         |c AS (
         |  SELECT l_partkey, rev,
         |    CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum,
         |    CAST(SUM(cents) OVER () AS HUGEINT) AS tot
         |  FROM r)
         |SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
         |            WHEN cum * 20 <= tot * 19 THEN 'B' ELSE 'C' END AS abc_class,
         |  CAST(COUNT(*) AS BIGINT) AS n_parts,
         |  CAST(SUM(rev) AS DOUBLE) AS revenue
         |FROM c GROUP BY abc_class
         |ORDER BY abc_class""".stripMargin) { (s, dir) =>
      val r = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(money(col("l_extendedprice"))).as("rev"),
          (sum(money(col("l_extendedprice"))) * 100).cast("long").as("cents"))
      // running sum via DISTRIBUTED sort + per-partition prefix offsets
      // (DistributedOrder) — the old unpartitioned cumulative window ran
      // the whole per-part frame in ONE task (PlanSpec pins no Window).
      // Long accumulation holds to ~$9.2e16 total revenue; the 128-bit
      // casts below are for the x5/x20 threshold PRODUCTS, as before.
      val big = DecimalType(38, 0)
      graft.operators.DistributedOrder.withPrefixSum(r, "cum0", "tot0",
          col("cents"), col("cents").desc, col("l_partkey"))
        .select(when(col("cum0").cast(big) * 5 <= col("tot0").cast(big) * 4, "A")
          .when(col("cum0").cast(big) * 20 <= col("tot0").cast(big) * 19, "B")
          .otherwise("C").as("abc_class"), col("rev"))
        .groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("abc_class"))
    },

    // Fixed-width histogram: floor(x / width) bucketing — one scan, one
    // hash aggregate, no sort until the final tiny ORDER BY. Double
    // division + FLOOR is IEEE-deterministic, so the bucket ids agree
    // across engines bit-for-bit.
    QueryDef.sqlBacked(
      "q104_histogram",
      """SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("bucket"))
    },

    // EQUI-DEPTH histogram (q104's equal-frequency twin, the optimizer-
    // statistics shape): 8 buckets of equal row count over the FACT
    // table, exact boundaries included. The global rank runs on
    // DistributedOrder (range sort + offsets — never a single-task
    // NTILE window over 100 TB of lineitem); the bucket id is
    // ntileFromRank's exact integer arithmetic, so boundaries cannot
    // drift between engines.
    QueryDef.sqlBacked(
      "q321_equidepth_histogram",
      """WITH t AS (SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |    AS cents, l_orderkey, l_linenumber FROM lineitem),
        |r AS (SELECT cents, CAST(NTILE(8) OVER (ORDER BY cents,
        |    l_orderkey, l_linenumber) AS INT) AS bucket FROM t)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(cents) AS lo, MAX(cents) AS hi
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      val t = Tables.load(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") * 100).cast("long").as("cents"),
          col("l_orderkey"), col("l_linenumber"))
      val n = t.count()
      graft.operators.DistributedOrder
        .withRank(t, "r", col("cents"), col("l_orderkey"),
          col("l_linenumber"))
        .select(graft.operators.DistributedOrder
          .ntileFromRank("r", n, 8).as("bucket"), col("cents"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"),
          max(col("cents")).as("hi"))
        .orderBy(col("bucket"))
    },

    // Join-key SKEW AUDIT — the pre-join diagnostic behind every
    // salting decision (SkewGuard's "should I?"): per candidate join
    // key, its row count and its multiple of the mean in exact ppm
    // (cnt·n_keys·10⁶ DIV total), top-5 heaviest. One count shuffle +
    // a broadcast of the two global scalars + TakeOrdered — the shape
    // that tells you a key owns 30% of a 100 TB fact table BEFORE the
    // join melts an executor.
    QueryDef.sqlBacked(
      "q323_join_skew_audit",
      """WITH c AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY o_custkey),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(cnt) AS BIGINT) AS total FROM c)
        |SELECT o_custkey, cnt, n_keys,
        |  CAST(cnt * n_keys * 1000000 // total AS BIGINT)
        |    AS skew_ppm
        |FROM c, g
        |ORDER BY cnt DESC, o_custkey LIMIT 5""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      val g = c.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"))
      c.crossJoin(broadcast(g))
        .select(col("o_custkey"), col("cnt"), col("n_keys"),
          expr("CAST(cnt * n_keys * 1000000 DIV total AS BIGINT)")
            .as("skew_ppm"))
        .orderBy(col("cnt").desc, col("o_custkey")).limit(5)
    },

    // Data profiling: per-column quality stats (count/nulls/min/max/
    // cents-exact sum/exact distinct) for three measure columns in ONE
    // scan — the metrics all fold into a single aggregate row, then
    // `stack` melts it to one row per column (an Expand, not a rescan
    // per column — the shape that matters when the table is 100 TB and
    // the profile wants 50 columns). DuckDB recomputes per column; the
    // driver's sorted-row compare makes the shapes comparable.
    QueryDef.sqlBacked(
      "q131_table_profile",
      """SELECT 'l_discount' AS column_name,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) - COUNT(l_discount) AS BIGINT) AS n_null,
        |  MIN(l_discount) AS min_v, MAX(l_discount) AS max_v,
        |  CAST(SUM(CAST(FLOOR(l_discount * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(COUNT(DISTINCT l_discount) AS BIGINT) AS n_distinct
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
        |  MIN(l_extendedprice), MAX(l_extendedprice),
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT),
        |  CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
        |  MIN(l_quantity), MAX(l_quantity),
        |  CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT),
        |  CAST(COUNT(DISTINCT l_quantity) AS BIGINT)
        |FROM lineitem
        |ORDER BY column_name""".stripMargin) { (s, dir) =>
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity")
      val aggs = cols.flatMap { c =>
        Seq(count(lit(1)).as(s"${c}_n"),
          count(when(col(c).isNull, 1)).as(s"${c}_null"),
          min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"),
          sum(floor(col(c) * 100).cast("long")).as(s"${c}_cents"),
          countDistinct(col(c)).as(s"${c}_distinct"))
      }
      val stackArgs = cols.map(c =>
        s"'$c', ${c}_n, ${c}_null, ${c}_min, ${c}_max, ${c}_cents, " +
          s"${c}_distinct").mkString(", ")
      Tables.load(s, dir, "lineitem")
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n, n_null, min_v, max_v, sum_cents, n_distinct)"))
        .orderBy(col("column_name"))
    },

    // Bloom-pruned semi-join: the dimension's KEY SET (too big to
    // broadcast-join as rows at 100 TB, small as bits) becomes a
    // runtime filter applied at the fact scan, so only the ~matching
    // fraction of lineitem reaches the shuffle; the exact semi-join
    // afterwards removes the sketch's false positives, so the result is
    // identical to a plain semi-join — which is exactly what the oracle
    // computes, making the whole pruning path hash-verified.
    QueryDef.sqlBacked(
      "q134_bloom_semijoin",
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import graft.functions.BloomFilterExprs
      val big = Tables.load(s, dir, "lineitem")
      val dim = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0)
      BloomFilterExprs.semiJoinPruned(big, "l_orderkey", dim, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("cents"))
        .orderBy(col("l_returnflag"))
    },

    // Heavy hitters over a planted-skew key (seven hot keys at ~4.8%
    // each riding a ~100k-key uniform tail): a 64-counter Misra-Gries
    // sketch finds the candidates in O(k) state per task — no shuffle of
    // the full key distribution — and its containment guarantee (every
    // key over n/65 survives) makes the candidate∩exact-recount output
    // provably EQUAL to the exact heavy set the oracle computes with a
    // full GROUP BY + HAVING.
    QueryDef.sqlBacked(
      "q135_heavy_hitters",
      """WITH keyed AS (
        |  SELECT CASE WHEN l_orderkey % 3 = 0 THEN l_orderkey % 7
        |              ELSE 100 + (l_orderkey % 100000) END AS key
        |  FROM lineitem),
        |tot AS (SELECT CAST(FLOOR(COUNT(*) / 65.0) AS BIGINT) AS thr
        |        FROM keyed)
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM keyed GROUP BY key
        |HAVING COUNT(*) > (SELECT thr FROM tot)
        |ORDER BY cnt DESC, key""".stripMargin) { (s, dir) =>
      import graft.operators.HeavyHitters
      val keyed = Tables.load(s, dir, "lineitem").select(
        when(col("l_orderkey") % 3 === 0, col("l_orderkey") % 7)
          .otherwise(lit(100) + col("l_orderkey") % 100000).as("key"))
      HeavyHitters.exactHeavy(keyed, col("key"), k = 64)
    },

    // Iterative graph analytics: 4 rounds of PageRank over a 1000-node
    // graph derived from orders (src = o_orderkey%1000 → dst =
    // o_custkey%1000). Every step is INTEGER-exact — contributions are
    // floor(rank/outdeg), damping is floor(85·s/100) — so four chained
    // iterations cannot drift between engines, and the oracle spells the
    // same four rounds as unrolled CTEs. The Spark loop is the Pregel
    // shape: per iteration ONE join on the edge list + one aggregate;
    // edges/degrees are computed once and cached.
    QueryDef.sqlBacked(
      "q143_pagerank",
      """WITH edges AS (SELECT DISTINCT o_orderkey % 1000 AS src,
        |                 o_custkey % 1000 AS dst FROM orders),
        |nodes AS (SELECT DISTINCT v FROM (
        |  SELECT src AS v FROM edges UNION SELECT dst FROM edges)),
        |deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d
        |        FROM edges GROUP BY src),
        |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |r1 AS (SELECT n.v, 150000 + CAST((85 * COALESCE(s.s, 0)
        |         - (85 * COALESCE(s.s, 0)) % 100) / 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN (
        |         SELECT e.dst AS v,
        |           SUM(CAST((r.r - r.r % d.d) / d.d AS BIGINT)) AS s
        |         FROM edges e JOIN r0 r ON r.v = e.src
        |           JOIN deg d ON d.v = e.src
        |         GROUP BY e.dst) s ON s.v = n.v),
        |r2 AS (SELECT n.v, 150000 + CAST((85 * COALESCE(s.s, 0)
        |         - (85 * COALESCE(s.s, 0)) % 100) / 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN (
        |         SELECT e.dst AS v,
        |           SUM(CAST((r.r - r.r % d.d) / d.d AS BIGINT)) AS s
        |         FROM edges e JOIN r1 r ON r.v = e.src
        |           JOIN deg d ON d.v = e.src
        |         GROUP BY e.dst) s ON s.v = n.v),
        |r3 AS (SELECT n.v, 150000 + CAST((85 * COALESCE(s.s, 0)
        |         - (85 * COALESCE(s.s, 0)) % 100) / 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN (
        |         SELECT e.dst AS v,
        |           SUM(CAST((r.r - r.r % d.d) / d.d AS BIGINT)) AS s
        |         FROM edges e JOIN r2 r ON r.v = e.src
        |           JOIN deg d ON d.v = e.src
        |         GROUP BY e.dst) s ON s.v = n.v),
        |r4 AS (SELECT n.v, 150000 + CAST((85 * COALESCE(s.s, 0)
        |         - (85 * COALESCE(s.s, 0)) % 100) / 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN (
        |         SELECT e.dst AS v,
        |           SUM(CAST((r.r - r.r % d.d) / d.d AS BIGINT)) AS s
        |         FROM edges e JOIN r3 r ON r.v = e.src
        |           JOIN deg d ON d.v = e.src
        |         GROUP BY e.dst) s ON s.v = n.v)
        |SELECT CAST(v AS BIGINT) AS node, r AS rank_ppm
        |FROM r4 ORDER BY rank_ppm DESC, node LIMIT 20""".stripMargin) { (s, dir) =>
      // rank-frame placement is size-gated inside the operator: small
      // graphs broadcast the node-sized rank frame into the edge join,
      // billion-node graphs fall back to shuffle-hash joins where only
      // the rank frame moves (the cached edge list is pre-partitioned)
      val edges = Tables.load(s, dir, "orders")
        .select((col("o_orderkey") % 1000).as("src"),
          (col("o_custkey") % 1000).as("dst"))
      graft.operators.PageRank.run(s, edges, iterations = 4)
        .select(col("v").cast("long").as("node"), col("r").as("rank_ppm"))
        .orderBy(col("rank_ppm").desc, col("node")).limit(20)
    },

    // Count-min sketch gate (the point-frequency sketch beside the HLL
    // q200 / KMV q228 / approx-pct q201 gates): one 4×512 matrix over
    // the whole fact table — map-side combine ships ONE matrix per
    // partition, never rows — then both CMS inequalities are checked
    // against exact counts the oracle recomputes: est ≥ true (a sketch
    // can only over-count) and (est − true)·w ≤ 3·N (the ε = e/w bound,
    // e rounded UP to 3 so the gate stays integer-exact). The sketch
    // pull is ONE driver row of d·w longs (16 KB), the q228 pattern.
    QueryDef.sqlBacked(
      "q239_cms_error_gate",
      """SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
        |  CAST(COUNT(*) AS BIGINT) AS true_cnt,
        |  TRUE AS never_undercounts, TRUE AS within_eps
        |FROM lineitem WHERE l_suppkey IN (1, 2, 3)
        |GROUP BY l_suppkey ORDER BY suppkey""".stripMargin) { (s, dir) =>
      import graft.operators.CountMinSketch
      val d = 4; val w = 512
      val li = Tables.load(s, dir, "lineitem")
      val skRow = li.agg(
        CountMinSketch.cms(d, w, col("l_suppkey")).as("sk"),
        count(lit(1)).as("n")).head()
      val sketch = skRow.getSeq[Long](0).toArray
      val n = skRow.getLong(1)
      val exact = li.filter(col("l_suppkey").isin(1L, 2L, 3L))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("true_cnt"))
        .collect() // 3 probe keys, bounded by construction
        .map(r => (r.getLong(0), r.getLong(1)))
      val rows = exact.toSeq.sortBy(_._1).map { case (k, t) =>
        val est = CountMinSketch.estimate(sketch, k, d, w)
        (k, t, est >= t, (est - t) * w <= 3 * n)
      }
      import s.implicits._
      rows.toDF("suppkey", "true_cnt", "never_undercounts", "within_eps")
    },

    // REFERENTIAL-INTEGRITY audit (the warehouse DQ screen before any
    // FK-assuming join): orphan rate of orders→customer and
    // lineitem→orders in exact ppm, with orphans PLANTED (re-added
    // orders under negated keys) so the detector provably fires — the
    // TPC-H generator itself never breaks a FK. One left join + one
    // conditional aggregate per edge; at scale the dim side broadcasts
    // or shuffles by the FK as AQE sizes it.
    QueryDef.sqlBacked(
      "q369_referential_integrity",
      """WITH ords AS (
        |  SELECT o_orderkey, o_custkey FROM orders
        |  UNION ALL
        |  SELECT -o_orderkey, -o_custkey FROM orders
        |  WHERE o_orderkey % 1000 = 0),
        |o AS (SELECT COUNT(*) AS n,
        |    COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS orph
        |  FROM ords LEFT JOIN customer c ON o_custkey = c.c_custkey),
        |l AS (SELECT COUNT(*) AS n,
        |    COUNT(*) FILTER (WHERE o2.o_orderkey IS NULL) AS orph
        |  FROM lineitem LEFT JOIN ords o2 ON l_orderkey = o2.o_orderkey)
        |SELECT CAST(o.n AS BIGINT) AS orders_n,
        |  CAST(o.orph AS BIGINT) AS orphan_orders,
        |  CAST(o.orph * 1000000 // o.n AS BIGINT) AS orphan_orders_ppm,
        |  CAST(l.n AS BIGINT) AS lineitem_n,
        |  CAST(l.orph AS BIGINT) AS orphan_lineitems,
        |  CAST(l.orph * 1000000 // l.n AS BIGINT) AS orphan_lineitems_ppm
        |FROM o, l""".stripMargin) { (s, dir) =>
      val base = Tables.load(s, dir, "orders")
      val ords = base.select(col("o_orderkey"), col("o_custkey"))
        .unionByName(base.filter(col("o_orderkey") % 1000 === 0)
          .select((-col("o_orderkey")).as("o_orderkey"),
            (-col("o_custkey")).as("o_custkey")))
      val cust = Tables.load(s, dir, "customer").select(col("c_custkey"))
      val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"))
      val o = ords.join(cust, col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("n"),
          count(when(col("c_custkey").isNull, 1)).as("orph"))
        .select(col("n").as("orders_n"), col("orph").as("orphan_orders"),
          expr("orph * 1000000 DIV n").as("orphan_orders_ppm"))
      val l = li.join(ords, col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)).as("n"),
          count(when(col("o_orderkey").isNull, 1)).as("orph"))
        .select(col("n").as("lineitem_n"),
          col("orph").as("orphan_lineitems"),
          expr("orph * 1000000 DIV n").as("orphan_lineitems_ppm"))
      o.crossJoin(l) // two 1-row frames
        .select(col("orders_n"), col("orphan_orders"),
          col("orphan_orders_ppm"), col("lineitem_n"),
          col("orphan_lineitems"), col("orphan_lineitems_ppm"))
    }
  )
}