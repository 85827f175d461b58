package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining classic TPC-H shapes expressible over the synthetic
  * schema (no partsupp table, so Q2/Q9/Q11/Q16/Q20 are out of reach;
  * Q12 needs ship modes the data lacks). Q7, Q8, Q14, Q18, Q19, Q13,
  * an adapted Q22, and an adapted Q21 (lateness = shipdate 60+ days
  * past the order date, standing in for the missing receipt/commit
  * dates) complete the named-classic coverage alongside the
  * Q1/Q3/Q4/Q5/Q6/Q10 analogs that shipped in round 1. Money follows
  * the exact-decimal convention; every share is q109's two-step
  * integer division.
  */
object TpchClassics {

  private def money(c: Column): Column = c.cast(DecimalType(15, 2))
  private def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  private val oneD: Column = lit(BigDecimal(1)).cast(DecimalType(3, 2))
  private val M = "DECIMAL(15,2)"
  private val R = "DECIMAL(4,2)"
  private val ONE = "CAST(1 AS DECIMAL(3,2))"

  def defs: Seq[QueryDef] = Seq(

    // TPC-H Q7: bilateral trade volume between two nations, by shipper
    // year. The two small dimension chains broadcast; the fact table
    // meets one hash aggregate.
    QueryDef.sqlBacked(
      "q166_bilateral_trade",
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(SUM(vol) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |    CAST(l_extendedprice AS $M) * ($ONE - CAST(l_discount AS $R)) AS vol
         |  FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
         |    JOIN orders o ON o.o_orderkey = l.l_orderkey
         |    JOIN customer c ON c.c_custkey = o.o_custkey
         |    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
         |    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
         |  WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
         |     OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val n1 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      l.join(Tables.load(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.load(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("sk") === col("s_nationkey"))
        .join(broadcast(n2), col("ck") === col("c_nationkey"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(money(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q8: one nation's share of a region's market for one part
    // type, by order year — share in ppm via the magnitude-safe
    // two-step division (every intermediate < 2⁵³).
    QueryDef.sqlBacked(
      "q167_market_share",
      s"""WITH alln AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    CAST(FLOOR(CAST(l_extendedprice AS $M) * ($ONE - CAST(l_discount AS $R))
         |      * 100) AS BIGINT) AS cents,
         |    n1.n_name AS supp_nation
         |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         |    JOIN customer c ON c.c_custkey = o.o_custkey
         |    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
         |    JOIN region r ON r.r_regionkey = n2.n_regionkey
         |    JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
         |    JOIN part p ON p.p_partkey = l.l_partkey
         |  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
         |SELECT o_year,
         |  CAST(((SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) * 1000)
         |     // SUM(cents)) * 1000
         |   + ((SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) * 1000)
         |      % SUM(cents)) * 1000 // SUM(cents) AS BIGINT) AS share_ppm,
         |  CAST(SUM(cents) AS BIGINT) AS market_cents
         |FROM alln GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
      val n2 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_regionkey"))
      val n1 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val alln = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n2), col("ck") === col("c_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("r_regionkey") === col("n_regionkey"))
        .join(Tables.load(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("sk") === col("s_nationkey"))
        .join(broadcast(Tables.load(s, dir, "part")
          .filter(col("p_type") === "PROMO")),
          col("p_partkey") === col("l_partkey"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
          floor(money(col("l_extendedprice")) * (oneD - rate(col("l_discount"))) * 100)
            .cast("long").as("cents"),
          col("supp_nation"))
      alln.groupBy(col("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", col("cents"))
            .otherwise(0L)).as("nat"),
          sum(col("cents")).as("tot"))
        .select(col("o_year"),
          expr("((nat * 1000L) div tot) * 1000L" +
            " + (((nat * 1000L) % tot) * 1000L) div tot").as("share_ppm"),
          col("tot").cast("long").as("market_cents"))
        .orderBy(col("o_year"))
    },

    // TPC-H Q14: promo revenue share over a quarter, in exact ppm.
    QueryDef.sqlBacked(
      "q168_promo_share",
      s"""WITH t AS (
         |  SELECT CAST(FLOOR(CAST(l_extendedprice AS $M) * ($ONE - CAST(l_discount AS $R))
         |      * 100) AS BIGINT) AS cents,
         |    p_type = 'PROMO' AS promo
         |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01')
         |SELECT CAST(((SUM(CASE WHEN promo THEN cents ELSE 0 END) * 1000)
         |    // SUM(cents)) * 1000
         |  + ((SUM(CASE WHEN promo THEN cents ELSE 0 END) * 1000) % SUM(cents))
         |    * 1000 // SUM(cents) AS BIGINT) AS promo_ppm,
         |  CAST(SUM(cents) AS BIGINT) AS total_cents
         |FROM t""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(Tables.load(s, dir, "part")
          .select(col("p_partkey"), (col("p_type") === "PROMO").as("promo"))),
          col("p_partkey") === col("l_partkey"))
        .select(floor(money(col("l_extendedprice")) * (oneD - rate(col("l_discount"))) * 100)
          .cast("long").as("cents"), col("promo"))
        .agg(sum(when(col("promo"), col("cents")).otherwise(0L)).as("p"),
          sum(col("cents")).as("tot"))
        .select(expr("((p * 1000L) div tot) * 1000L" +
            " + (((p * 1000L) % tot) * 1000L) div tot").as("promo_ppm"),
          col("tot").cast("long").as("total_cents"))
    },

    // TPC-H Q18: large-volume customers — orders whose line quantities
    // exceed a threshold, found with a grouped-HAVING semi-join.
    QueryDef.sqlBacked(
      "q169_large_volume_customers",
      s"""SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
         |  CAST(CAST(o.o_totalprice AS $M) AS DOUBLE) AS o_totalprice,
         |  SUM(l.l_quantity) AS total_qty
         |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
         |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         |  HAVING SUM(l_quantity) > 180)
         |GROUP BY 1, 2, 3, 4
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val big = l.groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("tq"))
        .filter(col("tq") > 180).select(col("l_orderkey"))
      Tables.load(s, dir, "orders")
        .join(big, col("o_orderkey") === big("l_orderkey"), "left_semi")
        .join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          money(col("o_totalprice")).cast("double").as("o_totalprice"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },

    // TPC-H Q19: disjunctive multi-attribute predicate (brand × size ×
    // quantity windows) — the filter composes BEFORE the join output
    // columns, so Catalyst pushes each side's conjuncts into its scan.
    QueryDef.sqlBacked(
      "q170_disjunctive_revenue",
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS $M)
         |    * ($ONE - CAST(l_discount AS $R))) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity BETWEEN 1 AND 20)
         |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
         |       AND l.l_quantity BETWEEN 10 AND 35)
         |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
         |       AND l.l_quantity BETWEEN 20 AND 50)""".stripMargin) { (s, dir) =>
      val pred =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 50))
      Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")),
          col("p_partkey") === col("l_partkey"))
        .filter(pred)
        .agg(sum(money(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // TPC-H Q22 (adapted: custkey-derived country code; "dormant" = no
    // order since 2000): above-average-balance customers with no recent
    // orders. The threshold compare is EXACT — bal·n > total in cents —
    // because avg() is a double in one engine and a decimal in the
    // other, and a borderline customer must not flip between them.
    QueryDef.sqlBacked(
      "q171_sales_opportunity",
      s"""WITH pos AS (SELECT CAST(CAST(c_acctbal AS $M) * 100 AS BIGINT) AS b
         |  FROM customer WHERE c_acctbal > 0),
         |thr AS (SELECT SUM(b) AS total, COUNT(*) AS n FROM pos),
         |eligible AS (
         |  SELECT c_custkey % 10 AS cc,
         |    CAST(CAST(c_acctbal AS $M) * 100 AS BIGINT) AS bal
         |  FROM customer
         |  WHERE CAST(CAST(c_acctbal AS $M) * 100 AS BIGINT)
         |      * (SELECT n FROM thr) > (SELECT total FROM thr)
         |    AND NOT EXISTS (SELECT 1 FROM orders o
         |      WHERE o.o_custkey = c_custkey
         |        AND o.o_orderdate >= TIMESTAMP '2000-01-01'))
         |SELECT CAST(cc AS BIGINT) AS country_code,
         |  CAST(COUNT(*) AS BIGINT) AS n_custs,
         |  CAST(SUM(bal) AS BIGINT) AS total_bal_cents
         |FROM eligible GROUP BY cc ORDER BY cc""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), (money(col("c_acctbal")) * 100).cast("long")
          .as("bal"))
      val thr = c.filter(col("bal") > 0)
        .agg(sum(col("bal")).as("total"), count(lit(1)).as("n"))
      val recent = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      c.crossJoin(broadcast(thr))
        .filter(col("bal") * col("n") > col("total"))
        .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy((col("c_custkey") % 10).as("country_code"))
        .agg(count(lit(1)).as("n_custs"),
          sum(col("bal")).cast("long").as("total_bal_cents"))
        .select(col("country_code").cast("long").as("country_code"),
          col("n_custs"), col("total_bal_cents"))
        .orderBy(col("country_code"))
    },

    // TPC-H Q13: customer order-count distribution INCLUDING zero-order
    // customers (the left join is the point), then a count-of-counts.
    QueryDef.sqlBacked(
      "q172_order_count_distribution",
      """WITH co AS (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM co GROUP BY c_count ORDER BY c_count""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_count"))
    },

    // TPC-H Q17: small-quantity-order revenue for one brand — the
    // classic correlated-scalar-subquery shape. The Spark side is
    // deliberately SQL with two correlated subqueries (count + sum per
    // partkey) so CATALYST does the decorrelation: both rewrite into one
    // per-partkey aggregate joined back on l_partkey — a key-local
    // shuffle join, no per-row re-scan. The 0.2·avg threshold is the
    // integer-exact cross-multiplied form 5·q·n < Σq (quantities are
    // integral doubles), so no engine-specific float averaging can
    // perturb a boundary row.
    QueryDef.sqlBacked(
      "q224_small_qty_revenue",
      s"""WITH agg AS (
         |  SELECT l_partkey,
         |    COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT
         |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         |    AS cents,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem l
         |  JOIN part p ON p.p_partkey = l.l_partkey
         |  JOIN agg a ON a.l_partkey = l.l_partkey
         |WHERE p.p_brand = 'Brand#7'
         |  AND 5 * CAST(l.l_quantity AS BIGINT) * a.n < a.sq""".stripMargin) {
      (s, dir) =>
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        Tables.load(s, dir, "part").createOrReplaceTempView("part_v")
        s.sql(
          """SELECT
            |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            |    AS cents,
            |  CAST(COUNT(*) AS BIGINT) AS n_lines
            |FROM lineitem_v l JOIN part_v p ON p.p_partkey = l.l_partkey
            |WHERE p.p_brand = 'Brand#7'
            |  AND 5 * CAST(l.l_quantity AS BIGINT) *
            |    (SELECT COUNT(*) FROM lineitem_v l2
            |     WHERE l2.l_partkey = l.l_partkey) <
            |    (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
            |     FROM lineitem_v l3 WHERE l3.l_partkey = l.l_partkey)""".stripMargin)
    },

    // TPC-H Q15: top supplier(s) by revenue over one quarter. The
    // supplier-revenue view aggregates the fact table once (supplier-key
    // shuffle); the global max is a one-row frame broadcast back — never
    // a re-aggregation per supplier. Ties all surface, per the spec.
    QueryDef.sqlBacked(
      "q225_top_supplier",
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    CAST(SUM(CAST(FLOOR(CAST(l_extendedprice AS $M)
         |      * ($ONE - CAST(l_discount AS $R)) * 100) AS BIGINT)) AS BIGINT)
         |      AS total_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s.s_suppkey, s.s_name, r.total_cents
         |FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
         |WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
         |ORDER BY s.s_suppkey""".stripMargin) { (s, dir) =>
      val rev = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(money(col("l_extendedprice")) *
          (oneD - rate(col("l_discount"))) * 100).cast("long"))
          .cast("long").as("total_cents"))
      val top = rev.agg(max(col("total_cents")).as("max_cents"))
      Tables.load(s, dir, "supplier")
        .join(rev, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(top), col("total_cents") === col("max_cents"))
        .select(col("s_suppkey"), col("s_name"), col("total_cents"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q21 (adapted): suppliers who were the SOLE late shipper in
    // a multi-supplier order — lateness = shipped 60+ days after the
    // order date (the schema has no receipt/commit dates). The Spark
    // side is deliberately the spec's EXISTS / NOT EXISTS form so
    // Catalyst plans the semi + anti self-joins; the oracle restates
    // the same predicate as per-order aggregates (nsupp > 1, exactly
    // one late supplier) — two independent derivations that must agree
    // row for row.
    QueryDef.sqlBacked(
      "q242_waiting_suppliers",
      """WITH ls AS (
        |  SELECT l_orderkey, l_suppkey,
        |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY l_orderkey, l_suppkey),
        |po AS (SELECT l_orderkey, COUNT(*) AS nsupp, SUM(late) AS nlate
        |  FROM ls GROUP BY l_orderkey)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM ls JOIN po USING (l_orderkey)
        |  JOIN supplier ON s_suppkey = l_suppkey
        |WHERE ls.late = 1 AND po.nsupp > 1 AND po.nlate = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("q242_l")
      Tables.load(s, dir, "orders").createOrReplaceTempView("q242_o")
      Tables.load(s, dir, "supplier").createOrReplaceTempView("q242_s")
      s.sql(
        """SELECT s.s_name,
          |  CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
          |FROM q242_l l1
          |JOIN q242_o o ON o.o_orderkey = l1.l_orderkey
          |JOIN q242_s s ON s.s_suppkey = l1.l_suppkey
          |WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
          |  AND EXISTS (SELECT 1 FROM q242_l l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM q242_l l3
          |    JOIN q242_o o3 ON o3.o_orderkey = l3.l_orderkey
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAYS)
          |GROUP BY s.s_name
          |ORDER BY numwait DESC, s.s_name LIMIT 10""".stripMargin)
    },

    // TPC-H Q2 (adapted: no partsupp, so "minimum supply cost" becomes
    // minimum account balance among the part's lineitem-linked EUROPE
    // suppliers; ties break by s_suppkey). Dimension chains broadcast;
    // the one shuffle is the per-part window over the fact join.
    QueryDef.sqlBacked(
      "q265_min_cost_supplier",
      """WITH eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cand AS (
        |  SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name,
        |    CAST(CAST(s_acctbal AS DECIMAL(15,2)) * 100 AS BIGINT)
        |      AS acct_cents
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  JOIN eu ON s_suppkey = l_suppkey
        |  WHERE p_size <= 5),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
        |    ORDER BY acct_cents, s_suppkey) AS rn FROM cand)
        |SELECT p_partkey, p_brand, s_suppkey, s_name, acct_cents
        |FROM ranked WHERE rn = 1
        |ORDER BY acct_cents DESC, p_partkey LIMIT 25""".stripMargin) {
      (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val eu = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")),
          col("r_regionkey") === col("n_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_name"),
          (money(col("s_acctbal")) * 100).cast("long").as("acct_cents"))
      val cand = Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")
          .filter(col("p_size") <= 5)), col("p_partkey") === col("l_partkey"))
        .join(broadcast(eu), col("s_suppkey") === col("l_suppkey"))
        .select(col("p_partkey"), col("p_brand"), col("s_suppkey"),
          col("s_name"), col("acct_cents"))
        .distinct()
      cand.withColumn("rn", row_number().over(Window
          .partitionBy(col("p_partkey"))
          .orderBy(col("acct_cents"), col("s_suppkey"))))
        .filter(col("rn") === 1).drop("rn")
        .orderBy(col("acct_cents").desc, col("p_partkey")).limit(25)
    },

    // TPC-H Q9 (adapted: no ps_supplycost — cost stands in as 10% of
    // the part's retail price per unit). Product-line profit by
    // supplier nation and order year, all-decimal until the final cast.
    QueryDef.sqlBacked(
      "q266_product_profit",
      s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(SUM(CAST(l_extendedprice AS $M) * ($ONE - CAST(l_discount AS $R))
         |    - CAST(p_retailprice AS $M) * CAST(0.10 AS $R)
         |      * CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE) AS profit
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ON n_nationkey = s_nationkey
         |JOIN orders ON o_orderkey = l_orderkey
         |WHERE p_name LIKE '%bolt%'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val costRate = lit(BigDecimal("0.10")).cast(DecimalType(4, 2))
      Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")
          .filter(col("p_name").contains("bolt"))),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(Tables.load(s, dir, "supplier")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("n_nationkey") === col("s_nationkey"))
        .join(Tables.load(s, dir, "orders"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(money(col("l_extendedprice")) *
            (oneD - rate(col("l_discount"))) -
            money(col("p_retailprice")) * costRate *
            col("l_quantity").cast(DecimalType(6, 2)))
          .cast("double").as("profit"))
        .orderBy(col("n_name"), col("o_year"))
    },

    // TPC-H Q11 (adapted: supplier shipped value stands in for stock
    // value). Suppliers holding more than 1/10000 of total shipped
    // value — the threshold compare is MULTIPLIED THROUGH
    // (value·10000 > total) so no engine ever divides: exact in cents.
    QueryDef.sqlBacked(
      "q267_important_suppliers",
      """WITH v AS (
        |  SELECT l_suppkey AS s_key,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT SUM(value_cents) AS total_cents FROM v)
        |SELECT s_key, value_cents FROM v, t
        |WHERE value_cents * 10000 > total_cents
        |ORDER BY value_cents DESC, s_key""".stripMargin) { (s, dir) =>
      val v = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("s_key"))
        .agg(sum((money(col("l_extendedprice")) * 100).cast("long"))
          .as("value_cents"))
      val t = v.agg(sum(col("value_cents")).as("total_cents"))
      v.crossJoin(broadcast(t))
        .filter(col("value_cents") * 10000 > col("total_cents"))
        .select(col("s_key"), col("value_cents"))
        .orderBy(col("value_cents").desc, col("s_key"))
    },

    // TPC-H Q12 (adapted: the schema has no ship modes — lines class
    // by linenumber parity — and no receipt date — late = shipped 45+
    // days after the order date). High- vs low-priority counts of late
    // lines per class: one broadcast-free fact-fact join, one hash agg.
    QueryDef.sqlBacked(
      "q268_late_priority_split",
      """SELECT CASE WHEN l_linenumber % 2 = 0 THEN 'EVEN' ELSE 'ODD' END
        |    AS ship_class,
        |  CAST(COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 END) AS BIGINT) AS high_line_count,
        |  CAST(COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 45 DAYS"))
        .groupBy(when(col("l_linenumber") % 2 === 0, "EVEN").otherwise("ODD")
          .as("ship_class"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("low_line_count"))
        .orderBy(col("ship_class"))
    },

    // TPC-H Q16 (adapted: the supplier↔part relation comes from
    // lineitem instead of partsupp). Distinct supplier count per
    // (brand, size) for non-PROMO parts — COUNT(DISTINCT) after a
    // broadcast part join.
    QueryDef.sqlBacked(
      "q269_supplier_part_cnt",
      """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_type <> 'PROMO'
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 20""".stripMargin) {
      (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")
          .filter(col("p_type") =!= "PROMO")),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
        .limit(20)
    },

    // TPC-H Q20 (adapted: "excess stock" becomes shipped-quantity above
    // the all-supplier average for widget parts; the average compare is
    // multiplied through — qty·n_suppliers > total — so neither engine
    // divides). Quantities are 2-decimal: exact in hundredths.
    QueryDef.sqlBacked(
      "q270_excess_suppliers",
      """WITH q AS (
        |  SELECT l_suppkey AS s_key,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(8,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS qty_hund
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE '%widget%'
        |  GROUP BY 1),
        |t AS (SELECT SUM(qty_hund) AS total, COUNT(*) AS n FROM q)
        |SELECT s_suppkey, s_name, qty_hund
        |FROM q JOIN supplier ON s_suppkey = s_key, t
        |WHERE qty_hund * n > total
        |ORDER BY qty_hund DESC, s_suppkey""".stripMargin) { (s, dir) =>
      val q = Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")
          .filter(col("p_name").contains("widget"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_suppkey").as("s_key"))
        .agg(sum((col("l_quantity").cast(DecimalType(8, 2)) * 100)
          .cast("long")).as("qty_hund"))
      val t = q.agg(sum(col("qty_hund")).as("total"),
        count(lit(1)).as("n"))
      q.join(broadcast(Tables.load(s, dir, "supplier")),
          col("s_suppkey") === col("s_key"))
        .crossJoin(broadcast(t))
        .filter(col("qty_hund") * col("n") > col("total"))
        .select(col("s_suppkey"), col("s_name"), col("qty_hund"))
        .orderBy(col("qty_hund").desc, col("s_suppkey"))
    }
  )
}
