package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Wave-3 analytics operators: exact rank statistics without global
  * sorts, exact-from-sufficient-statistics screening (anomalies, OLS),
  * graph analytics (triangles, entity resolution), and ranked shingle
  * retrieval. Same float-determinism conventions as
  * [[graft.queries.Relational]]: money in DECIMAL cents, thresholds and
  * scores in pure integer arithmetic, every ranking carries a unique
  * tiebreak.
  */
object Analytics {

  private def money(c: Column): Column = c.cast(DecimalType(15, 2))
  private val M = "DECIMAL(15,2)"
  private val big = DecimalType(38, 0)

  def defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Exact distributed quantiles — selection without a global sort.
    // Spark side: operators.ExactQuantile (histogram-bracket, 3 scans,
    // driver state ≤ groups × buckets). Oracle: the sort-based rank
    // definition the operator provably implements. Rank k = ceil(q·n)
    // is computed in INTEGER arithmetic on both sides — ceil(0.9·n)
    // through doubles misrounds whenever 9n/10 is integral.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q147_exact_quantiles",
      s"""WITH t AS (SELECT o_orderpriority AS grp,
         |    CAST(CAST(o_totalprice AS $M) * 100 AS BIGINT) AS v FROM orders),
         |r AS (SELECT grp, v,
         |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn,
         |    COUNT(*) OVER (PARTITION BY grp) AS n FROM t)
         |SELECT grp AS o_orderpriority, CAST(MAX(n) AS BIGINT) AS n,
         |  MAX(CASE WHEN rn = CAST((1*n + 1 - ((1*n + 1) % 2)) / 2 AS BIGINT)
         |      THEN v END) AS p50_cents,
         |  MAX(CASE WHEN rn = CAST((9*n + 9 - ((9*n + 9) % 10)) / 10 AS BIGINT)
         |      THEN v END) AS p90_cents,
         |  MAX(CASE WHEN rn = CAST((99*n + 99 - ((99*n + 99) % 100)) / 100 AS BIGINT)
         |      THEN v END) AS p99_cents
         |FROM r GROUP BY grp ORDER BY grp""".stripMargin) { (s, dir) =>
      import graft.operators.ExactQuantile
      val o = Tables.load(s, dir, "orders")
      val q = ExactQuantile.quantiles(o, col("o_orderpriority"),
        (money(col("o_totalprice")) * 100).cast("long"),
        Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)))
      val n = o.groupBy(col("o_orderpriority").cast("string").as("g"))
        .agg(count(lit(1)).as("n"))
      q.groupBy(col("g"))
        .agg(max(when(col("label") === "p50", col("v"))).as("p50_cents"),
          max(when(col("label") === "p90", col("v"))).as("p90_cents"),
          max(when(col("label") === "p99", col("v"))).as("p99_cents"))
        .join(n, "g")
        .select(col("g").as("o_orderpriority"), col("n"),
          col("p50_cents"), col("p90_cents"), col("p99_cents"))
        .orderBy(col("o_orderpriority"))
    },

    // ------------------------------------------------------------------
    // Anomaly screening via the EXACT z-score test: x is anomalous iff
    // x > mean + 3σ, decided without ever computing mean or σ —
    // (n·x − S)² > 9·(n·Q − S²) over exact 128-bit integers (S = Σx,
    // Q = Σx²), so no float rounding can flip a boundary row in either
    // engine. Outliers are PLANTED deterministically (25× price on
    // orderkey % 1000 < 3 — the q135 planted-skew pattern) because the
    // synthetic price distribution is bounded and has no natural 3σ
    // tail. Shape: one stats aggregate (5 rows) broadcast back over a
    // second scan — two cheap scans instead of a full-table window
    // shuffle. Exactness bound: decimal(38) holds (n·x)² up to ~1e10
    // rows per group at these magnitudes; beyond that, pre-aggregate or
    // rescale x.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q148_zscore_anomalies",
      s"""WITH t AS (SELECT o_orderpriority AS grp,
         |    CAST(CAST(o_totalprice AS $M) * 100 AS BIGINT)
         |      * (CASE WHEN o_orderkey % 1000 < 3 THEN 25 ELSE 1 END) AS cents
         |  FROM orders),
         |s AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
         |    SUM(CAST(cents AS HUGEINT)) AS s1,
         |    SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS s2
         |  FROM t GROUP BY grp)
         |SELECT t.grp AS o_orderpriority,
         |  CAST(MAX(s.n) AS BIGINT) AS n,
         |  CAST(COUNT(CASE WHEN t.cents * s.n - s.s1 > 0
         |     AND (t.cents * s.n - s.s1) * (t.cents * s.n - s.s1)
         |         > 9 * (s.n * s.s2 - s.s1 * s.s1)
         |     THEN 1 END) AS BIGINT) AS n_anomalies,
         |  CAST(COALESCE(SUM(CASE WHEN t.cents * s.n - s.s1 > 0
         |     AND (t.cents * s.n - s.s1) * (t.cents * s.n - s.s1)
         |         > 9 * (s.n * s.s2 - s.s1 * s.s1)
         |     THEN t.cents END), 0) AS BIGINT) AS anomaly_cents
         |FROM t JOIN s ON s.grp = t.grp
         |GROUP BY t.grp ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val t = Tables.load(s, dir, "orders").select(
        col("o_orderpriority").as("grp"),
        ((money(col("o_totalprice")) * 100).cast("long") *
          when(col("o_orderkey") % 1000 < 3, 25L).otherwise(1L)).as("cents"))
      val cB = col("cents").cast(big)
      val stats = t.groupBy(col("grp")).agg(
        count(lit(1)).cast(big).as("n"),
        sum(cB).cast(big).as("s1"),
        sum(cB * cB).cast(big).as("s2"))
      val dev = cB * col("n") - col("s1")
      val isAnom = dev > 0 && dev * dev > lit(9) * (col("n") * col("s2") -
        col("s1") * col("s1"))
      t.join(broadcast(stats), "grp")
        .groupBy(col("grp").as("o_orderpriority"))
        .agg(max(col("n")).cast("long").as("n"),
          count(when(isAnom, 1)).as("n_anomalies"),
          coalesce(sum(when(isAnom, col("cents"))), lit(0L)).cast("long")
            .as("anomaly_cents"))
        .orderBy(col("o_orderpriority"))
    },

    // ------------------------------------------------------------------
    // Ranked "more-like-this": top-3 similar documents by shared
    // distinct word-trigram shingles. The inverted-index join is the
    // q45 shape, hardened the q46 way: a document-frequency cap on the
    // shingle drops degenerate boilerplate shingles BEFORE the
    // self-join, so per-shingle work is bounded by cap² — the skew
    // guard is part of the SEMANTICS here (df-capped retrieval), hence
    // mirrored in the oracle rather than hidden behind a parity spec.
    // Scores are integers (shared-shingle counts); rank ties break on
    // the neighbour id.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q149_similar_docs",
      """WITH sh AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sg
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |        FROM documents)),
        |inv AS (SELECT doc_id, unnest(sg) AS s FROM sh),
        |keep AS (SELECT s FROM inv GROUP BY s HAVING COUNT(*) <= 100),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM inv a JOIN keep k ON a.s = k.s
        |    JOIN inv b ON b.s = a.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sym AS (SELECT d1 AS doc_id, d2 AS similar_doc, shared FROM pairs
        |  UNION ALL SELECT d2, d1, shared FROM pairs),
        |r AS (SELECT doc_id, similar_doc, shared,
        |  ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY shared DESC, similar_doc) AS rn FROM sym)
        |SELECT doc_id, similar_doc, shared, CAST(rn AS INT) AS rank
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
      import graft.operators.TextOps
      // 64-bit shingle hashes, never strings, feed the joins (q141's
      // accepted premise: the hash is injective in practice; the oracle
      // recomputes with string shingles)
      val inv = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.hashedShingles(TextOps.tokens(col("text"))))
            .as("s"))
      // df cap: count-then-filter BEFORE the self-join (SkewGuard shape)
      val keep = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100).select(col("s"))
      // cached: the surviving postings list feeds both sides of the
      // self-join (and is OUTPUT-scale — docs × shingles, not pairs)
      val kept = inv.join(broadcast(keep), "s").cache()
      val pairs = kept.as("a")
        .join(kept.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("shared"))
      val sym = pairs.select(col("d1").as("doc_id"),
          col("d2").as("similar_doc"), col("shared"))
        .unionAll(pairs.select(col("d2").as("doc_id"),
          col("d1").as("similar_doc"), col("shared")))
      val win = Window.partitionBy(col("doc_id"))
        .orderBy(col("shared").desc, col("similar_doc"))
      sym.withColumn("rank", row_number().over(win))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("similar_doc"), col("shared"),
          col("rank").cast("int").as("rank"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // ------------------------------------------------------------------
    // Triangle counting over the part co-occurrence graph (parts sharing
    // an order). Edge construction is ONE shuffle: group the fact table
    // by order, emit each order's C(k,2) part pairs MAP-SIDE from the
    // grouped array (orders hold ≤ a handful of parts), dedup. Edges are
    // oriented low-id → high-id at emission, so the wedge join's
    // per-node fan-out is bounded without any degree join — on this
    // co-occurrence graph the id-orientation wedge count (~1.0×10⁸ at
    // sf0.1) matches the degree-oriented one (~0.8×10⁸) because degrees
    // are near-uniform; for power-law graphs swap in (degree, id)
    // orientation, the standard √m fan-out bound, at the cost of two
    // extra joins. Triangle count is orientation-invariant, so the
    // oracle's plain a<b spelling agrees by construction.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q150_triangle_count",
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
        |  (SELECT n_triangles FROM tri) AS n_triangles""".stripMargin) { (s, dir) =>
      // An edge is ONE packed long (hi32 = smaller part, lo32 = larger;
      // keys are < 2³¹ by data contract): the dedup shuffles single
      // longs, and every broadcast hash join below keys on a single
      // long — Spark's LongHashedRelation fast path, ~3× cheaper than a
      // two-column generic key at this fan-out.
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val ek = li.as("a").hint("SHUFFLE_HASH").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(shiftleft(col("a.pk"), 32).bitwiseOR(col("b.pk")).as("ek"))
        .distinct().cache()
      val ed = ek.select(shiftright(col("ek"), 32).as("s"),
        col("ek").bitwiseAND(lit(0xFFFFFFFFL)).as("t"))
      // the wedges stream through two broadcast hash probes in one
      // stage — never materialized, never shuffled. At a scale where
      // the edge list outgrows executors, swap the broadcasts for a
      // shuffle join on the same packed keys.
      // Cost note (r11 adjudication of the r8→r10 ~1.5x growth): the
      // runtime tracks the WEDGE count of the testdata generation —
      // the current sf0.1 fixture has 1.196M distinct edges and 49.2M
      // id-oriented wedges (avg 4.08 lines/order vs r8's smaller
      // generation), all probed in one codegen stage. The plan shape is
      // unchanged and pinned by PlanSpec (two BroadcastHashJoins, no
      // sort-merge, no cartesian); the growth is data, not plan.
      val wedges = ed.as("e1")
        .join(broadcast(ed.as("e2")), col("e1.t") === col("e2.s"))
        .select(shiftleft(col("e1.s"), 32).bitwiseOR(col("e2.t")).as("wk"))
      val tri = wedges.join(broadcast(ek), col("wk") === col("ek"))
        .agg(count(lit(1)).as("n_triangles"))
      ek.agg(count(lit(1)).as("n_edges")).crossJoin(tri)
    },

    // q150's power-law fallback as CODE, not a comment: the same
    // co-occurrence graph counted under the (degree, id) orientation
    // (graft.operators.Triangles — nodes relabeled by distributed
    // degree rank, then the identical packed-long wedge pipeline).
    // Triangle totals are orientation-invariant, so the id-orientation
    // oracle certifies the degree-oriented path; TriangleSpec pins the
    // bounded wedge fan-out on a planted hot node.
    QueryDef.sqlBacked(
      "q193_triangle_degree",
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
        |  (SELECT n_triangles FROM tri) AS n_triangles""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs = li.as("a").hint("SHUFFLE_HASH").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
      graft.operators.Triangles.count(s, pairs, "u", "v",
        degreeOriented = true)
    },

    // ------------------------------------------------------------------
    // Entity resolution end-to-end: blocked fuzzy-match pairs (the q103
    // blocking) → connected components (operators.ConnectedComponents —
    // driver union-find under 1M pairs, convergent pointer-jumping
    // min-label propagation above) → survivorship (the min-id member is
    // the canonical record). The oracle recomputes the SAME fixpoint a
    // completely different way — a recursive transitive-closure CTE —
    // so the distributed component labels are hash-verified against an
    // independent algorithm, not a reimplementation of themselves.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q151_entity_resolution",
      """WITH RECURSIVE pairs AS (
        |  SELECT a.p_partkey AS k1, b.p_partkey AS k2
        |  FROM part a JOIN part b ON a.p_brand = b.p_brand
        |    AND str_split(a.p_name, ' ')[-1] = str_split(b.p_name, ' ')[-1]
        |    AND a.p_partkey < b.p_partkey
        |  WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
        |    AND levenshtein(a.p_name, b.p_name) <= 2),
        |edges AS (SELECT k1 AS a, k2 AS b FROM pairs
        |  UNION SELECT k2, k1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
        |  WHERE e.b <> r.a),
        |comp AS (SELECT a AS k, LEAST(a, MIN(b)) AS comp
        |         FROM reach GROUP BY a)
        |SELECT CAST(c.comp AS BIGINT) AS entity_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_members,
        |  MAX(CASE WHEN c.k = c.comp THEN p.p_name END) AS canon_name
        |FROM comp c JOIN part p ON p.p_partkey = c.k
        |GROUP BY c.comp ORDER BY entity_id""".stripMargin) { (s, dir) =>
      import graft.operators.ConnectedComponents
      val p = Tables.load(s, dir, "part").select(col("p_partkey"),
        col("p_brand"), col("p_name"),
        element_at(split(col("p_name"), " "), -1).as("noun"))
      val a = p.select(col("p_partkey").as("k1"), col("p_brand").as("brand1"),
        col("noun").as("noun1"), col("p_name").as("name1"))
      val b = p.select(col("p_partkey").as("k2"), col("p_brand").as("brand2"),
        col("noun").as("noun2"), col("p_name").as("name2"))
      val pairs = a.join(b, col("brand1") === col("brand2") &&
          col("noun1") === col("noun2") && col("k1") < col("k2"))
        .filter(abs(length(col("name1")) - length(col("name2"))) <= 2)
        .filter(levenshtein(col("name1"), col("name2"), 2).between(0, 2))
        .select(col("k1"), col("k2"))
      val comp = ConnectedComponents.components(pairs)
      val sizes = comp.groupBy(col("comp").as("entity_id"))
        .agg(count(lit(1)).as("n_members"))
      Tables.load(s, dir, "part")
        .select(col("p_partkey").as("entity_id"),
          col("p_name").as("canon_name"))
        .join(broadcast(sizes), "entity_id")
        .select(col("entity_id").cast("long").as("entity_id"),
          col("n_members"), col("canon_name"))
        .orderBy(col("entity_id"))
    },

    // ------------------------------------------------------------------
    // Deterministic mode (most frequent value) per group: two-level
    // aggregation — the full scan feeds ONE hash aggregate on
    // (group, value); the ranking window runs on the post-agg frame
    // (|distinct values| rows, not |table| rows). Ties break on the
    // smaller value, pinned identically in both engines.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q153_mode_per_group",
      """WITH c AS (SELECT l_returnflag, CAST(FLOOR(l_quantity) AS BIGINT) AS v,
        |    COUNT(*) AS cnt FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, v, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, v) AS rn FROM c)
        |SELECT l_returnflag, v AS mode_qty, CAST(cnt AS BIGINT) AS n_occurrences
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          floor(col("l_quantity")).cast("long").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val win = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("v"))
      c.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("v").as("mode_qty"),
          col("cnt").as("n_occurrences"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // Closed-form OLS trend (price vs order date) from EXACT sufficient
    // statistics: one scan accumulates n, Σx, Σy, Σx², Σxy as integers
    // (x = days from a fixed epoch, y = cents; per-row products fit in
    // longs, group sums go to 128-bit), then slope = (n·Σxy − Σx·Σy) /
    // (n·Σx² − (Σx)²) is emitted as sign + micro-units via truncating
    // integer division on the non-negative magnitude — truncation and
    // floor agree on non-negatives, so DuckDB's `//` (which truncates
    // toward zero on negatives) and Spark's `div` cannot disagree.
    // No regression library, no float accumulation, one scan.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q154_ols_trend",
      s"""WITH t AS (SELECT o_orderpriority AS grp,
         |    CAST(date_diff('day', DATE '1995-06-01',
         |      CAST(o_orderdate AS DATE)) AS HUGEINT) AS x,
         |    CAST(CAST(CAST(o_totalprice AS $M) * 100 AS BIGINT) AS HUGEINT) AS y
         |  FROM orders),
         |s AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx,
         |    SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
         |  FROM t GROUP BY grp)
         |SELECT grp AS o_orderpriority, CAST(n AS BIGINT) AS n,
         |  CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END AS INT)
         |    AS slope_sign,
         |  CAST((abs(n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
         |    AS BIGINT) AS slope_micro
         |FROM s ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val t = Tables.load(s, dir, "orders").select(
        col("o_orderpriority").as("grp"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-06-01").cast("date")).cast("long").as("x"),
        (money(col("o_totalprice")) * 100).cast("long").as("y"))
      // per-row products fit comfortably in longs; only the group sums
      // need 128-bit headroom
      val stats = t.groupBy(col("grp")).agg(
        count(lit(1)).cast(big).as("n"),
        sum(col("x")).cast(big).as("sx"),
        sum(col("y")).cast(big).as("sy"),
        sum(col("x") * col("x")).cast(big).as("sxx"),
        sum(col("x") * col("y")).cast(big).as("sxy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      stats.select(col("grp").as("o_orderpriority"),
          col("n").cast("long").as("n"),
          when(num < 0, -1).otherwise(1).cast("int").as("slope_sign"),
          expr("(abs(n * sxy - sx * sy) * 1000000) div " +
            "(n * sxx - sx * sx)").as("slope_micro"))
        .orderBy(col("o_orderpriority"))
    },

    // ------------------------------------------------------------------
    // WEIGHTED exact quantiles: the quantity-weighted price percentiles
    // per return flag — "the price at which half the shipped UNITS are
    // cheaper", not "half the line items". Same histogram-bracket
    // operator as q147 with weight-summing buckets; the answer is the
    // smallest value whose cumulative weight reaches ceil(q·W), ranks in
    // exact integer arithmetic. The oracle spells the definition
    // directly with a cumulative-weight window over per-value sums.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q156_weighted_quantiles",
      s"""WITH t AS (SELECT l_returnflag AS g,
         |    CAST(CAST(l_extendedprice AS $M) * 100 AS BIGINT) AS v,
         |    CAST(FLOOR(l_quantity) AS BIGINT) AS w FROM lineitem),
         |pv AS (SELECT g, v, SUM(w) AS w FROM t GROUP BY g, v),
         |c AS (SELECT g, v, SUM(w) OVER (PARTITION BY g ORDER BY v) AS cw,
         |      SUM(w) OVER (PARTITION BY g) AS tw FROM pv)
         |SELECT g AS l_returnflag, CAST(MAX(tw) AS BIGINT) AS total_weight,
         |  MIN(CASE WHEN cw >= CAST((1*tw + 1 - ((1*tw + 1) % 2)) / 2 AS BIGINT)
         |      THEN v END) AS p50_cents,
         |  MIN(CASE WHEN cw >= CAST((9*tw + 9 - ((9*tw + 9) % 10)) / 10 AS BIGINT)
         |      THEN v END) AS p90_cents,
         |  MIN(CASE WHEN cw >= CAST((99*tw + 99 - ((99*tw + 99) % 100)) / 100 AS BIGINT)
         |      THEN v END) AS p99_cents
         |FROM c GROUP BY g ORDER BY g""".stripMargin) { (s, dir) =>
      import graft.operators.ExactQuantile
      val li = Tables.load(s, dir, "lineitem")
      val q = ExactQuantile.weightedQuantiles(li, col("l_returnflag"),
        (money(col("l_extendedprice")) * 100).cast("long"),
        floor(col("l_quantity")).cast("long"),
        Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)))
      val tw = li.groupBy(col("l_returnflag").cast("string").as("g"))
        .agg(sum(floor(col("l_quantity")).cast("long")).as("total_weight"))
      q.groupBy(col("g"))
        .agg(max(when(col("label") === "p50", col("v"))).as("p50_cents"),
          max(when(col("label") === "p90", col("v"))).as("p90_cents"),
          max(when(col("label") === "p99", col("v"))).as("p99_cents"))
        .join(tw, "g")
        .select(col("g").as("l_returnflag"), col("total_weight"),
          col("p50_cents"), col("p90_cents"), col("p99_cents"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // Largest-remainder proration: allocate a fixed budget (1,000,000
    // units) across nations proportional to revenue, in PURE INTEGER
    // arithmetic — floor shares first, then the remainder units go to
    // the largest fractional parts, compared as integer remainders
    // ((B·w) mod W), never as floats. Σalloc == B exactly, by
    // construction (the invariant float proration always breaks). The
    // window runs on the 25-row post-agg frame.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q159_proration",
      s"""WITH r AS (
         |  SELECT n.n_name, CAST(SUM(CAST(o_totalprice AS $M) * 100) AS BIGINT) AS w
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |    JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  GROUP BY n.n_name),
         |t AS (SELECT n_name, w, SUM(w) OVER () AS tw FROM r),
         |b AS (SELECT n_name, w, tw,
         |    CAST((1000000 * w - (1000000 * w) % tw) / tw AS BIGINT) AS base,
         |    (1000000 * w) % tw AS frac_key FROM t),
         |rk AS (SELECT *, CAST(1000000 - SUM(base) OVER () AS BIGINT) AS rem,
         |    ROW_NUMBER() OVER (ORDER BY frac_key DESC, n_name) AS rn FROM b)
         |SELECT n_name, CAST(base + CASE WHEN rn <= rem THEN 1 ELSE 0 END
         |  AS BIGINT) AS alloc
         |FROM rk ORDER BY n_name""".stripMargin) { (s, dir) =>
      val r = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(money(col("o_totalprice")) * 100).cast("long").as("w"))
      val all = Window.partitionBy()
      r.withColumn("tw", sum(col("w")).over(all))
        .withColumn("base", expr("(1000000L * w) div tw"))
        .withColumn("frac_key", expr("(1000000L * w) % tw"))
        .withColumn("rem", lit(1000000L) - sum(col("base")).over(all))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("frac_key").desc, col("n_name"))))
        .select(col("n_name"),
          (col("base") + when(col("rn") <= col("rem"), 1L).otherwise(0L))
            .cast("long").as("alloc"))
        .orderBy(col("n_name"))
    },

    // ------------------------------------------------------------------
    // Month-over-month revenue bridge (waterfall): Δrevenue decomposed
    // into NEW customers' revenue, LOST customers' (negative), and the
    // delta among RETAINED — one full-outer self-join of the per-
    // (customer, month) aggregate against itself shifted a month. Month
    // index is integer ((y−1992)·12 + m−1), so year boundaries don't
    // break adjacency. The join runs on the post-agg frame (customers ×
    // months, far below row count).
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q160_revenue_bridge",
      s"""WITH cm AS (
         |  SELECT o_custkey AS cust,
         |    (CAST(year(o_orderdate) AS BIGINT) - 1992) * 12
         |      + CAST(month(o_orderdate) AS BIGINT) - 1 AS m,
         |    CAST(SUM(CAST(o_totalprice AS $M) * 100) AS BIGINT) AS cents
         |  FROM orders GROUP BY 1, 2),
         |j AS (
         |  SELECT COALESCE(b.m, a.m + 1) AS month_idx,
         |    COALESCE(b.cents, 0) - COALESCE(a.cents, 0) AS delta,
         |    CASE WHEN a.cust IS NULL THEN 'new'
         |         WHEN b.cust IS NULL THEN 'lost' ELSE 'retained' END AS seg
         |  FROM cm a FULL OUTER JOIN cm b ON b.cust = a.cust AND b.m = a.m + 1)
         |SELECT month_idx,
         |  CAST(COALESCE(SUM(delta) FILTER (WHERE seg = 'new'), 0) AS BIGINT)
         |    AS new_cents,
         |  CAST(COALESCE(SUM(delta) FILTER (WHERE seg = 'lost'), 0) AS BIGINT)
         |    AS lost_cents,
         |  CAST(COALESCE(SUM(delta) FILTER (WHERE seg = 'retained'), 0) AS BIGINT)
         |    AS retained_delta_cents
         |FROM j GROUP BY month_idx HAVING month_idx BETWEEN 36 AND 119
         |ORDER BY month_idx""".stripMargin) { (s, dir) =>
      val cm = Tables.load(s, dir, "orders").groupBy(
          col("o_custkey").as("cust"),
          ((year(col("o_orderdate")).cast("long") - 1992) * 12 +
            month(col("o_orderdate")).cast("long") - 1).as("m"))
        .agg(sum(money(col("o_totalprice")) * 100).cast("long").as("cents"))
      val a = cm.select(col("cust").as("ca"), col("m").as("ma"),
        col("cents").as("xa"))
      val b = cm.select(col("cust").as("cb"), col("m").as("mb"),
        col("cents").as("xb"))
      a.join(b, col("cb") === col("ca") && col("mb") === col("ma") + 1,
          "full_outer")
        .select(coalesce(col("mb"), col("ma") + 1).as("month_idx"),
          (coalesce(col("xb"), lit(0L)) - coalesce(col("xa"), lit(0L)))
            .as("delta"),
          when(col("ca").isNull, "new").when(col("cb").isNull, "lost")
            .otherwise("retained").as("seg"))
        .groupBy(col("month_idx"))
        .agg(coalesce(sum(when(col("seg") === "new", col("delta"))), lit(0L))
            .cast("long").as("new_cents"),
          coalesce(sum(when(col("seg") === "lost", col("delta"))), lit(0L))
            .cast("long").as("lost_cents"),
          coalesce(sum(when(col("seg") === "retained", col("delta"))), lit(0L))
            .cast("long").as("retained_delta_cents"))
        .filter(col("month_idx").between(36, 119))
        .orderBy(col("month_idx"))
    },

    // ------------------------------------------------------------------
    // RFM segmentation: per-customer recency/frequency/monetary, each
    // NTILE(5)-binned with a unique tiebreak so bin edges are identical
    // across engines; output is the segment-size cube. NTILE derives
    // from a DISTRIBUTED global rank (DistributedOrder) — never an
    // unpartitioned single-task window, even on the post-agg frame.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q161_rfm_segments",
      s"""WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
         |c AS (SELECT o_custkey AS cust,
         |    date_diff('day', MAX(CAST(o_orderdate AS DATE)),
         |      (SELECT d0 FROM mx)) AS rec,
         |    COUNT(*) AS freq,
         |    CAST(SUM(CAST(o_totalprice AS $M) * 100) AS BIGINT) AS mon
         |  FROM orders GROUP BY 1),
         |q AS (SELECT cust,
         |    NTILE(5) OVER (ORDER BY rec, cust) AS r_q,
         |    NTILE(5) OVER (ORDER BY freq DESC, cust) AS f_q,
         |    NTILE(5) OVER (ORDER BY mon DESC, cust) AS m_q
         |  FROM c)
         |SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
         |  CAST(m_q AS INT) AS m_q, CAST(COUNT(*) AS BIGINT) AS n_customers
         |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val d0 = o.agg(max(col("o_orderdate").cast("date"))).first().getDate(0)
      // cached: three distributed rank passes read this aggregate (the
      // alternative — three unpartitioned NTILE windows — would put the
      // whole customer frame through ONE task each; here every pass is a
      // parallel range sort, NTILE derives from the global rank in exact
      // integer arithmetic, and the 5^3-row result releases the cache
      // via an eager checkpoint)
      val c = o.groupBy(col("o_custkey").as("cust"))
        .agg(datediff(lit(d0), max(col("o_orderdate").cast("date")))
            .as("rec"),
          count(lit(1)).as("freq"),
          sum(money(col("o_totalprice")) * 100).cast("long").as("mon"))
        .persist()
      val n = c.count()
      import graft.operators.DistributedOrder
      def tile(out: String, sort: Column*): org.apache.spark.sql.DataFrame =
        DistributedOrder.withRank(c, "_r", sort: _*)
          .select(col("cust"), DistributedOrder.ntileFromRank("_r", n, 5)
            .as(out))
      val res = tile("r_q", col("rec"), col("cust"))
        .join(tile("f_q", col("freq").desc, col("cust")), "cust")
        .join(tile("m_q", col("mon").desc, col("cust")), "cust")
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_customers"))
        .select(col("r_q").cast("int").as("r_q"),
          col("f_q").cast("int").as("f_q"),
          col("m_q").cast("int").as("m_q"), col("n_customers"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
      try res.localCheckpoint(eager = true) finally c.unpersist()
    },

    // ------------------------------------------------------------------
    // Market-basket lift: for co-purchased part pairs, lift =
    // P(a∧b)/(P(a)·P(b)) in integer ppm — (cc·N·10⁶) div (cₐ·c_b), every
    // intermediate < 2⁶³ at any plausible catalog. The pair counting is
    // the q150 edge shuffle with a support floor; top-20 by lift with
    // full tiebreak.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q162_basket_lift",
      """WITH po AS (SELECT DISTINCT l_partkey AS p, l_orderkey AS o
        |            FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT o_orderkey) AS n FROM orders),
        |cnt AS (SELECT p, COUNT(*) AS c FROM po GROUP BY p),
        |co AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cc
        |  FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |lift AS (SELECT pa, pb, cc,
        |    CAST((cc * (SELECT n FROM n) * 1000000
        |      - (cc * (SELECT n FROM n) * 1000000) % (ca.c * cb.c))
        |      / (ca.c * cb.c) AS BIGINT) AS lift_ppm
        |  FROM co JOIN cnt ca ON ca.p = co.pa JOIN cnt cb ON cb.p = co.pb)
        |SELECT pa, pb, CAST(cc AS BIGINT) AS n_both, lift_ppm
        |FROM lift ORDER BY lift_ppm DESC, pa, pb LIMIT 20""".stripMargin) { (s, dir) =>
      val po = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").as("p"), col("l_orderkey").as("o"))
        .distinct().cache()
      val nOrders = Tables.load(s, dir, "orders")
        .agg(countDistinct(col("o_orderkey")).as("n"))
      val cnt = po.groupBy(col("p")).agg(count(lit(1)).as("c"))
      val co = po.as("a").join(po.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
        .agg(count(lit(1)).as("cc"))
        .filter(col("cc") >= 3)
      co.join(broadcast(cnt.select(col("p").as("pa"), col("c").as("ca"))), "pa")
        .join(broadcast(cnt.select(col("p").as("pb"), col("c").as("cb"))), "pb")
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("cc").cast("long").as("n_both"),
          expr("(cc * n * 1000000L) div (ca * cb)").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("pa"), col("pb"))
        .limit(20)
    },

    // ------------------------------------------------------------------
    // Benford first-digit profile (the data-forensics screen): digit
    // frequencies of the cents totals in integer ppm. One scan, one
    // 9-row aggregate; string first-digit agrees across engines because
    // the input is an integer rendered in base 10.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q163_benford",
      s"""WITH d AS (SELECT substring(CAST(CAST(CAST(o_totalprice AS $M) * 100
         |    AS BIGINT) AS VARCHAR), 1, 1) AS digit FROM orders),
         |t AS (SELECT COUNT(*) AS n FROM d)
         |SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST((COUNT(*) * 1000000 - (COUNT(*) * 1000000) % (SELECT n FROM t))
         |    / (SELECT n FROM t) AS BIGINT) AS ppm
         |FROM d GROUP BY digit ORDER BY digit""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "orders")
        .select(substring((money(col("o_totalprice")) * 100).cast("long")
          .cast("string"), 1, 1).as("digit"))
      val t = d.agg(count(lit(1)).as("t"))
      d.groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(t))
        .select(col("digit"), col("n"),
          expr("(n * 1000000L) div t").as("ppm"))
        .orderBy(col("digit"))
    },

    // ------------------------------------------------------------------
    // Gini concentration of customer revenue, exact to the ppm: the
    // rank-sum formula G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over cents with
    // a total order (x, custkey), every product in 128-bit integers.
    // Ranks come from a DISTRIBUTED sort + per-partition offsets
    // (DistributedOrder), never a single-task ROW_NUMBER window.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q164_gini",
      s"""WITH c AS (SELECT o_custkey,
         |    CAST(SUM(CAST(o_totalprice AS $M) * 100) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |r AS (SELECT CAST(x AS HUGEINT) AS x,
         |    CAST(ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS HUGEINT) AS i,
         |    CAST(COUNT(*) OVER () AS HUGEINT) AS n FROM c),
         |s AS (SELECT MAX(n) AS n, SUM(i * x) AS six, SUM(x) AS sx FROM r)
         |SELECT CAST(n AS BIGINT) AS n_customers,
         |  CAST(((2 * six - (n + 1) * sx) * 1000000
         |    - ((2 * six - (n + 1) * sx) * 1000000) % (n * sx)) / (n * sx)
         |    AS BIGINT) AS gini_ppm
         |FROM s""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(money(col("o_totalprice")) * 100).cast("long").as("x"))
      // global rank via DISTRIBUTED sort + per-partition offsets (the
      // q193 pattern) — an unpartitioned ROW_NUMBER window would put the
      // whole customer frame through ONE task (PlanSpec pins no Window)
      val r = graft.operators.DistributedOrder
        .withRank(c, "i", col("x"), col("o_custkey"))
        .select(col("x").cast(big).as("x"), col("i").cast(big).as("i"))
      r.agg(count(lit(1)).cast(big).as("n"),
          sum(col("i") * col("x")).as("six"), sum(col("x")).as("sx"))
        .select(col("n").cast("long").as("n_customers"),
          expr("((2 * six - (n + 1) * sx) * 1000000) div (n * sx)")
            .as("gini_ppm"))
    },

    // ------------------------------------------------------------------
    // Interval coalescing (merge overlapping spans): each event opens a
    // 30-minute activity window; overlapping/touching windows of one
    // user merge into islands (start > running-max(end) breaks). Two
    // user-partitioned windows, one shuffle, all epoch-ms integers —
    // the user key partitions at any scale.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q175_interval_coalesce",
      """WITH iv AS (SELECT user_id, event_id, epoch_ms(ts) AS s,
        |    epoch_ms(ts) + 1800000 AS e FROM events),
        |m AS (SELECT user_id, event_id, s, e,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |fl AS (SELECT user_id, event_id, s, e,
        |    CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |isl AS (SELECT user_id, s, e,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM fl),
        |g AS (SELECT user_id, island, MAX(e) - MIN(s) AS cov
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(SUM(cov) AS BIGINT) AS covered_ms
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("s"), col("event_id"))
      val iv = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("s"),
          (unix_millis(col("ts")) + 1800000L).as("e"))
      iv.withColumn("pmax",
          max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("brk",
          when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
        .withColumn("island",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("island"))
        .agg((max(col("e")) - min(col("s"))).as("cov"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"), sum(col("cov")).as("covered_ms"))
        .orderBy(col("user_id"))
    },

    // ------------------------------------------------------------------
    // 2-D skyline (Pareto frontier): parts minimizing price while
    // maximizing size, nobody cheaper-and-bigger. Spark shape: sort by
    // price, a point survives iff its size beats the running max — a
    // LOCAL skyline per hash bucket first (local domination implies
    // global, so the prune is sound), then the same two-frame window on
    // the survivors. No O(n²) pair join anywhere; the oracle IS the
    // NOT EXISTS definition.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q176_skyline",
      s"""WITH p AS (SELECT p_partkey,
         |    CAST(CAST(p_retailprice AS $M) * 100 AS BIGINT) AS cents,
         |    CAST(p_size AS BIGINT) AS sz
         |  FROM part)
         |SELECT p_partkey, cents, sz FROM p a
         |WHERE NOT EXISTS (SELECT 1 FROM p b
         |  WHERE b.cents <= a.cents AND b.sz >= a.sz
         |    AND (b.cents < a.cents OR b.sz > a.sz))
         |ORDER BY cents, p_partkey""".stripMargin) { (s, dir) =>
      def survivors(df: org.apache.spark.sql.DataFrame,
          bucket: Seq[Column]): org.apache.spark.sql.DataFrame = {
        val base = Window.partitionBy(bucket: _*).orderBy(col("cents"))
        df.withColumn("m1", max(col("sz"))
            .over(base.rangeBetween(Window.unboundedPreceding, -1)))
          .withColumn("m2", max(col("sz"))
            .over(base.rangeBetween(Window.unboundedPreceding, 0)))
          .filter(!(coalesce(col("m1") >= col("sz"), lit(false)) ||
            col("m2") > col("sz")))
          .drop("m1", "m2")
      }
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          (money(col("p_retailprice")) * 100).cast("long").as("cents"),
          col("p_size").cast("long").as("sz"))
      val local = survivors(p, Seq(pmod(col("p_partkey"), lit(32))))
      survivors(local, Seq.empty)
        .orderBy(col("cents"), col("p_partkey"))
    },

    // ------------------------------------------------------------------
    // Markov transition matrix over the event stream: consecutive
    // event-type bigrams per user (LEAD over the user timeline), then
    // transition probability in exact integer ppm of each source state.
    // The session-path analytics primitive; one user-keyed shuffle.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q177_markov_transitions",
      """WITH s AS (SELECT event_type AS src,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |p AS (SELECT src, dst, COUNT(*) AS n FROM s
        |  WHERE dst IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT src, SUM(n) AS tot FROM p GROUP BY 1)
        |SELECT p.src AS from_type, p.dst AS to_type, CAST(n AS BIGINT) AS n,
        |  CAST((n * 1000000 - (n * 1000000) % tot) / tot AS BIGINT) AS p_ppm
        |FROM p JOIN t ON t.src = p.src
        |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.load(s, dir, "events")
        .select(col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy(col("src")).agg(sum(col("n")).as("tot"))
      pairs.join(tot, "src")
        .select(col("src").as("from_type"), col("dst").as("to_type"),
          col("n"), expr("(n * 1000000L) div tot").as("p_ppm"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // ------------------------------------------------------------------
    // Length-3 path mining over the event stream (the sequential-pattern
    // step past q177's bigram matrix): per-user ordered event-type
    // trigrams via two LEADs on one window, counted globally, top-20
    // with full deterministic tie-breaks and support share in exact
    // integer ppm. One user-keyed shuffle; the ranking window runs on
    // the |types|³-bounded path frame, never the stream.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q305_event_trigram_paths",
      """WITH s AS (SELECT event_type AS a,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS b,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS c
        |  FROM events),
        |p AS (SELECT a, b, c, COUNT(*) AS n FROM s
        |  WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2, 3),
        |t AS (SELECT SUM(n) AS tot FROM p),
        |r AS (SELECT a, b, c, n,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, a, b, c) AS rnk FROM p)
        |SELECT CAST(rnk AS BIGINT) AS rnk, a, b, c, CAST(n AS BIGINT) AS n,
        |  CAST((n * 1000000 - (n * 1000000) % tot) / tot AS BIGINT)
        |    AS share_ppm
        |FROM r CROSS JOIN t WHERE rnk <= 20 ORDER BY rnk""".stripMargin) {
      (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val paths = Tables.load(s, dir, "events")
        .select(col("event_type").as("a"),
          lead(col("event_type"), 1).over(w).as("b"),
          lead(col("event_type"), 2).over(w).as("c"))
        .filter(col("b").isNotNull && col("c").isNotNull)
        .groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("n"))
      val tot = paths.agg(sum(col("n")).as("tot"))
      paths
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("n").desc, col("a"), col("b"), col("c"))))
        .filter(col("rnk") <= 20)
        .crossJoin(broadcast(tot))
        .select(col("rnk").cast("long").as("rnk"), col("a"), col("b"),
          col("c"), col("n"), expr("(n * 1000000L) div tot").as("share_ppm"))
        .orderBy(col("rnk"))
    },

    // ------------------------------------------------------------------
    // Growth accounting (the new/retained/resurrected/churned user
    // ledger): per epoch-week, classify each active user by their
    // previous active week — first week ever = new, previous week
    // active = retained, a gap = resurrected — and attribute churn to
    // the week AFTER a user's last activity (capped at the corpus'
    // final week). All-integer weeks (epoch-day div 7, the q197
    // convention), so both engines bucket identically. Scale shape:
    // one user-week distinct aggregate, one user-keyed window, one
    // small per-week rollup — the fact table shuffles once.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q306_growth_accounting",
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7 AS w
        |  FROM events),
        |mx AS (SELECT MAX(w) AS maxw FROM uw),
        |lagged AS (SELECT user_id, w,
        |    LAG(w) OVER (PARTITION BY user_id ORDER BY w) AS pw,
        |    LEAD(w) OVER (PARTITION BY user_id ORDER BY w) AS nw
        |  FROM uw),
        |states AS (
        |  SELECT w, CASE WHEN pw IS NULL THEN 'new'
        |    WHEN pw = w - 1 THEN 'retained'
        |    ELSE 'resurrected' END AS state
        |  FROM lagged
        |  UNION ALL
        |  SELECT w + 1, 'churned' FROM lagged CROSS JOIN mx
        |  WHERE (nw IS NULL OR nw > w + 1) AND w + 1 <= maxw)
        |SELECT w AS week, state, CAST(COUNT(*) AS BIGINT) AS n
        |FROM states GROUP BY w, state
        |ORDER BY week, state""".stripMargin) { (s, dir) =>
      val uw = Tables.load(s, dir, "events")
        .select(col("user_id"),
          (datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long")
            / 7L).cast("long").as("w"))
        .distinct()
      val maxw = uw.agg(max(col("w")).as("maxw"))
      val wUser = Window.partitionBy(col("user_id")).orderBy(col("w"))
      val lagged = uw
        .withColumn("pw", lag(col("w"), 1).over(wUser))
        .withColumn("nw", lead(col("w"), 1).over(wUser))
      val active = lagged.select(col("w"),
        when(col("pw").isNull, "new")
          .when(col("pw") === col("w") - 1, "retained")
          .otherwise("resurrected").as("state"))
      val churned = lagged
        .filter(col("nw").isNull || col("nw") > col("w") + 1)
        .crossJoin(broadcast(maxw))
        .filter(col("w") + 1 <= col("maxw"))
        .select((col("w") + 1).as("w"), lit("churned").as("state"))
      active.unionByName(churned)
        .groupBy(col("w").as("week"), col("state"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("week"), col("state"))
    },

    // ------------------------------------------------------------------
    // Hybrid retrieval via reciprocal-rank fusion: two independent
    // integer rankings per query doc — shared 3-token shingles and
    // shared distinct unigrams (both df-capped count-then-filter, the
    // SkewGuard shape) — fused as Σ 10⁹ div (60 + rank). Every score is
    // an exact integer; the query side prunes BEFORE the join. The RAG
    // stack's sparse+sparse fusion step, end-to-end hash-checkable.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q178_hybrid_rrf",
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s FROM toks),
        |shk AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 100),
        |shi AS (SELECT doc_id, s FROM sh JOIN shk USING (s)),
        |pa AS (SELECT a.doc_id AS q, b.doc_id AS c, COUNT(*) AS ov
        |  FROM shi a JOIN shi b ON a.s = b.s AND b.doc_id <> a.doc_id
        |  WHERE a.doc_id < 5 GROUP BY 1, 2),
        |ra AS (SELECT q, c,
        |    ROW_NUMBER() OVER (PARTITION BY q ORDER BY ov DESC, c) AS r
        |  FROM pa),
        |tg AS (SELECT doc_id, unnest(list_distinct(t)) AS w FROM toks),
        |tk AS (SELECT w FROM tg GROUP BY w HAVING COUNT(*) <= 100),
        |ti AS (SELECT doc_id, w FROM tg JOIN tk USING (w)),
        |pb AS (SELECT a.doc_id AS q, b.doc_id AS c, COUNT(*) AS ov
        |  FROM ti a JOIN ti b ON a.w = b.w AND b.doc_id <> a.doc_id
        |  WHERE a.doc_id < 5 GROUP BY 1, 2),
        |rb AS (SELECT q, c,
        |    ROW_NUMBER() OVER (PARTITION BY q ORDER BY ov DESC, c) AS r
        |  FROM pb),
        |u AS (SELECT q, c, r FROM ra UNION ALL SELECT q, c, r FROM rb),
        |f AS (SELECT q, c, CAST(SUM(
        |    (1000000000 - 1000000000 % (60 + r)) / (60 + r)) AS BIGINT)
        |    AS score FROM u GROUP BY 1, 2),
        |rk AS (SELECT q, c, score, ROW_NUMBER() OVER (PARTITION BY q
        |    ORDER BY score DESC, c) AS rank FROM f)
        |SELECT q AS doc_id, c AS similar_doc, score, CAST(rank AS INT) AS rank
        |FROM rk WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
      import graft.operators.TextOps
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))

      // one ranked signal: postings → df cap → query-side join → rank
      def ranked(inv: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        val keep = inv.groupBy(col("f")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 100).select(col("f"))
        val kept = inv.join(broadcast(keep), "f")
        val qSide = kept.filter(col("doc_id") < 5)
          .select(col("f"), col("doc_id").as("q"))
        val pairs = qSide.join(kept.withColumnRenamed("doc_id", "c"), "f")
          .filter(col("c") =!= col("q"))
          .groupBy(col("q"), col("c")).agg(count(lit(1)).as("ov"))
        val w = Window.partitionBy(col("q"))
          .orderBy(col("ov").desc, col("c"))
        pairs.withColumn("r", row_number().over(w)).select("q", "c", "r")
      }

      val byShingle = ranked(toks.select(col("doc_id"),
        explode(array_distinct(TextOps.shingles(col("t")))).as("f")))
      val byToken = ranked(toks.select(col("doc_id"),
        explode(array_distinct(col("t"))).as("f")))
      val fused = byShingle.unionAll(byToken)
        .groupBy(col("q"), col("c"))
        .agg(sum(expr("1000000000L div (60 + r)")).as("score"))
      val w = Window.partitionBy(col("q"))
        .orderBy(col("score").desc, col("c"))
      fused.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q").as("doc_id"), col("c").as("similar_doc"),
          col("score"), col("rank").cast("int").as("rank"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // ------------------------------------------------------------------
    // Gopher-style composite quality rules, per source: word count,
    // mean word length (as exact 3·n ≤ Σlen ≤ 10·n integer bounds),
    // stopword presence, alphabetic-token ratio (5·alpha ≥ 4·n) — the
    // MassiveText repetition-free subset of rules, all map-side over
    // one scan, counted with FILTER aggregates.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q179_gopher_rules",
      """WITH d AS (SELECT source,
        |    string_split_regex(trim(text), '\s+') AS t FROM documents),
        |m AS (SELECT source, len(t) AS nw,
        |    list_sum(list_transform(t, x -> len(x))) AS cw,
        |    len(list_filter(t, x -> x = 'the' OR x = 'a' OR x = 'of'
        |      OR x = 'and' OR x = 'to' OR x = 'in')) AS stops,
        |    len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha
        |  FROM d)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) FILTER (WHERE nw BETWEEN 50 AND 100000) AS BIGINT)
        |    AS pass_words,
        |  CAST(COUNT(*) FILTER (WHERE 3 * nw <= cw AND cw <= 10 * nw)
        |    AS BIGINT) AS pass_wordlen,
        |  CAST(COUNT(*) FILTER (WHERE stops >= 2) AS BIGINT) AS pass_stop,
        |  CAST(COUNT(*) FILTER (WHERE 5 * alpha >= 4 * nw) AS BIGINT)
        |    AS pass_alpha,
        |  CAST(COUNT(*) FILTER (WHERE nw BETWEEN 50 AND 100000
        |    AND 3 * nw <= cw AND cw <= 10 * nw AND stops >= 2
        |    AND 5 * alpha >= 4 * nw) AS BIGINT) AS pass_all
        |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.operators.TextOps
      val m = Tables.load(s, dir, "documents")
        .select(col("source"), TextOps.tokens(col("text")).as("t"))
        .select(col("source"),
          size(col("t")).cast("long").as("nw"),
          aggregate(transform(col("t"), x => length(x).cast("long")),
            lit(0L), (a, b) => a + b).as("cw"),
          TextOps.stopwordHits(col("t")).cast("long").as("stops"),
          size(filter(col("t"), x => x.rlike("[a-zA-Z]")))
            .cast("long").as("alpha"))
      val wordsOk = col("nw").between(50L, 100000L)
      val lenOk = lit(3L) * col("nw") <= col("cw") &&
        col("cw") <= lit(10L) * col("nw")
      val stopOk = col("stops") >= 2L
      val alphaOk = lit(5L) * col("alpha") >= lit(4L) * col("nw")
      m.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(wordsOk, 1)).as("pass_words"),
          count(when(lenOk, 1)).as("pass_wordlen"),
          count(when(stopOk, 1)).as("pass_stop"),
          count(when(alphaOk, 1)).as("pass_alpha"),
          count(when(wordsOk && lenOk && stopOk && alphaOk, 1)).as("pass_all"))
        .orderBy(col("source"))
    },

    // ------------------------------------------------------------------
    // Per-source percentile normalization (score calibration): each
    // document's length rank within its source, scaled to exact-integer
    // ppm of the [0, n−1] rank span — the cross-source score calibration
    // step before mixture sampling. One source-keyed shuffle.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q180_score_normalize",
      """WITH r AS (SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source,
        |  CAST(((rn - 1) * 1000000 - ((rn - 1) * 1000000) % GREATEST(n - 1, 1))
        |    / GREATEST(n - 1, 1) AS BIGINT) AS pct_ppm
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          row_number().over(w).cast("long").as("rn"),
          count(lit(1)).over(Window.partitionBy(col("source"))).as("n"))
        .select(col("doc_id"), col("source"),
          expr("((rn - 1) * 1000000L) div greatest(n - 1, 1L)").as("pct_ppm"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // Referential-integrity audit: orphan counts per foreign key in one
    // result — anti-joins, small dimensions broadcast, the fact side
    // never collected. The warehouse data-quality gate.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q182_fk_audit",
      """SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS orphans
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p
        |                  WHERE p.p_partkey = l.l_partkey)
        |UNION ALL
        |SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM supplier s
        |                  WHERE s.s_suppkey = l.l_suppkey)
        |UNION ALL
        |SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT) FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                  WHERE c.c_custkey = o.o_custkey)
        |ORDER BY fk""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      def audit(fact: org.apache.spark.sql.DataFrame, fk: Column,
          dim: org.apache.spark.sql.DataFrame, pk: Column, tag: String) =
        fact.join(broadcast(dim), fk === pk, "left_anti")
          .agg(count(lit(1)).as("orphans"))
          .select(lit(tag).as("fk"), col("orphans"))
      audit(li, col("l_orderkey"),
          o.select(col("o_orderkey")), col("o_orderkey"), "lineitem->orders")
        .unionAll(audit(li, col("l_partkey"),
          Tables.load(s, dir, "part").select(col("p_partkey")),
          col("p_partkey"), "lineitem->part"))
        .unionAll(audit(li, col("l_suppkey"),
          Tables.load(s, dir, "supplier").select(col("s_suppkey")),
          col("s_suppkey"), "lineitem->supplier"))
        .unionAll(audit(o, col("o_custkey"),
          Tables.load(s, dir, "customer").select(col("c_custkey")),
          col("c_custkey"), "orders->customer"))
        .orderBy(col("fk"))
    },

    // ------------------------------------------------------------------
    // Unigram "commonness" score — the cheap LM-proxy quality signal:
    // mean document frequency of a doc's distinct tokens, in exact
    // integer ppm of the corpus size. Two shuffles (token df, per-doc
    // sum); the df side is corpus-bounded vocabulary, not documents.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q183_lm_commonness",
      """WITH toks AS (SELECT doc_id, unnest(list_distinct(
        |    string_split_regex(trim(text), '\s+'))) AS w FROM documents),
        |df AS (SELECT w, COUNT(*) AS df FROM toks GROUP BY w),
        |nd AS (SELECT COUNT(*) AS n FROM documents),
        |sc AS (SELECT t.doc_id, SUM(d.df) AS s, COUNT(*) AS k
        |  FROM toks t JOIN df d ON d.w = t.w GROUP BY t.doc_id)
        |SELECT doc_id, CAST(s AS BIGINT) AS df_sum,
        |  CAST((s * 1000000 - (s * 1000000) % (k * (SELECT n FROM nd)))
        |    / (k * (SELECT n FROM nd)) AS BIGINT) AS commonness_ppm
        |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.TextOps
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("w"))
      val df = toks.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val nd = Tables.load(s, dir, "documents")
        .agg(count(lit(1)).as("n"))
      toks.join(df, "w")
        .groupBy(col("doc_id"))
        .agg(sum(col("df")).as("s"), count(lit(1)).as("k"))
        .crossJoin(broadcast(nd))
        .select(col("doc_id"), col("s").as("df_sum"),
          expr("(s * 1000000L) div (k * n)").as("commonness_ppm"))
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // MAD robust anomaly screen: median absolute deviation per group in
    // exact integer cents (rank-statistic medians — no floats anywhere),
    // anomalies = |x − med| > 3·MAD. The outlier gate z-scores get wrong
    // on heavy-tailed data. Two ranking passes on the same group key.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q184_mad_anomalies",
      s"""WITH t AS (SELECT o_orderpriority AS g,
         |    CAST(CAST(o_totalprice AS $M) * 100 AS BIGINT) AS v FROM orders),
         |m AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
         |    COUNT(*) OVER (PARTITION BY g) AS n FROM t),
         |med AS (SELECT g, MAX(CASE WHEN rn = (n + 1 - ((n + 1) % 2)) / 2
         |    THEN v END) AS med FROM m GROUP BY g),
         |d AS (SELECT t.g, ABS(v - med) AS av FROM t JOIN med USING (g)),
         |m2 AS (SELECT g, av, ROW_NUMBER() OVER (PARTITION BY g ORDER BY av) AS rn,
         |    COUNT(*) OVER (PARTITION BY g) AS n FROM d),
         |mad AS (SELECT g, MAX(CASE WHEN rn = (n + 1 - ((n + 1) % 2)) / 2
         |    THEN av END) AS mad FROM m2 GROUP BY g)
         |SELECT t.g AS o_orderpriority, med, mad,
         |  CAST(COUNT(*) FILTER (WHERE ABS(v - med) > 3 * mad) AS BIGINT)
         |    AS n_anomalies
         |FROM t JOIN med USING (g) JOIN mad USING (g)
         |GROUP BY 1, med, mad ORDER BY 1""".stripMargin) { (s, dir) =>
      val t = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("g"),
          (money(col("o_totalprice")) * 100).cast("long").as("v"))
      def medianOf(df: org.apache.spark.sql.DataFrame, c: String,
          out: String) = {
        val w = Window.partitionBy(col("g")).orderBy(col(c))
        val wn = Window.partitionBy(col("g"))
        df.withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wn))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("g"), col(c).as(out))
      }
      val med = medianOf(t, "v", "med")
      val d = t.join(broadcast(med), "g")
        .select(col("g"), abs(col("v") - col("med")).as("av"))
      val mad = medianOf(d, "av", "mad")
      t.join(broadcast(med), "g").join(broadcast(mad), "g")
        .groupBy(col("g").as("o_orderpriority"), col("med"), col("mad"))
        .agg(count(when(abs(col("v") - col("med")) > lit(3) * col("mad"), 1))
          .as("n_anomalies"))
        .select(col("o_orderpriority"), col("med"), col("mad"),
          col("n_anomalies"))
        .orderBy(col("o_orderpriority"))
    },

    // ------------------------------------------------------------------
    // Top-k 3-step behavioral paths: LEAD×2 over each user's timeline,
    // path counts, global top-10 with a total order. One user-keyed
    // shuffle + a 10-row TakeOrdered — never a global sort.
    // ------------------------------------------------------------------
    QueryDef.sqlBacked(
      "q185_path_topk",
      """WITH s AS (SELECT event_type AS e1,
        |    LEAD(event_type, 1) OVER w AS e2,
        |    LEAD(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
        |  FROM s WHERE e3 IS NOT NULL GROUP BY 1)
        |SELECT path, CAST(n AS BIGINT) AS n FROM p
        |ORDER BY n DESC, path LIMIT 10""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    },

    // Quality-weighted per-domain selection (the training-mixture
    // budget cut: keep the best K docs of every source). Quality is an
    // integer type-token proxy (3·distinct − total tokens), ranked per
    // source with a doc_id tie-break — one source-keyed window, no
    // global sort, the canonical 100 TB top-k-per-group shape.
    QueryDef.sqlBacked(
      "q233_quality_topk",
      """WITH q AS (
        |  SELECT doc_id, source,
        |    3 * CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
        |      AS BIGINT)
        |      - CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS quality
        |  FROM documents),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |        ORDER BY quality DESC, doc_id) AS rn FROM q)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(doc_id) AS BIGINT) AS kept_ids,
        |  CAST(MIN(quality) AS BIGINT) AS worst_kept
        |FROM r WHERE rn <= 5
        |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val toks = graft.operators.TextOps.tokens(col("text"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          (lit(3) * size(array_distinct(toks)).cast("long") -
            size(toks).cast("long")).as("quality"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("kept_ids"),
          min(col("quality")).cast("long").as("worst_kept"))
        .orderBy(col("source"))
    },

    // Half-life-decayed engagement value, INTEGER-EXACT: each event
    // contributes floor(cents / 2^age_days) (age capped at 40 so the
    // power stays a dyadic double both engines compute identically —
    // no transcendental exp() whose last ulp could differ). One scan,
    // one broadcastable 1-row max, one group-keyed aggregate.
    QueryDef.sqlBacked(
      "q234_decayed_value",
      """WITH m AS (SELECT MAX(ts) AS mts FROM events),
        |d AS (
        |  SELECT user_id % 50 AS grp,
        |    CAST(FLOOR(CAST(FLOOR(value * 100) AS BIGINT)
        |      / POW(2, LEAST(date_diff('day', CAST(ts AS DATE),
        |          CAST(mts AS DATE)), 40))) AS BIGINT) AS dv
        |  FROM events, m)
        |SELECT CAST(grp AS BIGINT) AS grp,
        |  CAST(SUM(dv) AS BIGINT) AS decayed_cents,
        |  CAST(COUNT(*) FILTER (WHERE dv > 0) AS BIGINT) AS n_live
        |FROM d GROUP BY grp ORDER BY grp""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val m = ev.agg(max(col("ts")).as("mts"))
      ev.crossJoin(broadcast(m))
        .select((col("user_id") % 50).as("grp"),
          floor(floor(col("value") * 100).cast("long") /
            pow(lit(2.0), least(
              datediff(to_date(col("mts")), to_date(col("ts"))), lit(40))))
            .cast("long").as("dv"))
        .groupBy(col("grp"))
        .agg(sum(col("dv")).cast("long").as("decayed_cents"),
          count(when(col("dv") > 0, 1)).as("n_live"))
        .orderBy(col("grp"))
    },

    // BM25 ranked retrieval, INTEGER-EXACT: Okapi BM25 (k1=1.2, b=0.75)
    // with the log dropped from the idf — the rational Robertson idf
    // (N−df+½)/(df+½) is a monotone-in-df variant whose every factor is
    // an integer ratio, so the whole score is exact wide-integer
    // arithmetic — DECIMAL(38,0)/HUGEINT where products pass int64 —
    // and both engines agree to the last ppm (the q183 convention; a
    // transcendental ln's last ulp could flip a rank boundary). Clearing
    // denominators with avgdl = L/N:
    //   tfpart = 22·L·tf / (10·L·tf + 3·L + 9·dl·N)
    //   idf    = (2N − 2df + 1) / (2df + 1)
    // Shape at scale: one token scan, a 3-row df frame and a 1-row
    // totals frame broadcast, one doc-keyed aggregate, global top-25.
    QueryDef.sqlBacked(
      "q238_bm25_retrieval",
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        |tot AS (SELECT (SELECT COUNT(*) FROM toks) AS tl,
        |  (SELECT COUNT(*) FROM documents) AS nd),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
        |  WHERE w IN ('vector', 'window', 'spark') GROUP BY doc_id, w),
        |dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
        |contrib AS (
        |  SELECT t.doc_id,
        |    CAST((CAST(22 AS HUGEINT) * tot.tl * t.tf
        |        * (2 * tot.nd - 2 * d.df + 1) * 1000000)
        |      // ((CAST(10 AS HUGEINT) * tot.tl * t.tf + 3 * tot.tl
        |          + 9 * l.dl * tot.nd)
        |         * (2 * d.df + 1)) AS BIGINT) AS c
        |  FROM tf t JOIN dfreq d USING (w) JOIN dl l USING (doc_id)
        |    CROSS JOIN tot)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_ppm
        |FROM contrib GROUP BY doc_id
        |ORDER BY score_ppm DESC, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
      import graft.operators.TextOps
      val docs = Tables.load(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("w"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val tot = toks.agg(count(lit(1)).as("tl"))
        .crossJoin(docs.agg(count(lit(1)).as("nd")))
      val tf = toks.filter(col("w").isin("vector", "window", "spark"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      // the numerator reaches 22·L·tf·2N·10⁶ — past int64 for corpora
      // beyond ~10⁶ tokens × 10⁴ docs — so the products run in
      // DECIMAL(38,0) (HUGEINT on the oracle side, the q251 pattern)
      tf.join(broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          expr("CAST((CAST(22 AS DECIMAL(38,0)) * tl * tf * " +
            "(2L * nd - 2L * df + 1L) * 1000000L) div " +
            "((CAST(10 AS DECIMAL(38,0)) * tl * tf + 3L * tl + " +
            "9L * dl * nd) * (2L * df + 1L)) AS BIGINT)")
            .as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).cast("long").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("doc_id"))
        .limit(25)
    },

    // 4-core decomposition (iterated peeling, operators/KCore): the
    // orders-derived graph converges in 6 rounds at sf0.01; the oracle
    // unrolls 10 identical peel rounds as CTEs (extra rounds are no-ops
    // once converged), so the survivor set is value-checked end to end.
    // Scale shape per round: one degree aggregate on the a-partitioned
    // cached edge frame + two vertex-keyed semi-joins — node frames are
    // never force-broadcast (AQE places them), and non-convergence past
    // the round cap throws rather than spinning.
    QueryDef.sqlBacked(
      "q241_kcore",
      {
        // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
        // each peel level references its predecessor three times —
        // 3^rounds base scans without it (observed as an fd exhaustion)
        val rounds = 10
        val peel = (1 to rounds).map { i =>
          s"""n$i AS MATERIALIZED (SELECT a AS v FROM s${i - 1} GROUP BY a
             |  HAVING COUNT(*) >= 4),
             |s$i AS MATERIALIZED (SELECT s.a, s.b FROM s${i - 1} s
             |  JOIN n$i x ON s.a = x.v JOIN n$i y ON s.b = y.v)""".stripMargin
        }.mkString(",\n")
        s"""WITH e0 AS MATERIALIZED (
           |  SELECT a, b FROM (
           |    SELECT DISTINCT least(o_orderkey % 5000, o_custkey % 5000) AS a,
           |      greatest(o_orderkey % 5000, o_custkey % 5000) AS b
           |    FROM orders) WHERE a <> b),
           |s0 AS MATERIALIZED (
           |  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
           |$peel
           |SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS core_vertices,
           |  CAST(COALESCE(SUM(DISTINCT a), 0) AS BIGINT) AS id_sum,
           |  CAST(COUNT(*) // 2 AS BIGINT) AS core_edges,
           |  TRUE AS oracle_rounds_cover
           |FROM s$rounds""".stripMargin
      }) { (s, dir) =>
      val edges = Tables.load(s, dir, "orders")
        .select((col("o_orderkey") % 5000).as("a"),
          (col("o_custkey") % 5000).as("b"))
      // a fixture needing MORE peel rounds than the oracle unrolls must
      // flip this boolean and fail loudly, not mismatch mysteriously
      val (core, rounds) =
        graft.operators.KCore.coreWithRounds(s, edges, k = 4)
      core.agg(countDistinct(col("a")).as("core_vertices"),
          coalesce(sum_distinct(col("a")), lit(0L)).cast("long").as("id_sum"),
          (count(lit(1)).cast("long") / 2).cast("long").as("core_edges"))
        .withColumn("oracle_rounds_cover", lit(rounds <= 10))
    },

    // Semi-supervised label propagation (operators/LabelProp): every
    // 10th vertex is seeded with label v%3, then 4 deterministic
    // spreading rounds — mode of labeled neighbors, ties to the
    // smallest label, seeds clamped. The oracle unrolls the identical
    // rounds as MATERIALIZED CTEs, so the converged label assignment
    // is value-checked, not just shape-checked (classic async LPA is
    // run-order dependent and could never be).
    QueryDef.sqlBacked(
      "q244_label_propagation",
      {
        val rounds = 4
        val peel = (1 to rounds).map { i =>
          s"""c$i AS MATERIALIZED (
             |  SELECT e.a AS v, l.lab, COUNT(*) AS c
             |  FROM sym e JOIN l${i - 1} l ON l.v = e.b GROUP BY e.a, l.lab),
             |p$i AS MATERIALIZED (
             |  SELECT v, lab FROM (SELECT v, lab,
             |    ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lab)
             |      AS rn FROM c$i)
             |  WHERE rn = 1),
             |l$i AS MATERIALIZED (
             |  SELECT v, lab FROM l0
             |  UNION ALL SELECT v, lab FROM p$i WHERE v % 10 <> 0)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH e0 AS MATERIALIZED (
           |  SELECT a, b FROM (
           |    SELECT DISTINCT least(o_orderkey % 3000, o_custkey % 3000) AS a,
           |      greatest(o_orderkey % 3000, o_custkey % 3000) AS b
           |    FROM orders) WHERE a <> b),
           |sym AS MATERIALIZED (
           |  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
           |verts AS MATERIALIZED (SELECT DISTINCT a AS v FROM sym),
           |l0 AS MATERIALIZED (
           |  SELECT v, v % 3 AS lab FROM verts WHERE v % 10 = 0),
           |$peel
           |SELECT CAST(lab AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(v) AS BIGINT) AS id_sum
           |FROM l$rounds GROUP BY lab ORDER BY label""".stripMargin
      }) { (s, dir) =>
      val edges = Tables.load(s, dir, "orders")
        .select((col("o_orderkey") % 3000).as("a"),
          (col("o_custkey") % 3000).as("b"))
      val verts = edges
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b"))
        .select(explode(array(col("a"), col("b"))).as("v"))
        .distinct()
      val seeds = verts.filter(col("v") % 10 === 0)
        .select(col("v"), (col("v") % 3).as("lab"))
      graft.operators.LabelProp.spread(s, edges, seeds, rounds = 4)
        .groupBy(col("lab").cast("long").as("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("long").as("id_sum"))
        .orderBy(col("label"))
    },

    // Retrieval through the PERSISTED inverted index (operators/
    // TextIndex): the index table is built over half the corpus and
    // incrementally REFRESHED with the rest (high-water = the index's
    // own max doc_id, a stats-only aggregate), then MLT retrieval joins
    // the index — never re-shingling the corpus. The oracle recomputes
    // the same df-capped top-3 directly from documents, so index build,
    // refresh, AND query are all under the driver hash at once.
    QueryDef.sqlBacked(
      "q246_text_index_retrieval",
      """WITH sh AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sg
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |        FROM documents)),
        |inv AS (SELECT doc_id, unnest(sg) AS s FROM sh),
        |keep AS (SELECT s FROM inv GROUP BY s HAVING COUNT(*) <= 100),
        |ki AS (SELECT i.doc_id, i.s FROM inv i JOIN keep USING (s)),
        |pairs AS (SELECT a.doc_id AS q_doc, b.doc_id AS match_doc,
        |    COUNT(*) AS shared
        |  FROM ki a JOIN ki b USING (s)
        |  WHERE a.doc_id % 100 = 0 AND b.doc_id <> a.doc_id
        |  GROUP BY 1, 2),
        |r AS (SELECT q_doc, match_doc, shared, ROW_NUMBER() OVER (
        |    PARTITION BY q_doc ORDER BY shared DESC, match_doc) AS rn
        |  FROM pairs)
        |SELECT CAST(q_doc AS BIGINT) AS q_doc,
        |  CAST(match_doc AS BIGINT) AS match_doc,
        |  CAST(shared AS BIGINT) AS shared
        |FROM r WHERE rn <= 3
        |ORDER BY q_doc, shared DESC, match_doc""".stripMargin) { (s, dir) =>
      import graft.operators.TextIndex
      val docs = Tables.load(s, dir, "documents")
      val idx = s"target/fixtures/tix_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      if (TextIndex.versions(s, idx) != Seq(0L, 1L)) {
        val fs = new org.apache.hadoop.fs.Path(idx)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(idx), true)
        val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
        TextIndex.build(s, docs.filter(col("doc_id") <= mid), idx)
        TextIndex.refresh(s, docs, idx) // appends only doc_id > mid
      }
      TextIndex.similar(s, idx,
          docs.filter(col("doc_id") % 100 === 0).select(col("doc_id")))
        .orderBy(col("q_doc"), col("shared").desc, col("match_doc"))
    },

    // Hop-bounded reachability through Spark 4's RECURSIVE CTE (the
    // UnionLoop plan — SQL-standard iteration the engine executes
    // natively, completing the graph family's SQL surface): both
    // engines run the IDENTICAL recursive text — seeds = vertices < 10,
    // expand ≤ 3 hops with a depth guard (UNION ALL recursion on a
    // cyclic graph MUST carry its own termination), distinct-count the
    // reach per seed. Sparse edges keep the path fan-out bounded.
    QueryDef.sqlBacked(
      "q255_recursive_reachability",
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT o_orderkey % 1000 AS a, o_custkey % 1000 AS b
        |    FROM orders WHERE o_orderkey % 20 = 0) WHERE a <> b),
        |sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
        |r(seed, node, d) AS (
        |  SELECT a, a, 0 FROM (SELECT DISTINCT a FROM sym WHERE a < 10)
        |  UNION ALL
        |  SELECT r.seed, sym.b, r.d + 1
        |  FROM r JOIN sym ON sym.a = r.node WHERE r.d < 3)
        |SELECT CAST(seed AS BIGINT) AS seed,
        |  CAST(COUNT(DISTINCT node) AS BIGINT) AS reach
        |FROM r GROUP BY seed ORDER BY seed""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("q255_orders")
      s.sql(
        """WITH RECURSIVE e AS (
          |  SELECT DISTINCT a, b FROM (
          |    SELECT o_orderkey % 1000 AS a, o_custkey % 1000 AS b
          |    FROM q255_orders WHERE o_orderkey % 20 = 0) WHERE a <> b),
          |sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
          |r(seed, node, d) AS (
          |  SELECT a, a, 0 FROM (SELECT DISTINCT a FROM sym WHERE a < 10)
          |  UNION ALL
          |  SELECT r.seed, sym.b, r.d + 1
          |  FROM r JOIN sym ON sym.a = r.node WHERE r.d < 3)
          |SELECT CAST(seed AS BIGINT) AS seed,
          |  CAST(COUNT(DISTINCT node) AS BIGINT) AS reach
          |FROM r GROUP BY seed ORDER BY seed""".stripMargin)
    },

    // Correlated LATERAL top-k (the SQL-standard spelling of q11's
    // window top-k): per region, the top-3 account balances via a
    // correlated ORDER BY ... LIMIT subquery Catalyst decorrelates —
    // DuckDB runs the identical text shape. Ties break on c_name so
    // the rank boundary is deterministic in both engines.
    QueryDef.sqlBacked(
      "q256_lateral_topk",
      """SELECT r.r_name, l.c_name, l.bal_cents
        |FROM region r, LATERAL (
        |  SELECT c_name, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  ORDER BY bal_cents DESC, c_name LIMIT 3) l
        |ORDER BY r.r_name, l.bal_cents DESC, l.c_name""".stripMargin) {
      (s, dir) =>
        Tables.load(s, dir, "region").createOrReplaceTempView("q256_region")
        Tables.load(s, dir, "nation").createOrReplaceTempView("q256_nation")
        Tables.load(s, dir, "customer")
          .createOrReplaceTempView("q256_customer")
        s.sql(
          """SELECT r.r_name, l.c_name, l.bal_cents
            |FROM q256_region r, LATERAL (
            |  SELECT c_name,
            |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
            |  FROM q256_customer c
            |  JOIN q256_nation n ON n.n_nationkey = c.c_nationkey
            |  WHERE n.n_regionkey = r.r_regionkey
            |  ORDER BY bal_cents DESC, c_name LIMIT 3) l
            |ORDER BY r.r_name, l.bal_cents DESC, l.c_name""".stripMargin)
    },

    // BFS / shortest-hop distance over the supplier↔part bipartite
    // graph from a seed supplier set — the frontier-expansion shape
    // (Pregel BFS): each round is ONE distributed join frontier⋈edges.
    // Frontiers are NOT anti-joined against visited nodes — re-expansion
    // is bounded by the 4-round cap, and the final MIN(d) per node is
    // what enforces min-distance semantics (a node reached twice counts
    // once, at its first level); add the visited anti-join if the round
    // bound ever grows. Oracle: bounded recursive CTE with a
    // MATERIALIZED edge list (the memory-checklist convention) and
    // MIN(d) per node.
    QueryDef.sqlBacked(
      "q281_bfs_reach",
      """WITH RECURSIVE e2 AS MATERIALIZED (
        |  SELECT l_suppkey AS fn, 's' AS ft, l_partkey AS tn, 'p' AS tt
        |  FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
        |  UNION ALL
        |  SELECT l_partkey, 'p', l_suppkey, 's'
        |  FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)),
        |walk(node, typ, d) AS (
        |  SELECT s_suppkey, 's', 0 FROM supplier WHERE s_suppkey % 50 = 0
        |  UNION
        |  SELECT e2.tn, e2.tt, w.d + 1
        |  FROM walk w JOIN e2 ON e2.fn = w.node AND e2.ft = w.typ
        |  WHERE w.d < 4),
        |md AS (SELECT node, typ, MIN(d) AS dist FROM walk
        |  GROUP BY node, typ)
        |SELECT CAST(dist AS BIGINT) AS dist, typ,
        |  CAST(COUNT(*) AS BIGINT) AS nodes
        |FROM md GROUP BY dist, typ ORDER BY dist, typ""".stripMargin) {
      (s, dir) =>
      val e = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct().cache()
      val seeds = Tables.load(s, dir, "supplier")
        .filter(col("s_suppkey") % 50 === 0)
        .select(col("s_suppkey").as("node"), lit("s").as("typ"),
          lit(0).as("d"))
      var levels = Seq(seeds.cache())
      for (d <- 1 to 4) {
        val prev = levels.last
        val next =
          prev.filter(col("typ") === "s")
            .join(e, col("node") === col("s"))
            .select(col("p").as("node"), lit("p").as("typ"),
              lit(d).as("d"))
            .unionByName(
              prev.filter(col("typ") === "p")
                .join(e, col("node") === col("p"))
                .select(col("s").as("node"), lit("s").as("typ"),
                  lit(d).as("d")))
            .distinct()
        levels = levels :+ next.cache()
      }
      levels.reduce(_ unionByName _)
        .groupBy(col("node"), col("typ")).agg(min(col("d")).as("dist"))
        .groupBy(col("dist").cast("long").as("dist"), col("typ"))
        .agg(count(lit(1)).as("nodes"))
        .orderBy(col("dist"), col("typ"))
    },

    // RFM segmentation (recency / frequency / monetary quartiles) —
    // the classic CRM cut: each customer lands in an (r,f,m) cell via
    // NTILE(4) with a FULLY DETERMINISTIC order (metric, then custkey),
    // so both engines tie-break identically. One orders scan, one
    // customer-keyed aggregate, three DISTRIBUTED rank passes over the
    // customer-sized frame (never the fact table, never one task).
    QueryDef.sqlBacked(
      "q282_rfm_segments",
      """WITH cust AS (
        |  SELECT o_custkey,
        |    MAX(epoch_ms(o_orderdate)) AS last_ms,
        |    COUNT(*) AS freq,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT))
        |      AS cents
        |  FROM orders GROUP BY 1),
        |q AS (SELECT o_custkey,
        |    NTILE(4) OVER (ORDER BY last_ms DESC, o_custkey) AS r_q,
        |    NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
        |    NTILE(4) OVER (ORDER BY cents DESC, o_custkey) AS m_q
        |  FROM cust)
        |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
        |  CAST(m_q AS BIGINT) AS m_q, CAST(COUNT(*) AS BIGINT) AS customers
        |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        // o_orderdate loads as TIMESTAMP_NTZ; the session is pinned UTC,
        // so the cast matches DuckDB's epoch_ms of the naive timestamp
        .agg(max(unix_millis(col("o_orderdate").cast("timestamp")))
          .as("last_ms"),
          count(lit(1)).as("freq"),
          sum((col("o_totalprice").cast(DecimalType(15, 2)) * 100)
            .cast("long")).as("cents"))
        .persist() // three rank passes; released via eager checkpoint
      val n = cust.count()
      import graft.operators.DistributedOrder
      // NTILE via distributed global rank (q161's rationale): three
      // unpartitioned window sorts would each run in ONE task
      def q(out: String, metric: Column): org.apache.spark.sql.DataFrame =
        DistributedOrder.withRank(cust, "_r", metric.desc, col("o_custkey"))
          .select(col("o_custkey"),
            DistributedOrder.ntileFromRank("_r", n, 4).cast("long").as(out))
      val res = q("r_q", col("last_ms"))
        .join(q("f_q", col("freq")), "o_custkey")
        .join(q("m_q", col("cents")), "o_custkey")
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("customers"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
      try res.localCheckpoint(eager = true) finally cust.unpersist()
    },

    // Market-basket affinity: within-order part pairs with ALL-INTEGER
    // lift in ppm — lift = P(a∧b)/(P(a)·P(b)) becomes
    // co·n_orders·10⁶ ÷ (c_a·c_b), positive integer division, so the
    // ranking cannot drift between engines. The pair join is per-order
    // (bounded by lines-per-order, not table size); top pairs by
    // support with a full deterministic tie-break.
    QueryDef.sqlBacked(
      "q283_basket_affinity",
      """WITH lines AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT l_orderkey) AS orders FROM lines),
        |cnt AS (SELECT l_partkey, COUNT(*) AS c FROM lines GROUP BY 1),
        |pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |    COUNT(*) AS co
        |  FROM lines a JOIN lines b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)
        |SELECT pa, pb, CAST(co AS BIGINT) AS co,
        |  CAST(co * (SELECT orders FROM n) * 1000000
        |    // (ca.c * cb.c) AS BIGINT) AS lift_ppm
        |FROM pairs JOIN cnt ca ON ca.l_partkey = pa
        |  JOIN cnt cb ON cb.l_partkey = pb
        |ORDER BY co DESC, pa, pb LIMIT 15""".stripMargin) { (s, dir) =>
      val lines = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct().cache()
      val nOrders = lines.select(col("l_orderkey")).distinct().count()
      val cnt = lines.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      val pairs = lines.as("a").join(lines.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .agg(count(lit(1)).as("co"))
      pairs
        .join(broadcast(cnt.select(col("l_partkey").as("pa"),
          col("c").as("ca"))), "pa")
        .join(broadcast(cnt.select(col("l_partkey").as("pb"),
          col("c").as("cb"))), "pb")
        .select(col("pa"), col("pb"), col("co"),
          expr(s"CAST(co * ${nOrders}L * 1000000 DIV (ca * cb) AS BIGINT)")
            .as("lift_ppm"))
        .orderBy(col("co").desc, col("pa"), col("pb")).limit(15)
    },

    // Data-quality expectations audit (operators.Expectations): the
    // DRY-RUN counterpart of CHECK constraints — per expectation, how
    // many rows violate (predicate exactly FALSE; NULL passes, SQL
    // CHECK semantics), in ppm. ALL expectations audit in ONE aggregate
    // scan (k conditional counts fused into one partial agg) — cost is
    // one table pass no matter how many expectations ride along.
    QueryDef.sqlBacked(
      "q318_expectations_audit",
      """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem)
        |SELECT expectation, n_rows, n_violations,
        |  CAST(n_violations * 1000000 // n_rows AS BIGINT) AS violation_ppm
        |FROM (
        |  SELECT 'discount_le_5pct' AS expectation, n_rows,
        |    (SELECT CAST(COUNT(*) FILTER (NOT (l_discount <= 0.05))
        |       AS BIGINT) FROM lineitem) AS n_violations FROM n
        |  UNION ALL
        |  SELECT 'positive_price', n_rows,
        |    (SELECT COUNT(*) FILTER (NOT (l_extendedprice > 0))
        |     FROM lineitem) FROM n
        |  UNION ALL
        |  SELECT 'qty_le_30', n_rows,
        |    (SELECT COUNT(*) FILTER (NOT (l_quantity <= 30))
        |     FROM lineitem) FROM n
        |  UNION ALL
        |  SELECT 'tax_lt_discount', n_rows,
        |    (SELECT COUNT(*) FILTER (NOT (l_tax < l_discount))
        |     FROM lineitem) FROM n
        |) ORDER BY expectation""".stripMargin) { (s, dir) =>
      graft.operators.Expectations.audit(
        Tables.load(s, dir, "lineitem"),
        Seq(
          "discount_le_5pct" -> "l_discount <= 0.05",
          "positive_price" -> "l_extendedprice > 0",
          "qty_le_30" -> "l_quantity <= 30",
          "tax_lt_discount" -> "l_tax < l_discount"))
    },

    // Skyline / Pareto frontier (cheapest-and-smallest parts): points
    // no other point dominates on (price, size) — multi-objective
    // selection, the catalog's "efficient frontier". DISTRIBUTED via
    // order statistics, not the quadratic NOT-EXISTS self-join the
    // oracle uses: per price the min size (one shuffle over the
    // price-distinct frame), then DistributedOrder.withPrefixMin gives
    // each price the min size over all STRICTLY CHEAPER prices — a
    // point is on the frontier iff it IS its price's min and beats
    // that exclusive prefix min. Exact, including tie semantics
    // (equal (price, size) points don't dominate each other).
    QueryDef.sqlBacked(
      "q319_pareto_frontier",
      """WITH pt AS (SELECT CAST(FLOOR(p_retailprice * 100) AS BIGINT)
        |    AS price_cents, p_size AS size FROM part),
        |g AS (SELECT price_cents, size, CAST(COUNT(*) AS BIGINT) AS n_parts
        |      FROM pt GROUP BY 1, 2)
        |SELECT price_cents, CAST(size AS BIGINT) AS size, n_parts
        |FROM g p
        |WHERE NOT EXISTS (SELECT 1 FROM g q
        |  WHERE q.price_cents <= p.price_cents AND q.size <= p.size
        |    AND (q.price_cents < p.price_cents OR q.size < p.size))
        |ORDER BY price_cents""".stripMargin) { (s, dir) =>
      val pts = Tables.load(s, dir, "part")
        .select(floor(col("p_retailprice") * 100).cast("long")
          .as("price_cents"), col("p_size").cast("long").as("size"))
        .groupBy(col("price_cents"), col("size"))
        .agg(count(lit(1)).as("n_parts"))
      val perPrice = pts.groupBy(col("price_cents"))
        .agg(min(col("size")).as("mn"))
      val frontier = graft.operators.DistributedOrder
        .withPrefixMin(perPrice, "cheaper_min", col("mn"),
          col("price_cents"))
        .filter(col("mn") < col("cheaper_min"))
        .select(col("price_cents"), col("mn"))
      pts.join(frontier,
          pts("price_cents") === frontier("price_cents") &&
            pts("size") === frontier("mn"))
        .select(pts("price_cents"), col("size"), col("n_parts"))
        .orderBy(col("price_cents"))
    },

    // Distribution drift between two corpus snapshots (train-refresh
    // monitoring): per language, a symmetric chi-square-style distance
    // between the reference half and the candidate half over
    // length-bucket cells — Σ (p−q)²/(p+q) with p=r/R, q=c/C, folded
    // to the integer form (rC−cR)²·10¹² / (RC·(rC+cR)) per cell and
    // summed after per-term floor division, in 128-bit integers, so
    // the statistic is bit-identical across engines (a float ln-based
    // PSI would hash-drift). One aggregate over (lang, bucket) cells
    // (corpus-scan cost), then arithmetic on the tiny cell frame.
    QueryDef.sqlBacked(
      "q320_distribution_drift",
      """WITH d AS (SELECT lang, n_chars // 100 AS b, doc_id % 2 = 0 AS ref
        |  FROM documents),
        |cell AS (SELECT lang, b,
        |    CAST(COUNT(*) FILTER (ref) AS BIGINT) AS r,
        |    CAST(COUNT(*) FILTER (NOT ref) AS BIGINT) AS c
        |  FROM d GROUP BY 1, 2),
        |tot AS (SELECT lang, SUM(r) AS rn, SUM(c) AS cn FROM cell
        |        GROUP BY 1)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  CAST(MAX(rn) AS BIGINT) AS ref_n,
        |  CAST(MAX(cn) AS BIGINT) AS cand_n,
        |  CAST(SUM(
        |    (CAST(r * cn - c * rn AS HUGEINT) * (r * cn - c * rn)
        |       * 1000000000000)
        |    // (CAST(rn AS HUGEINT) * cn * (r * cn + c * rn))
        |  ) AS BIGINT) AS chi2_e12
        |FROM cell JOIN tot USING (lang)
        |WHERE rn > 0 AND cn > 0
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val cell = Tables.load(s, dir, "documents")
        .select(col("lang"), (col("n_chars") / 100).cast("long").as("b"),
          (col("doc_id") % 2 === 0).as("ref"))
        .groupBy(col("lang"), col("b"))
        .agg(count(when(col("ref"), 1)).as("r"),
          count(when(!col("ref"), 1)).as("c"))
      val tot = cell.groupBy(col("lang"))
        .agg(sum(col("r")).as("rn"), sum(col("c")).as("cn"))
      cell.join(broadcast(tot), "lang")
        .filter(col("rn") > 0 && col("cn") > 0)
        .select(col("lang"), col("r"), col("c"),
          col("rn"), col("cn"),
          expr("""CAST(r * cn - c * rn AS DECIMAL(38,0))
                 |  * (r * cn - c * rn) * 1000000000000""".stripMargin)
            .as("num"),
          (col("rn").cast(big) * col("cn") *
            (col("r") * col("cn") + col("c") * col("rn"))).as("den"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_buckets"),
          max(col("rn")).as("ref_n"),
          max(col("cn")).as("cand_n"),
          sum(expr("num DIV den")).cast("long").as("chi2_e12"))
        .orderBy(col("lang"))
    },

    // Winsorized (clipped) revenue: order totals clamped at the exact
    // per-priority p05/p95 ORDER STATISTICS before summing — the
    // robust-mean preprocessing every reward/quality-score pipeline runs
    // before averaging, so one fat-finger outlier can't move the mean.
    // The quantiles come from operators.ExactQuantile (histogram-bracket
    // selection: 3 bounded scans, driver state ≤ groups × buckets —
    // NEVER a global sort, the 100 TB selection shape); clamp + sum is
    // then one broadcast join + one aggregate. Money in integer cents
    // end-to-end (Relational's convention); the oracle states the same
    // rank definition (k = ceil(q·n) in integer arithmetic) via
    // ROW_NUMBER, which this plan provably implements without sorting.
    QueryDef.sqlBacked(
      "q329_winsorized_mean",
      s"""WITH o AS (SELECT o_orderpriority AS priority,
         |    CAST(CAST(o_totalprice AS $M) * 100 AS BIGINT) AS v
         |  FROM orders),
         |r AS (SELECT priority, v,
         |    ROW_NUMBER() OVER (PARTITION BY priority ORDER BY v) AS rn,
         |    COUNT(*) OVER (PARTITION BY priority) AS n FROM o),
         |q AS (SELECT priority, MAX(n) AS n,
         |    MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN v END) AS lo,
         |    MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN v END) AS hi
         |  FROM r GROUP BY priority)
         |SELECT o.priority, CAST(q.n AS BIGINT) AS n_orders,
         |  CAST(q.lo AS BIGINT) AS p05_cents,
         |  CAST(q.hi AS BIGINT) AS p95_cents,
         |  CAST(SUM(GREATEST(LEAST(o.v, q.hi), q.lo)) AS BIGINT)
         |    AS winsor_sum_cents
         |FROM o JOIN q ON o.priority = q.priority
         |GROUP BY 1, 2, 3, 4 ORDER BY o.priority""".stripMargin) {
      (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("priority"),
          expr(s"CAST(CAST(o_totalprice AS $M) * 100 AS BIGINT)").as("v"))
      val q = graft.operators.ExactQuantile.quantiles(
          o, col("priority"), col("v"),
          Seq(("p05", 5L, 100L), ("p95", 95L, 100L)))
        .groupBy(col("g").as("priority"))
        .agg(max(when(col("label") === "p05", col("v"))).as("lo"),
          max(when(col("label") === "p95", col("v"))).as("hi"))
      o.join(broadcast(q), "priority")
        .groupBy(col("priority"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_orders"),
          // sum in DECIMAL(38,0): Spark's long sum wraps silently on
          // overflow while the DuckDB oracle sums into HUGEINT — the
          // wide accumulator keeps the engines agreeing at any SF
          sum(greatest(least(col("v"), col("hi")), col("lo"))
            .cast("decimal(38,0)")).cast("long").as("winsor_sum_cents"))
        .select(col("priority"), col("n_orders"),
          col("lo").as("p05_cents"), col("hi").as("p95_cents"),
          col("winsor_sum_cents"))
        .orderBy(col("priority"))
    },

    // Two-sample Kolmogorov–Smirnov drift statistic, EXACT: D is the
    // max gap between the two empirical CDFs, kept as the INTEGER
    // cross-product form |F1(v)·n2 − F2(v)·n1| (a float CDF would
    // hash-drift), reported in ppm by floor division plus the argmax
    // value (smallest-v tiebreak). Complements q320's chi-square: KS
    // needs no bucketing choice and catches location shifts a coarse
    // histogram smears. Shape: one value-grouped aggregate → TWO
    // prefix sums over the DISTINCT-VALUE frame (DistributedOrder —
    // range sort + one long per partition, never a single-task window)
    // → TakeOrdered(1).
    QueryDef.sqlBacked(
      "q337_ks_drift",
      """WITH s AS (SELECT n_chars AS v,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 2 = 0) AS BIGINT) AS c1,
        |    CAST(COUNT(*) FILTER (WHERE doc_id % 2 <> 0) AS BIGINT) AS c2
        |  FROM documents GROUP BY 1),
        |c AS (SELECT v,
        |    SUM(c1) OVER (ORDER BY v) AS f1,
        |    SUM(c2) OVER (ORDER BY v) AS f2,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2 FROM s)
        |SELECT CAST(n1 AS BIGINT) AS n_ref, CAST(n2 AS BIGINT) AS n_cand,
        |  CAST(v AS BIGINT) AS at_value,
        |  CAST(abs(CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1)
        |    * 1000000 // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS d_ppm
        |FROM c
        |ORDER BY abs(CAST(f1 AS HUGEINT) * n2 - CAST(f2 AS HUGEINT) * n1)
        |  DESC, v
        |LIMIT 1""".stripMargin) { (s, dir) =>
      val per = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("v"))
        .groupBy(col("v"))
        .agg(count(when(col("doc_id") % 2 === 0, 1)).as("c1"),
          count(when(col("doc_id") % 2 =!= 0, 1)).as("c2"))
      val cum = graft.operators.DistributedOrder.withPrefixSum(
        graft.operators.DistributedOrder.withPrefixSum(
          per, "f1", "n1", col("c1"), col("v")),
        "f2", "n2", col("c2"), col("v"))
      cum
        // DECIMAL(38,0) ↔ HUGEINT: f1·n2 and dn·10⁶ overflow BIGINT at
        // large document counts — the q338/q339 wide-integer protocol
        .select(col("v"),
          expr("abs(CAST(f1 AS DECIMAL(38,0)) * n2 " +
            "- CAST(f2 AS DECIMAL(38,0)) * n1)").as("dn"),
          col("n1"), col("n2"))
        .orderBy(col("dn").desc, col("v")).limit(1)
        .select(col("n1").as("n_ref"), col("n2").as("n_cand"),
          col("v").as("at_value"),
          expr("CAST(dn * 1000000 DIV " +
            "(CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)").as("d_ppm"))
    },

    // Spearman rank correlation over the FACT table, EXACT with ties:
    // tie-averaged ranks carry as 2×-SCALED INTEGERS (rank of the rows
    // at value v is c<(v) + (cnt+1)/2, so 2·rank = 2·c< + cnt + 1 —
    // always integral), the mean scaled rank is exactly n+1, and ρ is
    // Pearson over the centered scaled ranks in DECIMAL(38,0)/HUGEINT.
    // Reported as sign plus ρ²_e6 = (A²·10⁶) DIV GREATEST(B·C, 1)
    // where A = |sxy|//K, B = sxx//K, C = syy//K — pure integer ops
    // both engines state identically. Moment terms grow as n³, so
    // their PRODUCTS reach n⁶ — past n ≈ 10⁷ rows that exceeds
    // DECIMAL(38,0)/HUGEINT and Spark (non-ANSI) would NULL silently
    // while DuckDB errors. Both engines therefore pre-scale
    // identically: K = max(1, n³ DIV 10¹⁵) divides each term before
    // any multiplication (floor division on non-negative terms —
    // engine-identical), capping A²·10⁶ near 10³⁶ for ANY n while
    // K = 1 keeps small-n results bit-exact. CRITICAL shape note
    // (found by the sf0.1 gate): the ONLY narrowing division is the
    // final one (result ≤ 10⁶) — Spark's DIV always returns LONG, so
    // an intermediate like `B·C DIV 10⁶` (≈ 10²¹ at sf0.1) wraps
    // silently while DuckDB's `//` stays wide: the engines diverge.
    // Shape: two value-grouped prefix-sum rank tables (distinct-value-
    // sized) joined back on value, then ONE aggregate — the corpus is
    // never globally sorted row-wise. The operator answers "does my
    // quality score actually rank like the signal" — the filter-
    // validation question every curation pipeline asks.
    QueryDef.sqlBacked(
      "q338_spearman",
      """WITH f AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem WHERE l_orderkey % 16 = 0),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
        |rx AS (SELECT x, 2 * (SUM(cnt) OVER (ORDER BY x)) - cnt + 1 AS r2
        |  FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM f
        |        GROUP BY 1)),
        |ry AS (SELECT y, 2 * (SUM(cnt) OVER (ORDER BY y)) - cnt + 1 AS r2
        |  FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM f
        |        GROUP BY 1)),
        |d AS (SELECT rx.r2 - (SELECT n FROM n) - 1 AS dx,
        |             ry.r2 - (SELECT n FROM n) - 1 AS dy
        |      FROM f JOIN rx USING (x) JOIN ry USING (y)),
        |agg AS (SELECT SUM(CAST(dx * dy AS HUGEINT)) AS sxy,
        |    SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
        |    SUM(CAST(dy AS HUGEINT) * dy) AS syy FROM d),
        |k AS (SELECT GREATEST(CAST(1 AS HUGEINT),
        |    (SELECT CAST(n AS HUGEINT) * n * n FROM n)
        |      // 1000000000000000) AS kdiv)
        |SELECT (SELECT CAST(n AS BIGINT) FROM n) AS n,
        |  CAST(CASE WHEN sxy > 0 THEN 1 WHEN sxy < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS sign,
        |  CAST((ABS(sxy) // (SELECT kdiv FROM k))
        |      * (ABS(sxy) // (SELECT kdiv FROM k)) * 1000000
        |    // GREATEST((sxx // (SELECT kdiv FROM k))
        |      * (syy // (SELECT kdiv FROM k)), 1)
        |    AS BIGINT) AS rho2_e6
        |FROM agg""".stripMargin) { (s, dir) =>
      val f = Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") % 16 === 0)
        .select(col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice") * 100).cast("long").as("y"))
        .persist()
      try {
        val n = f.count()
        def rankTable(c: String) = {
          val per = f.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          graft.operators.DistributedOrder.withPrefixSum(
              per, "cum", "tot", col("cnt"), col(c))
            .select(col(c),
              (lit(2L) * col("cum") - col("cnt") + 1L).as(s"r2_$c"))
        }
        val d = f
          .join(rankTable("x"), "x").join(rankTable("y"), "y")
          .select((col("r2_x") - (n + 1L)).as("dx"),
            (col("r2_y") - (n + 1L)).as("dy"))
        // mirror of the oracle's pre-scale: K = max(1, n^3 / 10^15),
        // floor-divided into the non-negative moment terms on BOTH
        // engines before any product (see the ledger comment above)
        val kdiv = (BigInt(n).pow(3) / BigInt(10).pow(15)).max(BigInt(1))
        d.agg(
            sum(expr("CAST(dx * dy AS DECIMAL(38,0))")).as("sxy"),
            sum(expr("CAST(dx AS DECIMAL(38,0)) * dx")).as("sxx"),
            sum(expr("CAST(dy AS DECIMAL(38,0)) * dy")).as("syy"))
          .select(lit(n).as("n"),
            signum(col("sxy")).cast("long").as("sign"),
            // Spark's DIV yields LONG — so each scaled term re-widens
            // to DECIMAL(38,0) before multiplying, AND the ONLY
            // narrowing DIV is the final one (result ≤ 10⁶): an
            // intermediate `.. DIV 1000000` here held ~10²¹ at sf0.1
            // and wrapped silently (the sf0.1 gate caught it)
            expr("CAST(" +
              s"CAST(ABS(sxy) DIV $kdiv AS DECIMAL(38,0)) * " +
              s"CAST(ABS(sxy) DIV $kdiv AS DECIMAL(38,0)) * 1000000 DIV " +
              s"GREATEST(CAST(sxx DIV $kdiv AS DECIMAL(38,0)) * " +
              s"CAST(syy DIV $kdiv AS DECIMAL(38,0)), 1) " +
              "AS BIGINT)").as("rho2_e6"))
      } finally f.unpersist()
    },

    // Exact AUC (Mann–Whitney) of a score against binary labels — the
    // classifier-eval number behind every quality-filter threshold
    // decision, EXACT under ties via the same 2×-scaled tie-averaged
    // ranks as q338: AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺n⁻) becomes
    // (A2 − n⁺·(n⁺+1))·10⁶ DIV (2·n⁺·n⁻) with A2 = Σ scaled ranks of
    // positives — and A2 needs NO join back: it aggregates straight off
    // the distinct-score frame (per score: positives × that score's
    // scaled rank). One value-grouped aggregate + one prefix sum + one
    // fold; wide sums in DECIMAL(38,0)/HUGEINT.
    QueryDef.sqlBacked(
      "q339_exact_auc",
      """WITH f AS (SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |    AS score, (l_returnflag = 'R') AS pos
        |  FROM lineitem WHERE l_orderkey % 8 = 0),
        |per AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(COUNT(*) FILTER (pos) AS BIGINT) AS cpos
        |  FROM f GROUP BY 1),
        |r AS (SELECT score, cpos,
        |    2 * (SUM(cnt) OVER (ORDER BY score)) - cnt + 1 AS r2
        |  FROM per),
        |agg AS (SELECT SUM(CAST(cpos AS HUGEINT) * r2) AS a2,
        |    (SELECT SUM(cpos) FROM per) AS npos,
        |    (SELECT SUM(cnt) - SUM(cpos) FROM per) AS nneg FROM r)
        |SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
        |  CAST((a2 - CAST(npos AS HUGEINT) * (npos + 1)) * 1000000
        |    // (2 * CAST(npos AS HUGEINT) * nneg) AS BIGINT) AS auc_ppm
        |FROM agg""".stripMargin) { (s, dir) =>
      val per = Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") % 8 === 0)
        .select(floor(col("l_extendedprice") * 100).cast("long")
            .as("score"),
          (col("l_returnflag") === "R").as("pos"))
        .groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"),
          count(when(col("pos"), 1)).as("cpos"))
      graft.operators.DistributedOrder.withPrefixSum(
          per, "cum", "tot", col("cnt"), col("score"))
        .select(col("cnt"), col("cpos"),
          (lit(2L) * col("cum") - col("cnt") + 1L).as("r2"))
        .agg(
          sum(expr("CAST(cpos AS DECIMAL(38,0)) * r2")).as("a2"),
          sum(col("cpos")).as("npos"),
          (sum(col("cnt")) - sum(col("cpos"))).as("nneg"))
        .select(col("npos").cast("long").as("n_pos"),
          col("nneg").cast("long").as("n_neg"),
          expr("CAST((a2 - CAST(npos AS DECIMAL(38,0)) * (npos + 1)) " +
            "* 1000000 DIV (2 * CAST(npos AS DECIMAL(38,0)) * nneg) " +
            "AS BIGINT)").as("auc_ppm"))
    },

    // COHEN'S KAPPA between two quality screens (the filter-governance
    // number: do two independent rules actually agree beyond chance,
    // per source?): screen A = token-count band, screen B = lexical
    // diversity floor — both pure arithmetic both engines state
    // identically. Exact integer protocol in q338's style: the 2×2
    // contingency counts ride the hash, kappa reports as sign +
    // |num|·10⁶ DIV den over DECIMAL(38,0)/HUGEINT products (n² terms
    // overflow longs at SF; DIV and // agree because both operands are
    // kept non-negative). One token-stats scan + one |sources|-sized
    // aggregate.
    QueryDef.sqlBacked(
      "q362_filter_kappa",
      """WITH f AS (SELECT source,
        |    len(string_split_regex(trim(text), '\s+')) AS nt,
        |    len(list_distinct(string_split_regex(trim(text), '\s+')))
        |      AS nd
        |  FROM documents),
        |ab AS (SELECT source,
        |    CASE WHEN nt BETWEEN 30 AND 500 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN nd * 1000 >= 400 * nt THEN 1 ELSE 0 END AS b
        |  FROM f),
        |ct AS (SELECT source,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(*) FILTER (a = 1 AND b = 1) AS BIGINT) AS n11,
        |    CAST(COUNT(*) FILTER (a = 1 AND b = 0) AS BIGINT) AS n10,
        |    CAST(COUNT(*) FILTER (a = 0 AND b = 1) AS BIGINT) AS n01,
        |    CAST(COUNT(*) FILTER (a = 0 AND b = 0) AS BIGINT) AS n00
        |  FROM ab GROUP BY source),
        |k AS (SELECT source, n, n11, n10, n01, n00,
        |    CAST((n11 + n00) AS HUGEINT) * n
        |      - CAST((n11 + n10) AS HUGEINT) * (n11 + n01)
        |      - CAST((n01 + n00) AS HUGEINT) * (n10 + n00) AS num,
        |    CAST(n AS HUGEINT) * n
        |      - CAST((n11 + n10) AS HUGEINT) * (n11 + n01)
        |      - CAST((n01 + n00) AS HUGEINT) * (n10 + n00) AS den
        |  FROM ct)
        |SELECT source, n, n11, n10, n01, n00,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS kappa_sign,
        |  CAST(ABS(num) * 1000000 // GREATEST(den, 1) AS BIGINT)
        |    AS kappa_abs_ppm
        |FROM k ORDER BY source""".stripMargin) { (s, dir) =>
      val toks = graft.operators.TextOps.tokens(col("text"))
      Tables.load(s, dir, "documents")
        .select(col("source"), size(toks).as("nt"),
          size(array_distinct(toks)).as("nd"))
        .select(col("source"),
          when(col("nt").between(30, 500), 1).otherwise(0).as("a"),
          when(col("nd") * 1000 >= col("nt") * 400, 1).otherwise(0)
            .as("b"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          count(when(col("a") === 1 && col("b") === 1, 1)).as("n11"),
          count(when(col("a") === 1 && col("b") === 0, 1)).as("n10"),
          count(when(col("a") === 0 && col("b") === 1, 1)).as("n01"),
          count(when(col("a") === 0 && col("b") === 0, 1)).as("n00"))
        .withColumn("num", expr(
          """CAST((n11 + n00) AS DECIMAL(38,0)) * n
            |  - CAST((n11 + n10) AS DECIMAL(38,0)) * (n11 + n01)
            |  - CAST((n01 + n00) AS DECIMAL(38,0)) * (n10 + n00)"""
            .stripMargin))
        .withColumn("den", expr(
          """CAST(n AS DECIMAL(38,0)) * n
            |  - CAST((n11 + n10) AS DECIMAL(38,0)) * (n11 + n01)
            |  - CAST((n01 + n00) AS DECIMAL(38,0)) * (n10 + n00)"""
            .stripMargin))
        .select(col("source"), col("n"), col("n11"), col("n10"),
          col("n01"), col("n00"),
          expr("CAST(SIGN(num) AS BIGINT)").as("kappa_sign"),
          expr("CAST(ABS(num) * 1000000 DIV GREATEST(den, 1) AS BIGINT)")
            .as("kappa_abs_ppm"))
        .orderBy(col("source"))
    },

    // Classifier CALIBRATION curve + Brier score (the reliability
    // diagram every quality-filter model ships with): a deterministic
    // length-based "predicted quality" in exact ppm vs a deterministic
    // binary label, rolled to 10 score deciles — per bin the count,
    // the mean prediction, the observed positive rate, and the mean
    // Brier term Σ(p−y)²/n, all in the wide-integer protocol
    // (DECIMAL(38,0) sums ↔ HUGEINT; the only narrowing DIV is the
    // final small per-bin result). A well-calibrated screen has
    // mean_p_ppm ≈ frac_pos_ppm per bin — the drift between them is
    // the number a curation pipeline alerts on.
    QueryDef.sqlBacked(
      "q367_calibration_curve",
      """WITH s AS (SELECT
        |    LEAST(n_chars, 2000) * 500 AS p,
        |    CASE WHEN length(text) - length(replace(text, 'e', '')) > 40
        |      THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |b AS (SELECT LEAST(p // 100000, 9) AS bin, p, y FROM s)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(p) AS HUGEINT) // COUNT(*) AS BIGINT)
        |    AS mean_p_ppm,
        |  CAST(CAST(SUM(y) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
        |    AS frac_pos_ppm,
        |  CAST(CAST(SUM((p - y * 1000000) * (p - y * 1000000))
        |    AS HUGEINT) // COUNT(*) AS BIGINT) AS brier_e12
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(expr("least(n_chars, 2000) * 500").as("p"),
          expr("CASE WHEN length(text) - length(replace(text, 'e', '')) " +
            "> 40 THEN 1 ELSE 0 END").as("y"))
        .withColumn("bin", expr("least(p DIV 100000, 9)"))
        .groupBy(col("bin").cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(p AS DECIMAL(38,0))) DIV COUNT(*) AS BIGINT)")
            .as("mean_p_ppm"),
          expr("CAST(SUM(CAST(y AS DECIMAL(38,0))) * 1000000 DIV COUNT(*) " +
            "AS BIGINT)").as("frac_pos_ppm"),
          expr("CAST(SUM(CAST(p - y * 1000000 AS DECIMAL(38,0)) * " +
            "CAST(p - y * 1000000 AS DECIMAL(38,0))) DIV COUNT(*) " +
            "AS BIGINT)").as("brier_e12"))
        .orderBy(col("bin"))
    },

    // Distribution-rank window trio — NTILE / PERCENT_RANK / CUME_DIST,
    // the three standard position-in-distribution windows the registry
    // didn't yet cover (W1 family growth). percent_rank and cume_dist
    // are replayed in EXACT integers from their defining counts
    // ((rank−1)·10⁶ DIV (n−1); peers-inclusive running count ·10⁶ DIV
    // n) — no float window output ever reaches the hash. NTILE needs a
    // TOTAL order to be deterministic, so it tiebreaks on the key;
    // rank/cume keep value-only order so ties genuinely collapse. One
    // nation-partitioned window pass, quartile-bucketed output.
    QueryDef.sqlBacked(
      "q381_rank_spectrum",
      """WITH c2 AS (SELECT c.c_custkey AS id, n.n_name AS nation,
        |    CAST(FLOOR(c.c_acctbal * 100) AS BIGINT) AS bal
        |  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey),
        |r AS (SELECT nation, bal,
        |    RANK() OVER (PARTITION BY nation ORDER BY bal) AS rnk,
        |    COUNT(*) OVER (PARTITION BY nation) AS n,
        |    NTILE(4) OVER (PARTITION BY nation ORDER BY bal, id)
        |      AS quartile,
        |    COUNT(*) OVER (PARTITION BY nation ORDER BY bal
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS le_n
        |  FROM c2)
        |SELECT nation, CAST(quartile AS BIGINT) AS quartile,
        |  CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(MIN((rnk - 1) * 1000000 // GREATEST(n - 1, 1)) AS BIGINT)
        |    AS min_pr_ppm,
        |  CAST(MAX(le_n * 1000000 // n) AS BIGINT) AS max_cume_ppm,
        |  CAST(SUM(bal) AS BIGINT) AS bal_cents
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val c2 = Tables.load(s, dir, "customer").as("c")
        .join(Tables.load(s, dir, "nation").as("n"),
          col("n.n_nationkey") === col("c.c_nationkey"))
        .select(col("c.c_custkey").as("id"), col("n.n_name").as("nation"),
          floor(col("c.c_acctbal") * 100).cast("long").as("bal"))
      val byVal = Window.partitionBy(col("nation")).orderBy(col("bal"))
      val total = Window.partitionBy(col("nation"))
        .orderBy(col("bal"), col("id"))
      c2.select(col("nation"), col("bal"),
          rank().over(byVal).as("rnk"),
          count(lit(1)).over(Window.partitionBy(col("nation"))).as("n"),
          ntile(4).over(total).as("quartile"),
          count(lit(1)).over(byVal
            .rangeBetween(Window.unboundedPreceding, Window.currentRow))
            .as("le_n"))
        .groupBy(col("nation"), col("quartile").cast("long").as("quartile"))
        .agg(count(lit(1)).as("n_cust"),
          // rank() is IntegerType: without the BIGINT widening the
          // int×int product wraps once a nation partition exceeds ~2148
          // rows (SF≥1), silently diverging from DuckDB's HUGEINT math
          min(expr("(CAST(rnk AS BIGINT) - 1) * 1000000" +
              " DIV GREATEST(n - 1, 1)"))
            .cast("long").as("min_pr_ppm"),
          max(expr("le_n * 1000000 DIV n")).cast("long").as("max_cume_ppm"),
          sum(col("bal")).cast("long").as("bal_cents"))
        .orderBy(col("nation"), col("quartile"))
    }
  )
}
