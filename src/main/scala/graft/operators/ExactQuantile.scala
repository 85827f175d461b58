package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles WITHOUT a global sort — the selection
  * problem at 100 TB. A full `ORDER BY` per group shuffles and sorts the
  * whole table; `percentile_approx` gives only an approximation. This
  * operator answers exact rank statistics in three passes whose driver
  * state is bounded by GROUPS × BUCKETS, never by table size:
  *
  *   1. per-group (n, min, max) — one hash aggregate;
  *   2. per-group fixed-width histogram counts — one hash aggregate
  *      (≤ `buckets` rows per group back to the driver, which walks the
  *      cumulative counts to find the ONE bucket holding each target
  *      rank);
  *   3. rank-within-bucket selection — a broadcast bracket join keeps
  *      only rows inside the located buckets (a ~1/`buckets` slice of
  *      each group), then a tiny per-bracket ROW_NUMBER picks the exact
  *      value.
  *
  * Rank definition: the q-th quantile is the value at rank
  * ceil(num·n/den) in ascending order (the "discrete quantile" of
  * DuckDB's `quantile_disc`), computed in EXACT integer arithmetic —
  * `ceil(0.9·n)` via doubles misrounds when 9n/10 is integral, so the
  * rank is `(num·n + den − 1) / den` in longs on both engines.
  *
  * Both collects are bounded METADATA (one row per group; one row per
  * non-empty bucket), not data rows — same class as IvfIndex's sampled
  * centroids, not a driver loop over the table.
  */
object ExactQuantile {

  /** Hard ceiling on driver-held histogram cells (|groups| × buckets):
    * the bracket walk materializes one row per non-empty (group, bucket)
    * on the driver, so a high-cardinality group column could otherwise
    * OOM it silently. ~32M cells ≈ a few GB of tuples — refuse loudly
    * above that instead of dying in collect().
    */
  private val MaxDriverCells = 32L * 1024 * 1024

  /** Refuses group columns whose cardinality would blow the driver.
    * The count comes from the PERSISTED pass-1 aggregate (one row per
    * group — the frame the guard exists to keep off the driver), so
    * guarding costs one extra action over already-computed state, not
    * an extra distinct shuffle.
    */
  private def guardGroups(
      statsDf: org.apache.spark.sql.DataFrame,
      src: org.apache.spark.sql.DataFrame,
      buckets: Int): Unit = {
    val nGroups = statsDf.count()
    if (nGroups * buckets > MaxDriverCells) {
      statsDf.unpersist()
      src.unpersist()
      throw new IllegalArgumentException(
        s"ExactQuantile: $nGroups groups x $buckets buckets = " +
          s"${nGroups * buckets} driver histogram cells exceeds the " +
          s"$MaxDriverCells bound — reduce `buckets`, pre-aggregate the " +
          "group column, or shard the call per group range")
    }
  }

  /** @param qs  (label, num, den) targets, rank = ceil(num·n/den)
    * @return (g, label, value) — one row per group × target
    */
  def quantiles(
      df: DataFrame,
      grpCol: Column,
      valCol: Column,
      qs: Seq[(String, Long, Long)],
      buckets: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

    // cached across the three passes: the projection is 2 narrow columns
    // (a re-scan per pass costs 3 parquet reads; MEMORY_AND_DISK spills
    // rather than OOMs when a 100 TB slice doesn't fit executors)
    val src = df.select(grpCol.cast("string").as("g"),
      valCol.cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: one row per GROUP (persisted so the cardinality guard
    // counts it distributed BEFORE anything lands on the driver)
    val statsDf = src.groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
      .persist()
    guardGroups(statsDf, src, buckets)
    val stats = statsDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    statsDf.unpersist()

    // per-group bucket width; ≥1 so degenerate (constant) groups work
    val meta = stats.map { case (g, _, lo, hi) =>
      (g, lo, math.max(1L, (hi - lo) / buckets + 1))
    }.toSeq
    val metaDf = broadcast(meta.toDF("g", "g_lo", "g_w"))

    // pass 2: one row per non-empty (group, bucket)
    val hist = src.join(metaDf, Seq("g"))
      .select($"g", expr("(v - g_lo) div g_w").as("b"))
      .groupBy($"g", $"b").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)

    // driver walk: locate the bucket containing each target rank
    val brackets = stats.flatMap { case (g, n, lo, _) =>
      val w = meta.find(_._1 == g).get._3
      val sorted = hist(g).map(t => (t._2, t._3)).sortBy(_._1)
      qs.map { case (label, num, den) =>
        val k = ceilDiv(num * n, den)
        var cum = 0L
        var found: (Long, Long) = null // (bucket, rank within bucket)
        for ((b, c) <- sorted if found == null) {
          if (cum + c >= k) found = (b, k - cum)
          cum += c
        }
        val (b, kin) = found
        (g, label, lo + b * w, lo + (b + 1) * w - 1, kin)
      }
    }.toSeq
    val brDf = broadcast(
      brackets.toDF("bg", "label", "b_lo", "b_hi", "k_in"))

    // pass 3: only rows inside a located bucket survive the join; the
    // window sorts a ~1/buckets slice per (group, target), nothing more
    val win = Window.partitionBy($"g", $"label").orderBy($"v")
    // the result is groups x targets rows: materialize it eagerly so the
    // cached projection can be RELEASED here instead of leaking across a
    // 210-query bench run (the caller gets a checkpointed frame)
    try src.join(brDf,
        $"g" === $"bg" && $"v".between($"b_lo", $"b_hi"))
      .withColumn("rn", row_number().over(win))
      .filter($"rn" === $"k_in")
      .select($"g", $"label", $"v")
      .localCheckpoint(eager = true)
    finally src.unpersist()
  }

  /** WEIGHTED exact quantiles — same three-pass histogram-bracket shape,
    * ranks over cumulative WEIGHT: the q-th weighted quantile is the
    * smallest value v with cumW(v) ≥ ceil(num·W/den), W the group's
    * total weight (integer, exact). The histogram buckets sum weights
    * instead of counting rows; pass 3 aggregates the bracket slice per
    * VALUE first (ties merge by definition), so the final window runs
    * over distinct values of a ~1/buckets slice. Weights must be
    * positive integers — the caller quantizes (e.g. token counts,
    * floor(quantity)); zero/negative weights would make cumW
    * non-monotone and the bracket walk unsound, so they throw.
    */
  def weightedQuantiles(
      df: DataFrame,
      grpCol: Column,
      valCol: Column,
      weightCol: Column,
      qs: Seq[(String, Long, Long)],
      buckets: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

    // cached across the three passes (same rationale as quantiles above)
    val src = df.select(grpCol.cast("string").as("g"),
      valCol.cast("long").as("v"), weightCol.cast("long").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: one row per GROUP (weight domain + value domain),
    // persisted so the cardinality guard counts it distributed first
    val statsDf = src.groupBy($"g")
      .agg(sum($"w").as("tw"), min($"v").as("lo"), max($"v").as("hi"),
        min($"w").as("wmin"))
      .persist()
    guardGroups(statsDf, src, buckets)
    val stats = statsDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    statsDf.unpersist()
    stats.foreach { case (g, _, _, _, wmin) =>
      require(wmin > 0L,
        s"weighted quantile needs positive integer weights; group '$g' " +
          s"has min weight $wmin")
    }

    val meta = stats.map { case (g, _, lo, hi, _) =>
      (g, lo, math.max(1L, (hi - lo) / buckets + 1))
    }.toSeq
    val metaDf = broadcast(meta.toDF("g", "g_lo", "g_w"))

    // pass 2: per-bucket WEIGHT sums
    val hist = src.join(metaDf, Seq("g"))
      .select($"g", expr("(v - g_lo) div g_w").as("b"), $"w")
      .groupBy($"g", $"b").agg(sum($"w").as("bw"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)

    val brackets = stats.flatMap { case (g, tw, lo, _, _) =>
      val w = meta.find(_._1 == g).get._3
      val sorted = hist(g).map(t => (t._2, t._3)).sortBy(_._1)
      qs.map { case (label, num, den) =>
        val k = ceilDiv(num * tw, den)
        var cum = 0L
        var found: (Long, Long) = null
        for ((b, bw) <- sorted if found == null) {
          if (cum + bw >= k) found = (b, k - cum)
          cum += bw
        }
        val (b, kin) = found
        (g, label, lo + b * w, lo + (b + 1) * w - 1, kin)
      }
    }.toSeq
    val brDf = broadcast(
      brackets.toDF("bg", "label", "b_lo", "b_hi", "k_in"))

    // pass 3: bracket slice → per-value weight sums → first value whose
    // cumulative weight reaches the in-bracket rank
    val perValue = src.join(brDf,
        $"g" === $"bg" && $"v".between($"b_lo", $"b_hi"))
      .groupBy($"g", $"label", $"k_in", $"v").agg(sum($"w").as("vw"))
    val cumWin = Window.partitionBy($"g", $"label").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pickWin = Window.partitionBy($"g", $"label").orderBy($"v")
    try perValue
      .withColumn("cw", sum($"vw").over(cumWin))
      .filter($"cw" >= $"k_in")
      .withColumn("rn", row_number().over(pickWin))
      .filter($"rn" === 1)
      .select($"g", $"label", $"v")
      .localCheckpoint(eager = true)
    finally src.unpersist()
  }
}
