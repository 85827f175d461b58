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
  * High-cardinality group columns CHUNK instead of refusing: when
  * groups × buckets would blow the driver's histogram budget, the
  * groups split into bounded chunks and passes 2–3 run once per chunk
  * (the pass-2/3 joins are inner joins on the chunk's groups, so each
  * extra chunk is more JOBS over the cached projection, never more
  * driver memory). Only a group COUNT beyond the budget itself — where
  * even one row per group won't fit the driver — still refuses loudly.
  *
  * Rank definition: the q-th quantile is the value at rank
  * ceil(num·n/den) in ascending order (the "discrete quantile" of
  * DuckDB's `quantile_disc`), computed in EXACT integer arithmetic —
  * `ceil(0.9·n)` via doubles misrounds when 9n/10 is integral, so the
  * rank is `(num·n + den − 1) / den` in longs on both engines.
  *
  * Both collects are bounded METADATA (one row per group; one row per
  * non-empty bucket of the current chunk), not data rows — same class
  * as IvfIndex's sampled centroids, not a driver loop over the table.
  */
object ExactQuantile {

  /** Driver histogram budget: max (group, bucket) cells materialized per
    * chunk, and the hard ceiling on the group COUNT itself (one stats
    * row per group must fit the driver). ~32M cells ≈ a few GB of
    * tuples.
    */
  private[graft] val MaxDriverCells = 32L * 1024 * 1024

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Passes 2–3 for ONE chunk of groups: histogram, bracket walk,
    * in-bracket selection. `stats` = (g, n-or-totalWeight, lo, hi);
    * `weighted` switches counts to weight sums and the pass-3 pick to
    * the cumulative-weight rule. The pass-2/3 joins are INNER on the
    * chunk's groups — rows outside the chunk never leave the scan.
    */
  private def bracketPass(
      src: DataFrame,
      stats: Seq[(String, Long, Long, Long)],
      qs: Seq[(String, Long, Long)],
      buckets: Int,
      weighted: Boolean): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    // per-group bucket width; ≥1 so degenerate (constant) groups work
    val meta = stats.map { case (g, _, lo, hi) =>
      (g, lo, math.max(1L, (hi - lo) / buckets + 1))
    }
    val widthOf = meta.map(m => m._1 -> m._3).toMap
    val metaDf = broadcast(meta.toDF("g", "g_lo", "g_w"))

    // pass 2: one row per non-empty (group, bucket) OF THIS CHUNK
    val hist = src.join(metaDf, Seq("g"))
      .select($"g", expr("(v - g_lo) div g_w").as("b"),
        (if (weighted) $"w" else lit(1L)).as("w"))
      .groupBy($"g", $"b").agg(sum($"w").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)

    // driver walk: locate the bucket containing each target rank
    val brackets = stats.flatMap { case (g, n, lo, _) =>
      val w = widthOf(g)
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
    }
    val brDf = broadcast(
      brackets.toDF("bg", "label", "b_lo", "b_hi", "k_in"))

    // pass 3: only rows inside a located bucket survive the join; the
    // window sorts a ~1/buckets slice per (group, target), nothing more.
    // Materialized eagerly so the union across chunks never re-runs a
    // chunk's jobs (and the caller can release the cached projection).
    if (!weighted) {
      val win = Window.partitionBy($"g", $"label").orderBy($"v")
      src.join(brDf, $"g" === $"bg" && $"v".between($"b_lo", $"b_hi"))
        .withColumn("rn", row_number().over(win))
        .filter($"rn" === $"k_in")
        .select($"g", $"label", $"v")
        .localCheckpoint(eager = true)
    } else {
      // bracket slice → per-value weight sums (ties merge by
      // definition) → first value whose cumulative weight reaches the
      // in-bracket rank
      val perValue = src.join(brDf,
          $"g" === $"bg" && $"v".between($"b_lo", $"b_hi"))
        .groupBy($"g", $"label", $"k_in", $"v").agg(sum($"w").as("vw"))
      val cumWin = Window.partitionBy($"g", $"label").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pickWin = Window.partitionBy($"g", $"label").orderBy($"v")
      perValue
        .withColumn("cw", sum($"vw").over(cumWin))
        .filter($"cw" >= $"k_in")
        .withColumn("rn", row_number().over(pickWin))
        .filter($"rn" === 1)
        .select($"g", $"label", $"v")
        .localCheckpoint(eager = true)
    }
  }

  /** Chunked pass-2/3 driver: splits the per-group stats so each chunk's
    * histogram stays within `maxDriverCells`, unions the per-chunk
    * results. Refuses only when the group count ALONE exceeds the
    * budget (one stats row per group must fit the driver — past that,
    * pre-aggregate the group column).
    */
  private def collectStats(
      src: DataFrame,
      statsDf: DataFrame,
      maxDriverCells: Long)
      (decode: org.apache.spark.sql.Row => (String, Long, Long, Long))
      : Seq[(String, Long, Long, Long)] = {
    val nGroups = statsDf.count()
    if (nGroups > maxDriverCells) {
      statsDf.unpersist(); src.unpersist()
      throw new IllegalArgumentException(
        s"ExactQuantile: $nGroups groups exceeds the $maxDriverCells " +
          "driver bound even at one row per group — pre-aggregate the " +
          "group column")
    }
    val s = statsDf.collect().map(decode).toSeq
    statsDf.unpersist()
    s
  }

  private def runChunked(
      src: DataFrame,
      stats: Seq[(String, Long, Long, Long)],
      qs: Seq[(String, Long, Long)],
      buckets: Int,
      weighted: Boolean,
      maxDriverCells: Long): DataFrame = {
    if (stats.isEmpty) { // zero groups: an empty result, not a crash
      val spark = src.sparkSession
      import spark.implicits._
      src.unpersist()
      return Seq.empty[(String, String, Long)].toDF("g", "label", "v")
    }
    val chunkSize = math.max(1L, maxDriverCells / buckets).toInt
    try stats.grouped(chunkSize)
      .map(chunk => bracketPass(src, chunk, qs, buckets, weighted))
      .reduce(_ unionByName _)
    finally src.unpersist()
  }

  /** @param qs  (label, num, den) targets, rank = ceil(num·n/den)
    * @return (g, label, value) — one row per group × target
    */
  def quantiles(
      df: DataFrame,
      grpCol: Column,
      valCol: Column,
      qs: Seq[(String, Long, Long)],
      buckets: Int = 1024,
      maxDriverCells: Long = MaxDriverCells): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // cached across the passes: the projection is 2 narrow columns
    // (a re-scan per pass costs 3 parquet reads; MEMORY_AND_DISK spills
    // rather than OOMs when a 100 TB slice doesn't fit executors)
    val src = df.select(grpCol.cast("string").as("g"),
      valCol.cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: one row per GROUP (persisted so the cardinality check
    // counts it distributed BEFORE anything lands on the driver)
    val statsDf = src.groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
      .persist()
    val stats = collectStats(src, statsDf, maxDriverCells)(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    runChunked(src, stats, qs, buckets, weighted = false, maxDriverCells)
  }

  /** WEIGHTED exact quantiles — same chunked histogram-bracket shape,
    * ranks over cumulative WEIGHT: the q-th weighted quantile is the
    * smallest value v with cumW(v) ≥ ceil(num·W/den), W the group's
    * total weight (integer, exact). Weights must be positive integers —
    * the caller quantizes (e.g. token counts, floor(quantity));
    * zero/negative weights would make cumW non-monotone and the bracket
    * walk unsound, so they throw.
    */
  def weightedQuantiles(
      df: DataFrame,
      grpCol: Column,
      valCol: Column,
      weightCol: Column,
      qs: Seq[(String, Long, Long)],
      buckets: Int = 1024,
      maxDriverCells: Long = MaxDriverCells): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // cached across the passes (same rationale as quantiles above)
    val src = df.select(grpCol.cast("string").as("g"),
      valCol.cast("long").as("v"), weightCol.cast("long").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: one row per GROUP (weight domain + value domain); the
    // positive-weight requirement rides the same aggregate
    val statsDf = src.groupBy($"g")
      .agg(sum($"w").as("tw"), min($"v").as("lo"), max($"v").as("hi"),
        min($"w").as("wmin"))
      .persist()
    val badW = statsDf.filter($"wmin" <= 0L).select($"g", $"wmin").head(1)
    badW.headOption.foreach { r =>
      statsDf.unpersist(); src.unpersist()
      throw new IllegalArgumentException(
        s"weighted quantile needs positive integer weights; group " +
          s"'${r.getString(0)}' has min weight ${r.getLong(1)}")
    }
    val stats = collectStats(src, statsDf, maxDriverCells)(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    runChunked(src, stats, qs, buckets, weighted = true, maxDriverCells)
  }
}
