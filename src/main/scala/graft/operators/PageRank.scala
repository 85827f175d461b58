package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Integer-exact PageRank in the Pregel shape — per iteration ONE join
  * of the (cached) degree-fused edge list against the current rank
  * frame plus one per-target aggregate — behind a size-gated placement
  * flag for the node-sized rank frame.
  *
  * The rank/contribution frames are |nodes| rows. While the graph is
  * small they BROADCAST into the edge join, so the edge list never
  * moves and each iteration costs exactly one shuffle (the aggregate).
  * A 100 TB-derived graph has ~1e9 nodes, and a multi-GB per-iteration
  * broadcast is a driver/executor OOM — so past `maxBroadcastNodes`
  * the same joins run as SHUFFLE_HASH joins keyed on the node id, with
  * the cached edge list pre-partitioned on `src` so every iteration
  * shuffles ONLY the node-sized rank frame, never the edges. Both
  * paths are bit-identical (PageRankSpec) and the off-path plan is
  * pinned broadcast-free (PlanSpec).
  *
  * Arithmetic is integer-exact — ranks in ppm, contributions
  * floor(rank/outdeg), damping floor(85·s/100) — so chained iterations
  * cannot drift between engines; the q143 oracle spells the identical
  * rounds as unrolled CTEs.
  */
object PageRank {

  private def floorDiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  /** Rank frame (v, r) after `iterations` rounds over `rawEdges`
    * (columns `src`, `dst`; de-duplicated here).
    *
    * @param broadcastRanks None = auto-gate on the node count;
    *                       Some(x) forces the path (specs).
    * @param cleanup        true (default) materializes the node-sized
    *                       result via an eager local checkpoint and
    *                       unpersists the edge/node caches before
    *                       returning — false keeps the final iteration
    *                       lazy so its physical plan stays inspectable.
    */
  def run(
      spark: SparkSession,
      rawEdges: DataFrame,
      iterations: Int,
      broadcastRanks: Option[Boolean] = None,
      maxBroadcastNodes: Long = 4L * 1000 * 1000,
      cleanup: Boolean = true): DataFrame = {
    val edges = rawEdges.select(col("src"), col("dst")).distinct().cache()
    val nodes = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v"))).distinct().cache()
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("d"))
    val useBroadcast =
      broadcastRanks.getOrElse(nodes.count() <= maxBroadcastNodes)
    def side(df: DataFrame): DataFrame =
      if (useBroadcast) broadcast(df) else df.hint("SHUFFLE_HASH")
    // degrees fold into the edge list ONCE (they never change); the
    // shuffle path hash-partitions the fused frame on src so the
    // per-iteration rank join reuses the cached partitioning and only
    // the rank frame moves
    val edgesD0 = edges.join(side(deg), "src")
    val edgesD = (if (useBroadcast) edgesD0
                  else edgesD0.repartition(col("src"))).cache()
    try {
      var ranks = nodes.withColumn("r", lit(1000000L))
      for (i <- 1 to iterations) {
        val contrib = edgesD
          .join(side(ranks.withColumnRenamed("v", "src")), "src")
          .select(col("dst").as("v"), floorDiv(col("r"), col("d")).as("c"))
          .groupBy(col("v")).agg(sum(col("c")).as("s"))
        val next = nodes.join(side(contrib), Seq("v"), "left")
          .select(col("v"),
            (lit(150000L) +
              floorDiv(lit(85L) * coalesce(col("s"), lit(0L)), lit(100L)))
              .as("r"))
        // cut the per-iteration lineage; the LAST round materializes
        // eagerly (node-sized) so the caches below can be released —
        // unless the caller wants the final plan inspectable
        ranks =
          if (i == iterations && !cleanup) next
          else next.localCheckpoint(eager = cleanup && i == iterations)
      }
      ranks
    } finally {
      if (cleanup) {
        edges.unpersist(); nodes.unpersist(); edgesD.unpersist()
      }
    }
  }
}
