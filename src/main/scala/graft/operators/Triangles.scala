package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Triangle counting on an undirected edge list via oriented wedge-check
  * joins (q150's machinery generalized behind an orientation flag).
  *
  * Orientation decides the wedge fan-out bound:
  *  - `degreeOriented = false`: orient u→v by node id (u < v). Per-node
  *    wedge count is C(out-degree, 2) where a hub that happens to hold a
  *    LOW id keeps its full degree as out-degree — fine on near-uniform
  *    graphs (q150's co-occurrence graph), quadratic on a power-law hub.
  *  - `degreeOriented = true`: orient from the (degree, id)-smaller
  *    endpoint to the larger — the standard √m orientation: every
  *    out-degree is O(√m), total wedges O(m^{3/2}) regardless of skew.
  *    Implemented by RELABELING nodes with their dense rank in the
  *    (degree, id) order, then running the identical packed-long id
  *    pipeline on the relabeled edges — one extra node-sized ranking
  *    plus two relabel joins, and every downstream join still keys on a
  *    single long (LongHashedRelation fast path).
  *
  * Triangle totals are orientation-invariant, so both paths return the
  * same counts (TriangleSpec pins this, plus the bounded fan-out on a
  * planted hot node).
  */
object Triangles {

  /** Canonical packed-long edge set: one row per undirected edge, hi32 =
    * smaller endpoint, lo32 = larger. Node ids must fit in 31 bits.
    */
  def packedEdges(edges: DataFrame, u: String, v: String): DataFrame =
    // cast BEFORE shifting: shiftleft on an INT column wraps the shift
    // amount mod 32 (Java semantics), silently destroying the packing
    edges.select(least(col(u), col(v)).cast("long").as("a"),
        greatest(col(u), col(v)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(shiftleft(col("a"), 32).bitwiseOR(col("b")).as("ek"))
      .distinct()

  /** (degree, id)-rank relabeling: node → dense 0-based rank. The frame
    * is node-sized (≤ 2m, typically far smaller), never edge-sized.
    * Ranks come from a DISTRIBUTED sort + zipWithIndex (per-partition
    * counts + offsets), not a single-partition row_number window — the
    * node frame can be billions of rows at 100 TB.
    */
  private def degreeRanks(spark: SparkSession, ek: DataFrame): DataFrame = {
    import spark.implicits._
    val ends = ek.select(shiftright(col("ek"), 32).as("n"))
      .unionAll(ek.select(col("ek").bitwiseAND(lit(0xFFFFFFFFL)).as("n")))
    val degs = ends.groupBy(col("n")).agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    degs.orderBy(col("deg"), col("n"))
      .select(col("n")).as[Long].rdd
      .zipWithIndex()
      .toDF("n", "rank")
  }

  /** Oriented (s, t) edges under the chosen orientation; with
    * `degreeOriented` the ids are the (degree, id) ranks.
    */
  def oriented(
      spark: SparkSession,
      ek: DataFrame,
      degreeOriented: Boolean,
      broadcastRanks: Boolean = true): DataFrame = {
    val ed = ek.select(shiftright(col("ek"), 32).as("s"),
      col("ek").bitwiseAND(lit(0xFFFFFFFFL)).as("t"))
    if (!degreeOriented) ed
    else {
      // the rank map is node-sized: broadcast while it fits executors,
      // shuffle-join on the node key once it doesn't
      val ranks = degreeRanks(spark, ek)
      def side(df: DataFrame): DataFrame =
        if (broadcastRanks) broadcast(df) else df
      ed.join(side(ranks.select(col("n").as("s"), col("rank").as("rs"))), "s")
        .join(side(ranks.select(col("n").as("t"), col("rank").as("rt"))), "t")
        .select(least(col("rs"), col("rt")).as("s"),
          greatest(col("rs"), col("rt")).as("t"))
    }
  }

  /** One row (n_edges, n_triangles). `broadcastProbes` = hash-join
    * probes ride broadcasts (right while the edge list fits executors);
    * false = shuffle hash joins on the same packed keys — the 100-TB
    * fallback with identical semantics.
    */
  def count(
      spark: SparkSession,
      edges: DataFrame,
      u: String,
      v: String,
      degreeOriented: Boolean,
      broadcastProbes: Boolean = true): DataFrame = {
    val ek0 = packedEdges(edges, u, v).cache()
    val ed = oriented(spark, ek0, degreeOriented, broadcastRanks = broadcastProbes)
    // re-pack oriented edges so the closing-edge probe keys on ONE long
    val ekOriented =
      if (degreeOriented)
        ed.select(shiftleft(col("s"), 32).bitwiseOR(col("t")).as("ek")).cache()
      else ek0
    def side(df: DataFrame): DataFrame =
      if (broadcastProbes) broadcast(df) else df.hint("SHUFFLE_HASH")
    val wedges = ed.as("e1")
      .join(side(ed.as("e2")), col("e1.t") === col("e2.s"))
      .select(shiftleft(col("e1.s"), 32).bitwiseOR(col("e2.t")).as("wk"))
    val tri = wedges.join(side(ekOriented), col("wk") === col("ek"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
    // the result is ONE row: materialize it eagerly so both packed-edge
    // caches release here instead of accumulating across a bench run
    try ek0.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))
      .crossJoin(tri).localCheckpoint(eager = true)
    finally {
      ek0.unpersist()
      if (degreeOriented) ekOriented.unpersist()
    }
  }
}
