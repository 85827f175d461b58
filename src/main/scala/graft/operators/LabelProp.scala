package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation (Zhu & Ghahramani label spreading,
  * the deterministic clamped-seed variant): seed vertices carry fixed
  * labels; each round every vertex adopts the MODE of its labeled
  * neighbors' labels (ties break to the smallest label, so rounds are
  * bit-deterministic — classic async LPA is run-order dependent and
  * could never be value-checked across engines), seeds stay clamped,
  * and unlabeled vertices with no labeled neighbor stay unlabeled.
  * Fixed round count, like [[PageRank]]: the q244 oracle unrolls the
  * identical rounds as MATERIALIZED CTEs.
  *
  * Scale shape per round: one edge⋈label join keyed on the vertex id,
  * one (v, label) count aggregate, one vertex-keyed window for the
  * argmax, one anti-join to re-clamp seeds. Label frames are
  * node-sized and are NEVER force-broadcast (the q143 lesson) —
  * placement stays with Catalyst/AQE; the cached symmetric edge frame
  * is pre-partitioned on the join key so only labels move.
  */
object LabelProp {

  /** Final (v, lab) frame after `rounds` rounds of spreading `seeds`
    * (columns v, lab) over `rawEdges` (columns a, b; canonicalized,
    * de-duplicated, self-loops dropped).
    */
  def spread(
      spark: SparkSession,
      rawEdges: DataFrame,
      seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = rawEdges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val sym = und
      .union(und.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("b"))
      .cache()
    val seedsC = seeds.select(col("v"), col("lab")).cache()
    try {
      var labels = seedsC
      val w = Window.partitionBy(col("a"))
        .orderBy(col("c").desc, col("lab"))
      for (r <- 1 to rounds) {
        val cnt = sym
          .join(labels.withColumnRenamed("v", "b"), "b")
          .groupBy(col("a"), col("lab"))
          .agg(count(lit(1)).as("c"))
        val pick = cnt.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("a").as("v"), col("lab"))
        val next = seedsC.unionByName(
          pick.join(seedsC.select(col("v")), Seq("v"), "left_anti"))
        labels =
          if (r == rounds) next
          else next.localCheckpoint(eager = false)
      }
      val out = labels.localCheckpoint(eager = true)
      out
    } finally {
      sym.unpersist()
      seedsC.unpersist()
    }
  }
}
