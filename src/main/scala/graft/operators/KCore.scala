package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by iterated peeling (Matula–Beck / Batagelj–
  * Zaveršnik, distributed): repeatedly drop vertices of degree < k
  * until the survivor set is stable — the classic community/robustness
  * screen beside [[Triangles]], [[ConnectedComponents]] and
  * [[PageRank]] in the graph family.
  *
  * Per round, ONE degree aggregate over the (cached, a-partitioned)
  * symmetric edge frame plus TWO vertex-keyed semi-joins — no node
  * frame is ever broadcast unconditionally (the q143 lesson: survivor
  * sets are node-sized, so placement is left to Catalyst/AQE, which
  * broadcasts small survivor frames and shuffle-joins billion-node
  * ones). Rounds are bounded by the peel depth; a path graph
  * degenerates to O(|V|) rounds, so the loop THROWS past `maxIter`
  * rather than looping silently — the [[ConnectedComponents]] cap
  * convention.
  *
  * The q241 oracle spells the identical rounds as unrolled CTEs, so
  * the converged fixture state is driver-hash-checked end to end.
  */
object KCore {

  /** Surviving SYMMETRIC edge frame (a, b) of the k-core of
    * `rawEdges` (columns `a`, `b`; canonicalized and de-duplicated
    * here, self-loops dropped). Both (a,b) and (b,a) appear, so
    * degree = per-`a` row count and vertices = distinct `a`.
    */
  def core(
      spark: SparkSession,
      rawEdges: DataFrame,
      k: Int,
      maxIter: Int = 50): DataFrame =
    coreWithRounds(spark, rawEdges, k, maxIter)._1

  /** [[core]] plus the number of peel rounds it took to converge —
    * callers whose ORACLE unrolls a fixed round count assert coverage
    * with it (an under-unrolled oracle must fail loudly, not mismatch
    * mysteriously).
    */
  def coreWithRounds(
      spark: SparkSession,
      rawEdges: DataFrame,
      k: Int,
      maxIter: Int = 50): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val und = rawEdges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    var cur = und
      .union(und.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("a"))
      .persist()
    var n = cur.count()
    var it = 0
    var done = n == 0L
    while (!done) {
      it += 1
      if (it > maxIter) {
        cur.unpersist()
        throw new IllegalStateException(
          s"k-core peeling did not converge in $maxIter rounds " +
            s"($n live directed edges) — raise maxIter for deep-peel " +
            "graphs (paths/trees peel O(|V|) rounds)")
      }
      val keep = cur.groupBy(col("a"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("a").as("v"))
      val next = cur
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .persist()
      val nn = next.count()
      cur.unpersist()
      cur = next
      done = nn == n
      n = nn
    }
    // hand back a lineage-cut, cache-free frame: the caller must not
    // depend on our persisted intermediate (ExactQuantile cleanup rule)
    val out = cur.localCheckpoint(eager = true)
    cur.unpersist()
    (out, it)
  }
}
