package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-bucket guard for bucketed candidate self-joins (MinHash-LSH bands,
  * sign-LSH slots, SimHash blocks, SemDeDup cells).
  *
  * A bucketed self-join is quadratic IN THE BUCKET: one degenerate bucket
  * (the all-identical boilerplate flood every web corpus contains) turns
  * the "linear" LSH plan into O(n²) on a single key — the canonical
  * scale-killer skew shape. The guard bounds per-bucket work:
  *
  *  - buckets with ≤ `cap` members pair densely (all C(n,2) pairs) —
  *    exact, unchanged semantics; fixture-scale corpora never exceed the
  *    cap, so parity specs against brute-force baselines stay exact;
  *  - buckets wider than `cap` pair every member with the bucket's MIN id
  *    only (a star): per-bucket pairs collapse from quadratic to linear.
  *
  * Star routing — rather than drop-with-log — is the semantics-preserving
  * choice for the flood case: a degenerate bucket is degenerate BECAUSE
  * its members are near-identical, so every member verifies against the
  * representative, connected components still collapses the flood to one
  * keeper, and keep-first dedup drops exactly the docs it should. Pairs
  * between two non-representative members of a MIXED oversized bucket can
  * be missed — the standard LSH recall trade, and the other bands of a
  * banded scheme recover them.
  */
object SkewGuard {

  /** Default bucket-width cap: bounds per-bucket pair generation at
    * cap(cap−1)/2 ≈ 32k pairs. LSH band widths are corpus-adaptive
    * (EmbeddingOps.lshAutoBits targets ~32 occupants), so any bucket past
    * this cap is a pathological collision, not normal density.
    */
  val DefaultCap = 256

  /** Candidate pairs (outA < outB, distinct) from a bucketed self-join of
    * `slots`, with per-bucket width bounded by `cap` as described above.
    * One shuffle computes both window stats; the self-join reuses the
    * bucket partitioning.
    */
  def boundedSelfJoinPairs(
      slots: DataFrame,
      idCol: String,
      bucketCols: Seq[String],
      outA: String,
      outB: String,
      cap: Int = DefaultCap): DataFrame = {
    require(cap >= 1, s"cap must be positive, got $cap")
    val w = Window.partitionBy(bucketCols.map(col): _*)
    val counted = slots
      .withColumn("_sg_bn", count(lit(1)).over(w))
      .withColumn("_sg_rep", min(col(idCol)).over(w))
    val dense0 = counted.filter(col("_sg_bn") <= cap)
    val dense = dense0.as("a").join(dense0.as("b"),
        bucketCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as(outA), col(s"b.$idCol").as(outB))
    // rep = bucket min, so rep < id holds for every emitted star pair
    val star = counted
      .filter(col("_sg_bn") > cap && col(idCol) =!= col("_sg_rep"))
      .select(col("_sg_rep").as(outA), col(idCol).as(outB))
    dense.unionAll(star).dropDuplicates(outA, outB)
  }
}
