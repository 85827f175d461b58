package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall measurements for the approximate similarity paths against the
  * exact brute-force baseline (q50).
  */
class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  private def top5(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet

  test("IVF ANN recall beats the scanned-fraction floor") {
    val exact = top5("q50_cosine_topk")
    val ivf = top5("q54_ann_ivf_topk")
    assert(ivf.nonEmpty)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    // 4 of 16 cells probed ≈ 25% of the corpus scanned; on the synthetic
    // near-orthogonal embeddings recall should at least track that floor
    assert(recall >= 0.15, s"IVF recall@5 = $recall")
    // and every IVF hit must be a genuine vector id
    assert(ivf.forall { case (q, n) => q < 20 && n >= 0 && q != n })
  }
}
