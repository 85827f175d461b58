package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct sketch over 64-bit hashes — the
  * corpus-overlap estimator of a training-data pipeline: per-source
  * sketches are tiny (k longs), mergeable, and two sketches estimate
  * |A|, |B|, |A∪B|, Jaccard, and |A∩B| WITHOUT ever joining the two
  * corpora. At 100 TB that is "read each corpus once, shuffle k longs
  * per group" versus a distinct-shingle semi join across corpora.
  *
  * The aggregation is a Spark [[Aggregator]], so partial aggregation
  * (map-side combine) keeps at most k values per partition — the
  * shuffle carries sketches, never shingles. Below k distinct inputs
  * the sketch IS the exact distinct set, so small groups pay nothing
  * for the approximation.
  *
  * Estimators (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07):
  *  - distinct:  (k-1) / u(h_k)   where u maps hashes to (0,1)
  *  - Jaccard:   |{x ∈ kmin(A∪B) : x ∈ A ∧ x ∈ B}| / |kmin(A∪B)|
  *  - intersect: J · |A∪B|-estimate
  */
object KmvSketch {

  /** Sorted (signed order) array of the ≤ k smallest distinct hashes.
    * Signed order IS uniform-hash order after the +2⁻¹ shift in
    * [[toUnit]], so no unsigned gymnastics are needed anywhere.
    */
  type Sketch = Array[Long]

  final class KmvAgg(k: Int) extends Aggregator[Long, Sketch, Sketch] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: Sketch = Array.emptyLongArray

    override def reduce(buf: Sketch, h: Long): Sketch = {
      // full sketch and the hash can't displace anything: the hot path
      if (buf.length == k && h >= buf(k - 1)) return buf
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) return buf // already present
      val ins = -pos - 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
      out
    }

    override def merge(a: Sketch, b: Sketch): Sketch = mergeK(a, b, k)

    override def finish(s: Sketch): Sketch = s

    override def bufferEncoder: Encoder[Sketch] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Sketch] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Untyped aggregate column: `df.groupBy(g).agg(kmv(1024, col("h")))`. */
  def kmv(k: Int, h: Column): Column = udaf(new KmvAgg(k)).apply(h)

  /** Merge two sorted-distinct sketches, keeping the k smallest. */
  def mergeK(a: Sketch, b: Sketch, k: Int): Sketch = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Map a 64-bit hash to (0, 1): signed order preserved. */
  private def toUnit(h: Long): Double =
    h.toDouble / 1.8446744073709552e19 + 0.5 // h / 2^64 + 1/2

  /** Estimated distinct count: exact when the sketch never filled. */
  def distinctEstimate(s: Sketch, k: Int): Double =
    if (s.length < k) s.length.toDouble
    else (k - 1).toDouble / toUnit(s(k - 1))

  /** (jaccard, unionEstimate, intersectionEstimate) of two sketches. */
  def overlapEstimate(a: Sketch, b: Sketch, k: Int): (Double, Double, Double) = {
    val m = mergeK(a, b, k)
    val union = distinctEstimate(m, k)
    if (m.isEmpty) return (0.0, 0.0, 0.0)
    var both = 0
    var i = 0
    while (i < m.length) {
      if (java.util.Arrays.binarySearch(a, m(i)) >= 0 &&
          java.util.Arrays.binarySearch(b, m(i)) >= 0) both += 1
      i += 1
    }
    val j = both.toDouble / m.length
    (j, union, j * union)
  }
}
