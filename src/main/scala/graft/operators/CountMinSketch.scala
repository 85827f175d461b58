package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * the point-frequency companion to the KMV distinct sketch
  * ([[KmvSketch]]) and the HLL gate family: a d×w counter matrix whose
  * point estimate is the MINIMUM over d seeded rows. Guarantees, for a
  * stream of N increments:
  *
  *  - never under-counts: est(x) ≥ true(x) (every row counts x, plus
  *    non-negative collision mass);
  *  - ε-bounded over-count: est(x) ≤ true(x) + ε·N with probability
  *    ≥ 1 − δ, for ε = e/w, δ = e^−d.
  *
  * The sketch is elementwise-additive, so the aggregation is a Spark
  * [[Aggregator]]: map-side combine sums d·w longs per partition and
  * the shuffle carries ONE matrix per partition, never rows — at
  * 100 TB that is the difference between "frequency of any key in one
  * scan + a few KB" and a full groupBy shuffle of every key. The q239
  * driver gate pins both inequalities against DuckDB's exact counts.
  *
  * Row hashing is splitmix64 over (value ⊕ row-salt) — deterministic
  * across JVMs, partitionings, and batch boundaries (CmsSpec proves
  * merge/batch invariance).
  */
object CountMinSketch {

  /** Flattened row-major d×w counter matrix. */
  type Sketch = Array[Long]

  private final val Golden = 0x9E3779B97F4A7C15L

  private def mix(x0: Long): Long = {
    var x = x0 + Golden
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Column index of value `v` in row `row`. */
  def index(v: Long, row: Int, w: Int): Int =
    math.floorMod(mix(v ^ (row.toLong * Golden)), w.toLong).toInt

  final class CmsAgg(d: Int, w: Int)
    extends Aggregator[Long, Sketch, Sketch] {
    require(d >= 1 && w >= 2, s"need d>=1, w>=2; got d=$d w=$w")

    // empty-array zero, not a d·w allocation: Spark serializes the zero
    // once per task even for empty partitions
    override def zero: Sketch = Array.emptyLongArray

    override def reduce(buf0: Sketch, v: Long): Sketch = {
      val buf = if (buf0.length == d * w) buf0 else new Sketch(d * w)
      var r = 0
      while (r < d) {
        buf(r * w + index(v, r, w)) += 1L
        r += 1
      }
      buf
    }

    override def merge(a: Sketch, b: Sketch): Sketch =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }

    override def finish(s: Sketch): Sketch =
      if (s.isEmpty) new Sketch(d * w) else s

    override def bufferEncoder: Encoder[Sketch] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Sketch] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Untyped aggregate column: `df.agg(cms(4, 512, col("key")))`. */
  def cms(d: Int, w: Int, key: Column): Column = udaf(new CmsAgg(d, w)).apply(key)

  /** Point-frequency estimate: min over the d row counters. */
  def estimate(s: Sketch, v: Long, d: Int, w: Int): Long = {
    require(s.length == d * w, s"sketch length ${s.length} != $d*$w")
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = s(r * w + index(v, r, w))
      if (c < best) best = c
      r += 1
    }
    best
  }
}
