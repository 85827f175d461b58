package graft.txn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-dimensional Z-order (Morton) clustering for compaction: each
  * column is bucketed into 2^bits uniform levels between its min and
  * max (one distributed agg — no global windows, no driver sort), the
  * bucket ids bit-interleave round-robin into a Morton code, and
  * range-partitioning on that code gives every output file a bounded
  * hyper-rectangle in EVERY dimension — so [[DataSkipping]] prunes on
  * any clustered column, which a single-column sort can only do for
  * its own column.
  */
object ZOrder {

  /** Round-robin bit interleave: bit k of column i lands at position
    * k * N + i (for N=2 this is the classic Morton a-even/b-odd).
    */
  private[txn] def interleave(cs: Seq[Column], bits: Int): Column = {
    val n = cs.size
    require(n * bits <= 62, s"$n columns x $bits bits overflows a long")
    cs.zipWithIndex.foldLeft(lit(0L)) { case (acc0, (c, i)) =>
      (0 until bits).foldLeft(acc0) { (acc, k) =>
        acc + shiftleft(shiftright(c, k).bitwiseAND(lit(1L)), k * n + i)
      }
    }
  }

  /** df with a `_z` Morton-code column over the given columns (≥ 2). */
  def withZ(df: DataFrame, cols: Seq[String], bits: Int = 12): DataFrame =
    withCurve(df, cols, bits, hilbert = false)

  /** df with a `_z` HILBERT-index column: consecutive codes are always
    * Manhattan-distance-1 neighbors (Morton jumps across the space at
    * power-of-two boundaries), so range queries touch fewer files for
    * the same file count. Index math is Skilling's public-domain
    * transform ("Programming the Hilbert curve", AIP Conf. Proc. 707,
    * 2004). Per-row cost is a tiny bit loop on the REWRITE path only —
    * queries never evaluate it.
    */
  def withHilbert(df: DataFrame, cols: Seq[String], bits: Int = 12): DataFrame =
    withCurve(df, cols, bits, hilbert = true)

  private def withCurve(
      df: DataFrame, cols: Seq[String], bits: Int, hilbert: Boolean): DataFrame = {
    require(cols.size >= 2, "curve clustering takes at least two columns")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = (1 << bits).toDouble
    def bucket(c: String, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, Double.MinPositiveValue)
      least(lit((n - 1).toLong),
        floor((col(c).cast("double") - lit(lo)) / lit(span) * lit(n))
          .cast("long"))
    }
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      bucket(c, row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
    if (!hilbert) df.withColumn("_z", interleave(buckets, bits))
    else {
      val idx = udf((xs: Seq[Long]) => hilbertIndex(bits, xs.toArray))
      df.withColumn("_z", idx(array(buckets: _*)))
    }
  }

  /** Hilbert index of bucketed coords (each < 2^bits). Skilling's
    * axes-to-transpose transform, then the transpose bits interleave
    * MSB-first into one long. `n * bits` must fit in 62 bits.
    */
  private[graft] def hilbertIndex(bits: Int, coords: Array[Long]): Long = {
    val n = coords.length
    require(n * bits <= 62, s"$n dims x $bits bits overflows a long")
    val X = coords.clone()
    // inverse undo excess work
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((X(i) & q) != 0L) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { X(i) ^= X(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((X(n - 1) & q) != 0L) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { X(i) ^= t; i += 1 }
    // transpose -> index: MSB-first, column-major across dimensions
    var out = 0L
    var k = bits - 1
    while (k >= 0) {
      var j = 0
      while (j < n) {
        out = (out << 1) | ((X(j) >> k) & 1L)
        j += 1
      }
      k -= 1
    }
    out
  }
}
