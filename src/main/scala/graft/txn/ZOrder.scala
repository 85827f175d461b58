package graft.txn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-dimensional Z-order (Morton) clustering for compaction: each
  * column is bucketed into 2^bits uniform levels between its min and
  * max (one distributed agg — no global windows, no driver sort), the
  * two bucket ids bit-interleave into a Morton code, and range-
  * partitioning on that code gives every output file a bounded
  * rectangle in BOTH dimensions — so [[DataSkipping]] prunes on either
  * column, which a single-column sort can only do for its own column.
  */
object ZOrder {

  /** Interleave the low `bits` of a (even positions) and b (odd). */
  private[txn] def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, k) =>
      acc +
        shiftleft(shiftright(a, k).bitwiseAND(lit(1L)), 2 * k) +
        shiftleft(shiftright(b, k).bitwiseAND(lit(1L)), 2 * k + 1)
    }

  /** df with a `_z` Morton-code column over the two given columns. */
  def withZ(df: DataFrame, cols: Seq[String], bits: Int = 12): DataFrame = {
    require(cols.size == 2, "ZOrder.withZ takes exactly two columns")
    val Seq(c1, c2) = cols
    val row = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).collect()(0)
    val n = (1 << bits).toDouble
    def bucket(c: String, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, Double.MinPositiveValue)
      least(lit((n - 1).toLong),
        floor((col(c).cast("double") - lit(lo)) / lit(span) * lit(n))
          .cast("long"))
    }
    df.withColumn("_z", interleave(
      bucket(c1, row.getDouble(0), row.getDouble(1)),
      bucket(c2, row.getDouble(2), row.getDouble(3)), bits))
  }
}
