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
  def withZ(df: DataFrame, cols: Seq[String], bits: Int = 12): DataFrame = {
    require(cols.size >= 2, "ZOrder.withZ takes at least two columns")
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
    df.withColumn("_z", interleave(buckets, bits))
  }
}
