package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY.md §2.4: `Aggregator[IN, BUF, OUT]`).
  *
  * WeightedAvg accumulates in BigDecimal so the merge is exact and
  * order-independent — the same reasoning as the decimal-cast convention
  * in the SQL-backed queries, which is what lets a custom aggregate be
  * DuckDB-oracle-verifiable at all.
  */
object TypedAggs {

  /** (value, weight) → Σ(v·w)/Σ(w), exact until the final division. */
  object WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    private def d(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)

    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    override def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
      (b._1 + d(a._1) * d(a._2), b._2 + d(a._2))
    override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (x._1 + y._1, x._2 + y._2)
    // Exact-decimal → double casts, then ONE double division: the same
    // computation an engine-portable SQL oracle can express
    // (CAST(SUM(..) AS DOUBLE) / CAST(SUM(..) AS DOUBLE)).
    override def finish(r: (BigDecimal, BigDecimal)): Double =
      if (r._2.signum == 0) Double.NaN
      else r._1.toDouble / r._2.toDouble
    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
