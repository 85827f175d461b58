package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ExactQuantile

/** ExactQuantile must (a) agree with the brute-force rank definition
  * (value at rank ceil(num·n/den) per group, ascending) and (b) REFUSE
  * loudly when |groups| × buckets would blow the driver's histogram walk
  * — silent OOM on a high-cardinality group column is the failure mode
  * the guard exists to kill.
  */
class ExactQuantileSpec extends AnyFunSuite {
  import SparkTestSession._

  private def frame = {
    import spark.implicits._
    (0L until 3000L).map(i => (s"g${i % 7}", (i * 2654435761L) % 10007L))
      .toDF("grp", "v").repartition(8)
  }

  test("quantiles match the brute-force rank per group") {
    val df = frame
    val got = ExactQuantile.quantiles(df, col("grp"), col("v"),
        Seq(("p50", 1L, 2L), ("p90", 9L, 10L)), buckets = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val brute = df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
      .flatMap { case (g, rows) =>
        val vs = rows.map(_._2).sorted
        def rank(num: Long, den: Long): Long =
          vs(((num * vs.length + den - 1) / den - 1).toInt)
        Seq((g, "p50") -> rank(1, 2), (g, "p90") -> rank(9, 10))
      }
    assert(got == brute)
  }

  test("the driver-cell guard refuses groups x buckets over the bound") {
    val e = intercept[IllegalArgumentException] {
      ExactQuantile.quantiles(frame, col("grp"), col("v"),
        Seq(("p50", 1L, 2L)), buckets = 8 * 1024 * 1024)
    }
    assert(e.getMessage.contains("driver histogram cells"), e.getMessage)
  }
}
