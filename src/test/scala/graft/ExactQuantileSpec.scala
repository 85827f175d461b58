package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ExactQuantile

/** ExactQuantile must (a) agree with the brute-force rank definition
  * (value at rank ceil(num·n/den) per group, ascending), (b) CHUNK the
  * bracket passes when |groups| × buckets exceeds the driver histogram
  * budget — more jobs, same exact answers — and (c) refuse loudly only
  * when even one stats row per group would blow the driver.
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

  test("a groups x buckets load ABOVE the cell budget chunks the passes " +
      "and still returns exact answers") {
    val df = frame
    // budget 100 cells at 64 buckets -> chunk size 1 -> 7 chunks, one
    // bracket pass per group; the union must equal the brute force
    val got = ExactQuantile.quantiles(df, col("grp"), col("v"),
        Seq(("p50", 1L, 2L), ("p90", 9L, 10L)), buckets = 64,
        maxDriverCells = 100L)
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
    // weighted flavor under the same forced chunking: weight 1 per row
    // must reproduce the unweighted answers
    val gotW = ExactQuantile.weightedQuantiles(df, col("grp"), col("v"),
        org.apache.spark.sql.functions.lit(1L),
        Seq(("p50", 1L, 2L), ("p90", 9L, 10L)), buckets = 64,
        maxDriverCells = 100L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(gotW == brute)
  }

  test("only a group COUNT beyond the budget refuses (pre-aggregate)") {
    val e = intercept[IllegalArgumentException] {
      ExactQuantile.quantiles(frame, col("grp"), col("v"),
        Seq(("p50", 1L, 2L)), buckets = 64, maxDriverCells = 3L)
    }
    assert(e.getMessage.contains("pre-aggregate"), e.getMessage)
  }
}
