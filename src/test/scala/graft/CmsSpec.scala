package graft

import graft.operators.CountMinSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch: the two CMS inequalities against exact counts,
  * merge/batch invariance (the property that makes the Aggregator's
  * map-side combine safe under any partitioning), and the SQL surface.
  */
class CmsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = 4
  private val w = 64 // deliberately tight so collisions actually occur

  // skewed multiset: key k appears 3k+1 times, keys 0..199
  private val data: Seq[Long] =
    (0L until 200L).flatMap(k => Seq.fill(3 * k.toInt + 1)(k))
  private val n = data.size.toLong
  private val exact: Map[Long, Long] =
    data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def sketchOf(values: Seq[Long], parts: Int): Array[Long] = {
    import spark.implicits._
    values.toDF("v").repartition(parts)
      .agg(CountMinSketch.cms(d, w, col("v")))
      .head().getSeq[Long](0).toArray
  }

  test("never under-counts and respects the e/w over-count bound") {
    val sk = sketchOf(data, 8)
    exact.foreach { case (k, t) =>
      val est = CountMinSketch.estimate(sk, k, d, w)
      assert(est >= t, s"under-count at $k: est=$est true=$t")
      assert((est - t) * w <= 3 * n,
        s"over-count past eps*N at $k: est=$est true=$t n=$n")
    }
  }

  test("sketch is invariant to partitioning (merge correctness)") {
    assert(sketchOf(data, 1).toSeq == sketchOf(data, 16).toSeq)
  }

  test("unseen keys estimate only collision mass") {
    val sk = sketchOf(data, 4)
    (1000L until 1020L).foreach { k =>
      val est = CountMinSketch.estimate(sk, k, d, w)
      assert(est * w <= 3 * n, s"ghost mass too large for unseen $k: $est")
    }
  }

  test("empty input finishes to an all-zero matrix, not a crash") {
    import spark.implicits._
    val sk = Seq.empty[Long].toDF("v")
      .agg(CountMinSketch.cms(d, w, col("v")))
      .head().getSeq[Long](0).toArray
    assert(sk.length == d * w && sk.forall(_ == 0L))
    assert(CountMinSketch.estimate(sk, 7L, d, w) == 0L)
  }

  test("graft_cms SQL aggregate registers and aggregates per group") {
    graft.functions.GraftExtensions.install(spark)
    import spark.implicits._
    data.map(v => (v % 2, v)).toDF("g", "v").createOrReplaceTempView("cms_in")
    val rows = spark.sql(
      "SELECT g, graft_cms(v) AS sk FROM cms_in GROUP BY g ORDER BY g")
      .collect()
    assert(rows.length == 2)
    val skEven = rows(0).getSeq[Long](1).toArray
    // SQL surface is 4x512; estimate for key 198 (398+... appears 595x)
    val est = CountMinSketch.estimate(skEven, 198L, 4, 512)
    assert(est >= exact(198L))
  }
}
