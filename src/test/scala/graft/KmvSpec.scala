package graft

import graft.operators.KmvSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch: exactness below k, estimation accuracy above it, merge
  * order-invariance (what makes partial aggregation correct), and the
  * Spark udaf wiring end-to-end.
  */
class KmvSpec extends AnyFunSuite {
  import SparkTestSession._

  private def h(x: Long): Long =
    // a cheap splittable 64-bit mix (xxhash-ish avalanche), enough for
    // uniformity in the estimator tests
    {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

  private def sketchOf(xs: Iterator[Long], k: Int): Array[Long] = {
    val agg = new KmvSketch.KmvAgg(k)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
  }

  test("below k the sketch is the exact distinct set") {
    val k = 256
    val s = sketchOf(((0L until 100L).map(h) ++ (0L until 100L).map(h))
      .iterator, k)
    assert(s.length == 100)
    assert(KmvSketch.distinctEstimate(s, k) == 100.0)
    assert(s.sorted.sameElements(s), "sketch must stay sorted")
  }

  test("estimate within 10% at 200k distinct, k=1024") {
    val k = 1024
    val n = 200000L
    val s = sketchOf((0L until n).iterator.map(h), k)
    val est = KmvSketch.distinctEstimate(s, k)
    assert(math.abs(est - n) / n < 0.10, s"est $est vs $n")
  }

  test("merge is batch-invariant: halves merge to the full sketch") {
    val k = 512
    val full = sketchOf((0L until 50000L).iterator.map(h), k)
    val a = sketchOf((0L until 25000L).iterator.map(h), k)
    val b = sketchOf((25000L until 50000L).iterator.map(h), k)
    assert(KmvSketch.mergeK(a, b, k).sameElements(full))
    assert(KmvSketch.mergeK(b, a, k).sameElements(full), "merge commutes")
  }

  test("overlap estimates: planted 1/3 Jaccard within 10%") {
    val k = 1024
    val a = sketchOf((0L until 100000L).iterator.map(h), k)
    val b = sketchOf((50000L until 150000L).iterator.map(h), k)
    val (j, union, inter) = KmvSketch.overlapEstimate(a, b, k)
    assert(math.abs(union - 150000) / 150000.0 < 0.10, s"union $union")
    assert(math.abs(inter - 50000) / 50000.0 < 0.15, s"inter $inter")
    assert(math.abs(j - 1.0 / 3) < 0.05, s"jaccard $j")
  }

  test("Spark udaf path agrees with the direct fold") {
    val k = 64
    import spark.implicits._
    val df = (0L until 1000L).map(h).toDF("x")
      .select((col("x")).as("h"))
    val viaSpark = df.agg(KmvSketch.kmv(k, col("h")).as("sk"))
      .head().getSeq[Long](0).toArray
    val direct = sketchOf((0L until 1000L).iterator.map(h), k)
    assert(viaSpark.sameElements(direct))
  }

  test("graft_kmv is callable from SQL after install") {
    graft.functions.GraftExtensions.install(spark)
    import spark.implicits._
    (0L until 5000L).map(h).toDF("hv").createOrReplaceTempView("kmv_in")
    val sk = spark.sql("SELECT graft_kmv(hv) AS sk FROM kmv_in")
      .head().getSeq[Long](0).toArray
    val est = KmvSketch.distinctEstimate(sk, 1024)
    assert(math.abs(est - 5000) / 5000.0 < 0.15, s"est $est")
  }
}
