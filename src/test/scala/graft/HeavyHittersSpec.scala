package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HeavyHitters

/** Misra-Gries: containment of all true heavies across a distributed
  * (partitioned + merged) execution, bounded summary size, bounded count
  * underestimate, and exactHeavy == the brute-force answer.
  */
class HeavyHittersSpec extends AnyFunSuite {
  import SparkTestSession._

  // 4 heavy keys (1..4 at 10% each) + uniform tail over 10k keys,
  // spread over 16 partitions so merges genuinely happen
  private def skewed = spark.range(0, 100000, 1, 16).toDF("id").select(
    when(col("id") % 10 < 4, col("id") % 10 + 1)
      .otherwise(col("id") % 10000 + 1000).as("key"))

  test("summary contains every key above n/(k+1), size ≤ k") {
    val cand = HeavyHitters.candidates(skewed, col("key"), k = 20)
    assert(cand.length <= 20)
    assert(Set(1L, 2L, 3L, 4L).subsetOf(cand.toSet),
      s"missed a 10% key in ${cand.mkString(",")}")
  }

  test("kept counters underestimate by at most n/(k+1)") {
    import spark.implicits._
    val k = 20
    val mg = new HeavyHitters.MisraGries(k)
    val s = skewed.select(col("key").as[Long]).select(mg.toColumn).head()
    val exact = skewed.groupBy("key").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 100000L
    s.keys.zip(s.counts).foreach { case (key, c) =>
      val ex = exact.getOrElse(key, 0L)
      assert(c <= ex, s"MG overcounts $key: $c > $ex")
      assert(ex - c <= n / (k + 1), s"error ${ex - c} beyond n/(k+1) for $key")
    }
  }

  test("exactHeavy equals the brute GROUP BY / HAVING answer") {
    val k = 20
    val got = HeavyHitters.exactHeavy(skewed, col("key"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val n = skewed.count()
    val brute = skewed.groupBy("key").count()
      .filter(col("count") > n / (k + 1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got == brute)
    assert(got.map(_._1) == Set(1L, 2L, 3L, 4L))
  }

  test("no heavies → empty result, not an error") {
    val uniform = spark.range(0, 20000).toDF("id")
      .select((col("id") % 5000).as("key"))
    assert(HeavyHitters.exactHeavy(uniform, col("key"), 10).count() == 0)
  }
}
