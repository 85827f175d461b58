package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DistributedOrder

/** DistributedOrder must agree EXACTLY with the unpartitioned window
  * functions it replaces (ROW_NUMBER / cumulative SUM / NTILE OVER an
  * ORDER BY with no PARTITION BY) while planning no Window at all — the
  * single-task window is the scale-killer these operators exist to kill.
  */
class DistributedOrderSpec extends AnyFunSuite {
  import SparkTestSession._

  // many partitions + ties on the value (unique id tiebreak) so partition
  // boundaries land inside tie runs
  private def frame = {
    import spark.implicits._
    (0L until 5000L).map(i => (i, (i * 2654435761L) % 97L))
      .toDF("id", "v").repartition(16)
  }

  test("withRank equals ROW_NUMBER over the same total order") {
    val df = frame
    val got = DistributedOrder.withRank(df, "r", col("v"), col("id"))
      .select(col("id"), col("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("withPrefixSum equals the running and grand total windows") {
    val df = frame
    val got = DistributedOrder
      .withPrefixSum(df, "cum", "tot", col("v"), col("v").desc, col("id"))
      .select(col("id"), col("cum"), col("tot"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val w = Window.orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("id"),
        sum(col("v")).over(w).as("cum"),
        sum(col("v")).over(Window.partitionBy()).as("tot"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == want)
  }

  test("ntileFromRank equals NTILE for uneven splits and n < k") {
    val df = frame
    val n = df.count()
    for (k <- Seq(3, 4, 5, 7)) {
      val got = DistributedOrder.withRank(df, "r", col("v"), col("id"))
        .select(col("id"), DistributedOrder.ntileFromRank("r", n, k).as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df.select(col("id"),
          ntile(k).over(Window.orderBy(col("v"), col("id"))).as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"ntile($k) diverges")
    }
    // n < k: every row is its own tile (ranks 1..n)
    import spark.implicits._
    val tiny = Seq((1L, 5L), (2L, 3L)).toDF("id", "v")
    val got = DistributedOrder.withRank(tiny, "r", col("v"), col("id"))
      .select(col("id"), DistributedOrder.ntileFromRank("r", 2L, 10).as("t"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(2L -> 1, 1L -> 2))
  }

  test("plans contain no Window; the sort is a range exchange, never " +
      "a single-partition one") {
    val ranked = DistributedOrder.withRank(frame, "r", col("v"), col("id"))
    assert(!ranked.queryExecution.executedPlan.toString.contains("Window"))
    // the underlying sort plans a RANGE exchange (parallel, one sorted
    // partition per range) — an unpartitioned window would instead plan
    // Exchange SinglePartition and hold the whole frame in one task.
    // (AQE may coalesce this tiny fixture to one partition at runtime —
    // that is load-adaptive and fine; the STATIC plan shape is what must
    // never funnel.)
    val sortPlan = frame.sort(col("v"), col("id"))
      .queryExecution.executedPlan.toString
    assert(sortPlan.contains("Exchange rangepartitioning"),
      s"expected a distributed range sort:\n$sortPlan")
    assert(!sortPlan.contains("Exchange SinglePartition"))
  }

  test("withPrefixMin equals the exclusive running-min window " +
      "(Long.MaxValue before the first row)") {
    val df = frame
    val got = DistributedOrder
      .withPrefixMin(df, "pm", col("v"), col("id"))
      .select(col("id"), col("pm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.select(col("id"),
        coalesce(min(col("v")).over(w), lit(Long.MaxValue)).as("pm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want && got(0L) == Long.MaxValue)
  }
}
