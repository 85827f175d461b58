package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The size-gated rank-frame placement: broadcast and shuffle-hash paths
  * must be bit-identical (integer-exact arithmetic leaves no room for
  * drift), and the shuffle path must not materialize ANY broadcast — the
  * property that makes it safe on a billion-node graph.
  */
class PageRankSpec extends AnyFunSuite {
  import SparkTestSession._

  private def orderEdges = Tables.load(spark, sf, "orders")
    .select((col("o_orderkey") % 1000).as("src"),
      (col("o_custkey") % 1000).as("dst"))

  test("broadcast and shuffle paths agree bit-for-bit on the fixture") {
    def rows(bc: Boolean) =
      PageRank.run(spark, orderEdges, iterations = 4,
          broadcastRanks = Some(bc))
        .orderBy(col("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(bc = true) == rows(bc = false))
  }

  test("shuffle path plans no broadcast exchange over the rank frame") {
    val ranks = PageRank.run(spark, orderEdges, iterations = 2,
      broadcastRanks = Some(false), cleanup = false)
    val p = ranks.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastExchange"),
      s"rank frame must shuffle, not broadcast:\n${p.take(3000)}")
    assert(p.contains("ShuffledHashJoin"),
      s"expected shuffle-hash rank joins:\n${p.take(3000)}")
  }

  test("auto gate: node count above the cap selects the shuffle path") {
    // 1000 nodes with a 999-node cap → shuffle path (no broadcast)
    val ranks = PageRank.run(spark, orderEdges, iterations = 1,
      maxBroadcastNodes = 999, cleanup = false)
    val p = ranks.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastExchange"))
  }
}
