package graft

import graft.operators.KCore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-core peeling on planted graphs: a clique survives, pendant
  * structure peels away (including cascades), and the round cap throws
  * instead of spinning.
  */
class KCoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def coreVertices(edges: Seq[(Long, Long)], k: Int,
      maxIter: Int = 50): Set[Long] =
    KCore.core(spark, edges.toDF("a", "b"), k, maxIter)
      .select(col("a")).distinct().collect().map(_.getLong(0)).toSet

  // 5-clique on 1..5
  private val clique: Seq[(Long, Long)] =
    (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j))

  test("a 5-clique IS its own 4-core; pendant chain peels in cascade") {
    // 5 -> 6 -> 7 -> 8: each removal drops the next below degree 4
    val edges = clique ++ Seq((5L, 6L), (6L, 7L), (7L, 8L))
    assert(coreVertices(edges, 4) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("k above the max degree yields an empty core") {
    assert(coreVertices(clique, 5).isEmpty)
  }

  test("2-core keeps cycles, strips trees") {
    // triangle 1-2-3 plus a tree hanging off 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 10L), (10L, 11L), (10L, 12L))
    assert(coreVertices(edges, 2) == Set(1L, 2L, 3L))
  }

  test("duplicate and reversed input edges do not inflate degrees") {
    val edges = clique ++ clique.map { case (a, b) => (b, a) }
    assert(coreVertices(edges, 4) == Set(1L, 2L, 3L, 4L, 5L))
    assert(coreVertices(edges, 5).isEmpty)
  }

  test("the round cap throws on deep peels instead of spinning") {
    // a path peels 2 ends per round: 12 vertices need ~5 rounds at k=2
    val path = (1L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      coreVertices(path, 2, maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    // and with room it converges to empty (a path has no 2-core)
    assert(coreVertices(path, 2).isEmpty)
  }
}
