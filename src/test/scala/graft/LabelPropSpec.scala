package graft

import graft.operators.LabelProp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Label spreading on planted graphs: communities adopt their seed's
  * label, seeds stay clamped, ties break to the smallest label, and
  * unreachable vertices stay unlabeled.
  */
class LabelPropSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def spreadMap(edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] =
    LabelProp.spread(spark, edges.toDF("a", "b"), seeds.toDF("v", "lab"),
      rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques bridged by one edge keep their seed labels") {
    val c1 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val c2 = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = c1 ++ c2 :+ (4L, 11L)
    val out = spreadMap(edges, Seq((1L, 7L), (14L, 9L)), rounds = 4)
    assert((1L to 4L).forall(out(_) == 7L), s"clique 1 mislabeled: $out")
    assert((11L to 14L).forall(out(_) == 9L), s"clique 2 mislabeled: $out")
  }

  test("seeds stay clamped even when outvoted by neighbors") {
    // star: center 0 seeded 5, all leaves seeded 1 — the center's
    // neighbors all say 1 but the clamp keeps 5
    val edges = (1L to 4L).map(l => (0L, l))
    val out = spreadMap(edges, Seq((0L, 5L)) ++ (1L to 4L).map(_ -> 1L), 3)
    assert(out(0L) == 5L)
    assert((1L to 4L).forall(out(_) == 1L))
  }

  test("ties break to the smallest label, deterministically") {
    // v=0 has exactly one neighbor of label 3 and one of label 2
    val edges = Seq((0L, 1L), (0L, 2L))
    val out = spreadMap(edges, Seq((1L, 3L), (2L, 2L)), rounds = 1)
    assert(out(0L) == 2L)
  }

  test("vertices with no labeled path stay unlabeled") {
    val edges = Seq((1L, 2L), (10L, 11L))
    val out = spreadMap(edges, Seq((1L, 4L)), rounds = 3)
    assert(out.get(10L).isEmpty && out.get(11L).isEmpty)
    assert(out(2L) == 4L)
  }

  test("labels cross k hops in k rounds, not fewer") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val r1 = spreadMap(path, Seq((1L, 6L)), rounds = 1)
    assert(r1.get(3L).isEmpty, "label must not skip a hop")
    val r3 = spreadMap(path, Seq((1L, 6L)), rounds = 3)
    assert(r3(4L) == 6L)
  }
}
