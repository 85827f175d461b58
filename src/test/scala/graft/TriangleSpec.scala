package graft

import graft.operators.Triangles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The (degree, id) orientation: identical triangle counts on the
  * fixture graph, and the bounded-wedge guarantee on a planted hot node
  * — the property that makes it the power-law-safe choice.
  */
class TriangleSpec extends AnyFunSuite {
  import SparkTestSession._

  private def cooccurrenceEdges = {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
  }

  test("degree orientation matches id orientation on the fixture graph") {
    val byId = Triangles.count(spark, cooccurrenceEdges, "u", "v",
      degreeOriented = false).head()
    val byDeg = Triangles.count(spark, cooccurrenceEdges, "u", "v",
      degreeOriented = true).head()
    assert(byId.getLong(0) == byDeg.getLong(0), "edge counts must agree")
    assert(byId.getLong(1) == byDeg.getLong(1),
      "triangle totals are orientation-invariant")
  }

  test("shuffle-probe fallback returns the same counts") {
    val b = Triangles.count(spark, cooccurrenceEdges, "u", "v",
      degreeOriented = true, broadcastProbes = true).head()
    val sh = Triangles.count(spark, cooccurrenceEdges, "u", "v",
      degreeOriented = true, broadcastProbes = false).head()
    assert((b.getLong(0), b.getLong(1)) == (sh.getLong(0), sh.getLong(1)))
  }

  test("planted hot node: degree orientation bounds the wedge fan-out") {
    import spark.implicits._
    // star: hub 500 touches every spoke (hub id sits mid-order, the
    // id-orientation worst case: in≈out≈k/2) + a triangle-closing ring
    // edge per adjacent spoke pair on a few spokes
    val k = 1000
    val star = (0 until k).filter(_ != 500).map(i => (math.min(i, 500), math.max(i, 500)))
    val ring = (0 until 20).map(i => (i, i + 1))
    val edges = (star ++ ring).toDF("u", "v")
    val ek = Triangles.packedEdges(edges, "u", "v").cache()

    def wedgeCount(degreeOriented: Boolean): Long = {
      val ed = Triangles.oriented(spark, ek, degreeOriented)
      ed.as("e1").join(ed.as("e2"), col("e1.t") === col("e2.s")).count()
    }
    val wId = wedgeCount(degreeOriented = false)
    val wDeg = wedgeCount(degreeOriented = true)
    // id orientation: the hub's in×out ≈ (k/2)² wedges; degree
    // orientation re-ranks the hub LAST (out-degree 0) so only the
    // ring spokes contribute
    assert(wId > 200000L, s"hot-node id-orientation wedge count was $wId")
    assert(wDeg < 1000L,
      s"degree orientation must bound the hot node's fan-out, got $wDeg")

    // and the counts still agree: exactly the 20 ring triangles
    val tId = Triangles.count(spark, edges, "u", "v", degreeOriented = false).head()
    val tDeg = Triangles.count(spark, edges, "u", "v", degreeOriented = true).head()
    assert(tId.getLong(1) == tDeg.getLong(1))
    assert(tDeg.getLong(1) == 20L)
  }
}
