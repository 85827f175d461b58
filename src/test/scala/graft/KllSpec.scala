package graft

import graft.operators.KllQuantile
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile sketch: small-n exactness and merge associativity —
  * the properties that make it the mergeable 100 TB quantile path.
  */
class KllSpec extends AnyFunSuite {

  private def sketchOf(vs: Seq[Double], k: Int): Array[Byte] =
    KllQuantile.sketchPartition(vs.iterator.map(("g", _)), k).next()._2

  test("below k the sketch is EXACT (stores every value)") {
    val s = sketchOf((1 to 100).map(_.toDouble), 200)
    assert(KllQuantile.n(s) == 100L)
    // inclusive quantile: smallest value whose inclusive rank >= q
    assert(KllQuantile.quantile(s, 0.5) == 50.0)
    assert(KllQuantile.quantile(s, 0.1) == 10.0)
    assert(KllQuantile.quantile(s, 1.0) == 100.0)
  }

  test("merging uncompacted halves equals the direct sketch exactly") {
    val k = 200
    val a = sketchOf((1 to 50).map(_.toDouble), k)
    val b = sketchOf((51 to 100).map(_.toDouble), k)
    val m = KllQuantile.merge(a, b, k)
    val direct = sketchOf((1 to 100).map(_.toDouble), k)
    assert(KllQuantile.n(m) == 100L)
    Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0).foreach { q =>
      assert(KllQuantile.quantile(m, q) == KllQuantile.quantile(direct, q),
        s"q=$q")
    }
  }

  test("compacted sketch ranks stay inside the k=400 error envelope") {
    val k = 400
    val n = 50000
    val vs = (1 to n).map(i => ((i * 2654435761L) % 1000003L).toDouble)
    val s = sketchOf(vs, k)
    assert(KllQuantile.n(s) == n.toLong)
    val sorted = vs.sorted
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val est = KllQuantile.quantile(s, q)
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) <= 0.02, s"q=$q rank=$rank")
    }
  }
}
