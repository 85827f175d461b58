package graft.operators

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

/** KLL quantile sketch plumbing (Karnin–Lang–Liberty, FOCS'16; the
  * Apache DataSketches implementation shipped with Spark's jars) — the
  * MERGEABLE quantile path for 100 TB: one pass builds a KB-sized
  * sketch per (partition, group), sketches merge associatively on
  * group-count-sized frames, and any quantile answers from the merged
  * sketch with a guaranteed normalized rank error (~0.45% at k = 400).
  * Contrast ExactQuantile's 3 bounded passes (exact, but re-scans) and
  * `approx_percentile` (not exposed as a persistable/mergeable state).
  * Below k inputs the sketch stores every value — small groups are
  * exact, and merges of uncompacted sketches are deterministic.
  */
object KllQuantile {

  /** One local sketch per group over a partition's rows. */
  def sketchPartition(
      rows: Iterator[(String, Double)], k: Int)
      : Iterator[(String, Array[Byte])] = {
    val m = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
    rows.foreach { case (g, v) =>
      m.getOrElseUpdate(g, KllDoublesSketch.newHeapInstance(k)).update(v)
    }
    m.iterator.map { case (g, s) => (g, s.toByteArray) }
  }

  /** Merge two serialized sketches (associative, commutative). */
  def merge(a: Array[Byte], b: Array[Byte], k: Int): Array[Byte] = {
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(a)))
    s.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    s.toByteArray
  }

  /** Inclusive quantile from a serialized sketch. */
  def quantile(bytes: Array[Byte], q: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getQuantile(q)

  def n(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
}
