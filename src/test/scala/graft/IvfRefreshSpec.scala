package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental IVF maintenance (IvfIndex.build/refresh/searchTopK):
  * refresh must be batch-sized work that does not degrade recall vs a
  * full rebuild, and the drift gate must trip on genuine distribution
  * shift — the two failure modes of a grow-only index (stale centroids
  * silently starving recall; needless per-batch retrains burning the
  * cluster).
  */
class IvfRefreshSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vecs: DataFrame =
    Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def freshRoot(name: String): String = {
    val root = java.nio.file.Files.createTempDirectory(name).toString
    new java.io.File(root).delete()
    root
  }

  private def top5(ann: DataFrame): Set[(Long, Long)] =
    ann.collect().map(r => (r.getLong(0), r.getLong(2))).toSet

  private def exactTop5: Set[(Long, Long)] =
    SparkEntry.queries("q50_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet

  test("refresh is append-only growth: counts reconcile across batches, " +
      "no vector lost or duplicated, same-distribution batches never " +
      "trip the drift gate") {
    val root = freshRoot("ivf_refresh")
    val all = vecs.cache()
    val n = all.count()
    graft.operators.IvfIndex.build(spark, root,
      all.filter(col("vec_id") % 5 =!= 4))
    val r1 = graft.operators.IvfIndex.refresh(spark, root,
      all.filter(col("vec_id") % 10 === 4))
    val r2 = graft.operators.IvfIndex.refresh(spark, root,
      all.filter(col("vec_id") % 10 === 9))
    assert(!r1.retrained && !r2.retrained,
      s"same-distribution batches tripped the drift gate: " +
        s"${r1.driftRatio}, ${r2.driftRatio}")
    assert(r1.driftRatio < graft.operators.IvfIndex.DriftFactor)
    val cells = graft.operators.IvfIndex.cellsDF(spark, root).cache()
    assert(cells.count() == n)
    assert(cells.select("vec_id").distinct().count() == n,
      "a vector appeared in two cells")
    // refreshed vectors landed in the SAME cell a from-scratch
    // assignment against these centroids gives (determinism of the
    // argmin under the persisted centroids)
    val cents = graft.operators.IvfIndex.centroidsDF(spark, root)
    assert(cells.select("cell").distinct().count() <= cents.count())
    all.unpersist(); cells.unpersist()
  }

  test("refresh recall tracks a full rebuild on the grown corpus " +
      "(refresh >= rebuild - eps)") {
    val all = vecs.cache()
    val rootInc = freshRoot("ivf_inc")
    graft.operators.IvfIndex.build(spark, rootInc,
      all.filter(col("vec_id") % 5 =!= 4))
    graft.operators.IvfIndex.refresh(spark, rootInc,
      all.filter(col("vec_id") % 5 === 4))
    val rootFull = freshRoot("ivf_full")
    graft.operators.IvfIndex.build(spark, rootFull, all)
    val q = all.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = exactTop5
    def recall(root: String): Double = {
      val hits = top5(graft.operators.IvfIndex.searchTopK(spark, root, q))
      (exact intersect hits).size.toDouble / exact.size
    }
    val (inc, full) = (recall(rootInc), recall(rootFull))
    info(s"recall@5: refresh=$inc rebuild=$full")
    // refresh centroids saw only 80% of the corpus; allow a small gap
    // but NEVER a collapse — the incremental path must stay usable
    assert(inc >= full - 0.1,
      s"refresh recall $inc collapsed vs rebuild $full")
    assert(inc > 0.1, s"refresh recall $inc below the probe floor")
    all.unpersist()
  }

  test("keyed refresh is IDEMPOTENT: a replayed batchId rewrites its " +
      "own rows instead of appending duplicates") {
    val root = freshRoot("ivf_idem")
    val all = vecs.cache()
    val n = all.count()
    graft.operators.IvfIndex.build(spark, root,
      all.filter(col("vec_id") % 5 =!= 4))
    val batch = all.filter(col("vec_id") % 5 === 4)
    val r1 = graft.operators.IvfIndex.refresh(spark, root, batch,
      batchId = Some(7L))
    // the at-least-once replay every foreachBatch stream eventually does
    val r2 = graft.operators.IvfIndex.refresh(spark, root, batch,
      batchId = Some(7L))
    assert(!r1.retrained && !r2.retrained)
    val cells = graft.operators.IvfIndex.cellsDF(spark, root)
    assert(cells.count() == n, "replay must not duplicate rows")
    assert(cells.select("vec_id").distinct().count() == n)
    // bookkeeping n bumped exactly once
    assert(graft.operators.IvfIndex.metaDF(spark, root).head.getLong(1) == n)
    all.unpersist()
  }

  test("probe sweep: recall is monotone in probes and the default " +
      "probe count is on the curve") {
    val all = vecs.cache()
    val root = freshRoot("ivf_sweep")
    graft.operators.IvfIndex.build(spark, root, all)
    val q = all.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = exactTop5
    def hitsAt(p: Int): Int =
      (exact intersect top5(graft.operators.IvfIndex
        .searchTopK(spark, root, q, probesOverride = Some(p)))).size
    val curve = Seq(1, 2, 4, 8).map(p => p -> hitsAt(p))
    info(s"probe curve: ${curve.mkString(", ")}")
    curve.sliding(2).foreach { case Seq((pa, a), (pb, b)) =>
      assert(b >= a, s"recall fell from $a (probes=$pa) to $b (probes=$pb)")
    }
    assert(curve.last._2 > 0)
    all.unpersist()
  }

  test("PQ refresh: codes reconcile across batches, same-distribution " +
      "batches never retrain, ADC recall tracks a full rebuild") {
    val all = vecs.cache()
    val n = all.count()
    val rootInc = freshRoot("pq_inc")
    graft.operators.PqIndex.build(spark, rootInc,
      all.filter(col("vec_id") % 5 =!= 4))
    val r1 = graft.operators.PqIndex.refresh(spark, rootInc,
      all.filter(col("vec_id") % 10 === 4), all)
    val r2 = graft.operators.PqIndex.refresh(spark, rootInc,
      all.filter(col("vec_id") % 10 === 9), all)
    assert(!r1.retrained && !r2.retrained,
      s"same-distribution PQ batches tripped the drift gate: " +
        s"${r1.driftRatio}, ${r2.driftRatio}")
    val codes = graft.operators.PqIndex.codesDF(spark, rootInc).cache()
    // packed layout: ONE row per vector, M codes in the array
    assert(codes.count() == n)
    assert(codes.select(size(col("codes"))).distinct().head.getInt(0) ==
      graft.operators.PqIndex.M)
    assert(codes.select("vec_id").distinct().count() == n)
    val rootFull = freshRoot("pq_full")
    graft.operators.PqIndex.build(spark, rootFull, all)
    val q = all.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = exactTop5
    def recall(root: String): Double = {
      val hits = top5(graft.operators.PqIndex.scoreTopK(spark, root, q))
      (exact intersect hits).size.toDouble / exact.size
    }
    val (inc, full) = (recall(rootInc), recall(rootFull))
    info(s"PQ recall@5: refresh=$inc rebuild=$full")
    assert(inc >= full - 0.1,
      s"PQ refresh recall $inc collapsed vs rebuild $full")
    assert(inc > 0.1, s"PQ refresh recall $inc below chance floor")
    codes.unpersist(); all.unpersist()
  }

  test("PQ keyed refresh is idempotent under replay") {
    val root = freshRoot("pq_idem")
    val all = vecs.cache()
    val n = all.count()
    graft.operators.PqIndex.build(spark, root,
      all.filter(col("vec_id") % 5 =!= 4))
    val batch = all.filter(col("vec_id") % 5 === 4)
    graft.operators.PqIndex.refresh(spark, root, batch, all,
      batchId = Some(3L))
    graft.operators.PqIndex.refresh(spark, root, batch, all,
      batchId = Some(3L))
    val codes = graft.operators.PqIndex.codesDF(spark, root)
    assert(codes.count() == n, "replay must not duplicate code rows")
    assert(graft.operators.PqIndex.metaDF(spark, root).head.getLong(0) == n)
    all.unpersist()
  }

  test("PQ drift gate: a shifted batch trips the retrain (corpus " +
      "evaluated only then)") {
    val root = freshRoot("pq_drift")
    val all = vecs.cache()
    val base = all.filter(col("vec_id") % 5 =!= 4)
    graft.operators.PqIndex.build(spark, root, base)
    val shifted = all.filter(col("vec_id") % 5 === 4)
      .select(col("vec_id"),
        transform(col("v"), x => x + lit(10.0)).as("v"))
    val r = graft.operators.PqIndex.refresh(spark, root, shifted,
      base.unionByName(shifted))
    assert(r.retrained,
      s"shifted PQ batch must retrain, ratio=${r.driftRatio}")
    val n = graft.operators.PqIndex.codesDF(spark, root)
      .select("vec_id").distinct().count()
    assert(n == all.count(), "retrain must cover base ∪ batch")
    all.unpersist()
  }

  test("drift gate: a genuinely shifted batch trips a retrain and the " +
      "retrained index covers base ∪ batch") {
    val root = freshRoot("ivf_drift")
    val all = vecs.cache()
    val base = all.filter(col("vec_id") % 5 =!= 4)
    val nBase = base.count()
    graft.operators.IvfIndex.build(spark, root, base)
    // shift every coordinate by +10: far outside the unit-ish corpus,
    // so the mean nearest-centroid distance explodes past the gate
    val shifted = all.filter(col("vec_id") % 5 === 4)
      .select(col("vec_id"),
        transform(col("v"), x => x + lit(10.0)).as("v"))
    val nShift = shifted.count()
    val r = graft.operators.IvfIndex.refresh(spark, root, shifted)
    assert(r.retrained, s"shifted batch must retrain, ratio=${r.driftRatio}")
    assert(r.driftRatio > graft.operators.IvfIndex.DriftFactor)
    val cells = graft.operators.IvfIndex.cellsDF(spark, root)
    assert(cells.count() == nBase + nShift,
      "retrain must cover the index's own vectors plus the batch")
    // post-retrain the index is queryable and centroids reflect the
    // grown corpus (k is recomputed from the new n)
    val k = graft.operators.IvfIndex.metaDF(spark, root).head.getInt(0)
    assert(k == graft.operators.IvfIndex.kFor(nBase + nShift))
    val q = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    assert(graft.operators.IvfIndex.searchTopK(spark, root, q).count() > 0)
    all.unpersist()
  }
}
