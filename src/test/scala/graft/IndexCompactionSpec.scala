package graft

import graft.operators.{BatchOverlays, IndexGen, IvfIndex, PqIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Overlay folding bounds the small-files growth of the keyed-batch
  * store between (rare, drift-gated) retrains: every keyed refresh adds
  * a `b<id>` dir of shuffle-partition-many files, and nothing else
  * would ever remove them — a year of hourly batches is 10⁴ dirs of
  * slivers. Past the threshold, refresh folds all active dirs into one
  * `merged_<n>` tier at OVERLAY-sized cost (the corpus-sized base is
  * never rewritten), with marker-then-delete ordering so a replay of a
  * folded batch stays a no-op through every crash point.
  */
class IndexCompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vecs: DataFrame =
    Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def freshRoot(name: String): String = {
    val root = java.nio.file.Files.createTempDirectory(name).toString
    new java.io.File(root).delete()
    root
  }

  private def overlayDirs(root: String, name: String): Seq[String] = {
    val fs = IndexGen.fsOf(spark, root)
    val gen = IndexGen.resolveOrFail(fs, root).toString
    BatchOverlays.activeDirs(fs, s"$gen/$name").map(_.getName)
  }

  test("IVF: overlay dir count stays bounded across N keyed refreshes; " +
      "counts reconcile; a folded batch's replay is a no-op; search " +
      "stays correct over merged tiers") {
    val root = freshRoot("ivf_compact")
    val all = vecs.cache()
    val n = all.count()
    IvfIndex.build(spark, root, all.filter(col("vec_id") % 10 < 4))
    val threshold = 2
    (4 to 9).foreach { i =>
      val r = IvfIndex.refresh(spark, root,
        all.filter(col("vec_id") % 10 === i),
        batchId = Some(i.toLong), compactAfter = threshold)
      assert(!r.retrained)
      val dirs = overlayDirs(root, "cells_batches")
      assert(dirs.size <= threshold + 1,
        s"overlay grew unboundedly: $dirs")
    }
    // nothing lost, nothing duplicated through the folds
    val cells = IvfIndex.cellsDF(spark, root).cache()
    assert(cells.count() == n)
    assert(cells.select("vec_id").distinct().count() == n)
    // the folded early batch replays as a no-op (marker-then-delete)
    val replay = IvfIndex.refresh(spark, root,
      all.filter(col("vec_id") % 10 === 4),
      batchId = Some(4L), compactAfter = threshold)
    assert(!replay.retrained && replay.assigned == 0L,
      "replay of a folded keyed batch must be a no-op")
    assert(IvfIndex.cellsDF(spark, root).count() == n)
    assert(IvfIndex.metaDF(spark, root).head.getLong(1) == n)
    // merged tiers keep the physical cell layout: search still prunes
    // and still finds the refreshed vectors
    val q = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    assert(IvfIndex.searchTopK(spark, root, q).count() > 0)
    val merged = overlayDirs(root, "cells_batches")
      .filter(_.startsWith("merged_"))
    assert(merged.nonEmpty, "folding never produced a merged tier")
    cells.unpersist(); all.unpersist()
  }

  test("PQ: overlay folding bounds the codes-batch dirs with the same " +
      "idempotence guarantees") {
    val root = freshRoot("pq_compact")
    val all = vecs.cache()
    val n = all.count()
    val base = all.filter(col("vec_id") % 10 < 4)
    PqIndex.build(spark, root, base)
    val threshold = 2
    (4 to 9).foreach { i =>
      val r = PqIndex.refresh(spark, root,
        all.filter(col("vec_id") % 10 === i), all,
        batchId = Some(i.toLong), compactAfter = threshold)
      assert(!r.retrained)
      assert(overlayDirs(root, "codes_batches").size <= threshold + 1)
    }
    val codes = PqIndex.codesDF(spark, root).cache()
    assert(codes.count() == n)
    assert(codes.select("vec_id").distinct().count() == n)
    val replay = PqIndex.refresh(spark, root,
      all.filter(col("vec_id") % 10 === 5), all,
      batchId = Some(5L), compactAfter = threshold)
    assert(!replay.retrained && replay.assigned == 0L)
    assert(PqIndex.codesDF(spark, root).count() == n)
    val q = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    assert(PqIndex.scoreTopK(spark, root, q).count() > 0)
    codes.unpersist(); all.unpersist()
  }

  test("folding is answer-preserving: search over the folded index " +
      "equals the never-folded twin bit-for-bit") {
    val all = vecs.cache()
    val base = all.filter(col("vec_id") % 10 < 4)
    def grown(threshold: Int, name: String): String = {
      val root = freshRoot(name)
      IvfIndex.build(spark, root, base)
      (4 to 9).foreach { i =>
        IvfIndex.refresh(spark, root, all.filter(col("vec_id") % 10 === i),
          batchId = Some(i.toLong), compactAfter = threshold)
      }
      root
    }
    val folded = grown(2, "ivf_fold_a")     // two fold events
    val unfolded = grown(100, "ivf_fold_b") // never folds
    assert(overlayDirs(folded, "cells_batches")
      .exists(_.startsWith("merged_")), "harness: no fold happened")
    assert(!overlayDirs(unfolded, "cells_batches")
      .exists(_.startsWith("merged_")))
    val q = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    def res(root: String) = IvfIndex.searchTopK(spark, root, q).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(res(folded) == res(unfolded),
      "folding changed an answer — rows or cosines drifted")
    all.unpersist()
  }

  test("a crashed fold's leftover dir (folded-but-present, marker " +
      "missing) is swept by the next compact: marker completed, dir " +
      "deleted") {
    val root = freshRoot("ivf_zombie")
    val all = vecs.cache()
    IvfIndex.build(spark, root, all.filter(col("vec_id") % 10 < 7))
    (7 to 9).foreach { i =>
      IvfIndex.refresh(spark, root, all.filter(col("vec_id") % 10 === i),
        batchId = Some(i.toLong), compactAfter = 1)
    }
    val fs = IndexGen.fsOf(spark, root)
    val gen = IndexGen.resolveOrFail(fs, root).toString
    val folded = BatchOverlays
      .foldedNames(fs, s"$gen/cells_batches").filter(_.startsWith("b"))
    assert(folded.nonEmpty, "harness: no fold happened")
    val victim = folded.head
    // reconstruct the crash window: the folded dir is back on disk and
    // its consumed marker is gone (crash after tier rename, before the
    // marker-then-delete loop)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$gen/consumed_batches/$victim"), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$gen/cells_batches/$victim"))
    IvfIndex.compact(spark, root)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$gen/cells_batches/$victim")), "zombie dir must be swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$gen/consumed_batches/$victim")), "its marker must be completed")
    all.unpersist()
  }

  test("duplicate code rows cannot corrupt ADC ranking: scoring " +
      "collapses them exactly (the sum(part) double-count, closed)") {
    val root = freshRoot("pq_dup")
    val all = vecs.cache()
    PqIndex.build(spark, root, all)
    val q = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val clean = PqIndex.scoreTopK(spark, root, q).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // simulate an unkeyed at-least-once replay: append a duplicate
    // slice of the corpus codes into the base
    val dup = all.filter(col("vec_id") % 7 === 0)
    val r = PqIndex.refresh(spark, root, dup, all)
    assert(!r.retrained)
    val dirty = PqIndex.scoreTopK(spark, root, q).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(dirty.toSeq == clean.toSeq,
      "duplicate code rows changed the ranking — the collapse regressed")
    all.unpersist()
  }
}
