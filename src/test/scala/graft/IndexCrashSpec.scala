package graft

import graft.operators.{IndexGen, IvfIndex, PqIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash consistency of the generation-swap index lifecycle: a retrain
  * stages a complete build and publishes it with ONE atomic rename, so
  * a crash at any point before the rename leaves the old generation
  * serving bit-identically, and after it the new one — never a torn
  * index (the r15 at-least-once window, closed). The spec injects the
  * crash by doing exactly what refresh does up to the publish point
  * ([[IvfIndex.buildInto]] into a staging dir) and stopping.
  */
class IndexCrashSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vecs: DataFrame =
    Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def freshRoot(name: String): String = {
    val root = java.nio.file.Files.createTempDirectory(name).toString
    new java.io.File(root).delete()
    root
  }

  private def top(root: String, q: DataFrame): Seq[(Long, Int, Long)] =
    IvfIndex.searchTopK(spark, root, q).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("IVF: a crash between a staged retrain and its publish leaves " +
      "the OLD generation serving bit-identically; the later publish " +
      "flips to the new one atomically") {
    val root = freshRoot("ivf_crash")
    val all = vecs.cache()
    val base = all.filter(col("vec_id") % 5 =!= 4)
    val nBase = base.count()
    IvfIndex.build(spark, root, all.filter(col("vec_id") % 5 =!= 4))
    val q = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val before = top(root, q)
    // simulated crash: the full retrain ran, the publish rename did not
    val staging = IndexGen.staging(root)
    IvfIndex.buildInto(spark, staging, all)
    assert(top(root, q) == before,
      "a staged-but-unpublished retrain must be invisible to readers")
    assert(IvfIndex.metaDF(spark, root).head.getLong(1) == nBase)
    // the publish: one rename — now (and only now) the new index serves
    IndexGen.commit(IndexGen.fsOf(spark, root), root, staging)
    assert(IvfIndex.metaDF(spark, root).head.getLong(1) == all.count())
    assert(top(root, q).nonEmpty)
    all.unpersist()
  }

  test("a generation directory without meta (torn by hand) is never " +
      "resolved, and the next publish numbers above it") {
    val root = freshRoot("ivf_torn")
    val all = vecs.cache()
    IvfIndex.build(spark, root, all)
    val n = all.count()
    val fs = IndexGen.fsOf(spark, root)
    // a junk gen dir ABOVE the real one, with no meta: must be skipped
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/g99"))
    assert(IvfIndex.metaDF(spark, root).head.getLong(1) == n,
      "resolve must skip a meta-less generation")
    val q = all.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    assert(IvfIndex.searchTopK(spark, root, q).count() > 0)
    // a later rebuild publishes above the junk number — monotone gens
    IvfIndex.build(spark, root, all)
    assert(IndexGen.resolve(fs, root).get.getName == "g100")
    all.unpersist()
  }

  test("IVF: keyed replay AFTER a committed retrain is a no-op — the " +
      "consumed markers rode inside the staged generation") {
    val root = freshRoot("ivf_marker")
    val all = vecs.cache()
    val base = all.filter(col("vec_id") % 5 =!= 4)
    IvfIndex.build(spark, root, base)
    val b1 = all.filter(col("vec_id") % 10 === 4)
    val r1 = IvfIndex.refresh(spark, root, b1, batchId = Some(1L))
    assert(!r1.retrained)
    // a genuinely shifted batch forces the retrain (absorbs b1 too)
    val shifted = all.filter(col("vec_id") % 10 === 9)
      .select(col("vec_id"), transform(col("v"), x => x + lit(10.0)).as("v"))
    val r2 = IvfIndex.refresh(spark, root, shifted, batchId = Some(2L))
    assert(r2.retrained)
    val nAfter = IvfIndex.cellsDF(spark, root).count()
    // the at-least-once replay of the PRE-retrain batch: must be a no-op
    val r3 = IvfIndex.refresh(spark, root, b1, batchId = Some(1L))
    assert(!r3.retrained && r3.assigned == 0L,
      "replay of a batch absorbed by the retrain must not re-append")
    assert(IvfIndex.cellsDF(spark, root).count() == nAfter)
    assert(IvfIndex.cellsDF(spark, root)
      .select("vec_id").distinct().count() == nAfter)
    all.unpersist()
  }

  test("PQ: staged-but-unpublished retrain invisible; publish flips; " +
      "keyed replay after it is a no-op") {
    val root = freshRoot("pq_crash")
    val all = vecs.cache()
    val base = all.filter(col("vec_id") % 5 =!= 4)
    val nBase = base.count()
    PqIndex.build(spark, root, base)
    val b1 = all.filter(col("vec_id") % 10 === 4)
    PqIndex.refresh(spark, root, b1, all, batchId = Some(1L))
    val staging = IndexGen.staging(root)
    PqIndex.buildInto(spark, staging, all)
    assert(PqIndex.metaDF(spark, root).head.getLong(0) == nBase + b1.count(),
      "a staged-but-unpublished PQ retrain must be invisible")
    IndexGen.commit(IndexGen.fsOf(spark, root), root, staging)
    assert(PqIndex.metaDF(spark, root).head.getLong(0) == all.count())
    // markers were not staged by this hand-rolled commit — the real
    // refresh path stages them; pin that path end to end:
    val root2 = freshRoot("pq_crash2")
    PqIndex.build(spark, root2, base)
    PqIndex.refresh(spark, root2, b1, base.unionByName(b1), batchId = Some(1L))
    val shifted = all.filter(col("vec_id") % 10 === 9)
      .select(col("vec_id"), transform(col("v"), x => x + lit(10.0)).as("v"))
    val r = PqIndex.refresh(spark, root2, shifted,
      base.unionByName(b1), batchId = Some(2L))
    assert(r.retrained)
    val nAfter = PqIndex.codesDF(spark, root2).count()
    val replay = PqIndex.refresh(spark, root2, b1,
      base.unionByName(b1), batchId = Some(1L))
    assert(!replay.retrained && replay.assigned == 0L)
    assert(PqIndex.codesDF(spark, root2).count() == nAfter)
    all.unpersist()
  }
}
