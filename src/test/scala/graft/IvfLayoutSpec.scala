package graft

import graft.sources.CountingMockFs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF layout must be PHYSICAL, not just a column: at 100 TB the
  * whole point of the index is that a probes=p search reads only the
  * probed cells' bytes. The cell table is hive-partitioned by `cell`
  * and searchTopK pushes the probed-cell IN-list as a partition filter;
  * this spec pins the resulting IO economics with the counting
  * `mockfs://` filesystem — the opened-file set during a search must be
  * a subset of the probed cells' partitions, red-on-regression if the
  * layout or the pushdown ever degrades to a full-corpus scan behind a
  * logically-correct join.
  */
class IvfLayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vecs: DataFrame =
    Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def mockRoot(name: String): String = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mockfs.impl", classOf[CountingMockFs].getName)
    val local = java.nio.file.Files.createTempDirectory(name)
    java.nio.file.Files.delete(local)
    s"mockfs://$local"
  }

  test("searchTopK opens ONLY the probed cells' files — base and " +
      "keyed-overlay parts both prune at the partition level") {
    val root = mockRoot("ivf_layout")
    val all = vecs.cache()
    // base on 80%, one keyed refresh for the remaining 20%: the pin
    // must hold across BOTH the build-time base and the overlay dirs
    graft.operators.IvfIndex.build(spark, root,
      all.filter(col("vec_id") % 5 =!= 4))
    val r = graft.operators.IvfIndex.refresh(spark, root,
      all.filter(col("vec_id") % 5 === 4), batchId = Some(1L))
    assert(!r.retrained)
    val q = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = 2
    val expected = graft.operators.IvfIndex
      .probedCells(spark, root, q, probes).toSet
    val k = graft.operators.IvfIndex.metaDF(spark, root).head.getInt(0)
    // the pin is meaningful only if pruning is real: probing must
    // select a strict minority of cells
    assert(expected.nonEmpty && expected.size < k,
      s"probe set ${expected.size} of $k cells — nothing to prune")
    CountingMockFs.recordedOpens.clear()
    CountingMockFs.recordPaths = true
    val res =
      try graft.operators.IvfIndex
        .searchTopK(spark, root, q, probesOverride = Some(probes))
        .collect()
      finally CountingMockFs.recordPaths = false
    assert(res.nonEmpty)
    import scala.jdk.CollectionConverters._
    val opened = CountingMockFs.recordedOpens.asScala.toSet
      .filter(p => p.contains("/cells") && p.endsWith(".parquet"))
    val openedCells = opened.flatMap(p =>
      "cell=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toInt))
    assert(openedCells.nonEmpty, "no cell data files recorded — harness broken")
    assert(openedCells.subsetOf(expected),
      s"search read NON-probed cells ${openedCells -- expected} — the " +
        "partition filter is not pruning")
    // every opened cell-table file must live under a cell= partition
    // dir: an unpartitioned stray file would dodge pruning silently
    val unpartitioned = opened.filterNot(_.contains("cell="))
    assert(unpartitioned.isEmpty,
      s"cell-table files outside the physical layout: $unpartitioned")
    // schema comes from the static StructType, never an inference
    // footer read: with inference, Spark would open a data file of an
    // arbitrary (possibly non-probed) cell before planning

    // ... and the pin must survive FOLDING: force the overlay into a
    // merged tier and re-assert — a tier written without the cell
    // layout would silently un-prune the refreshed slice of the corpus
    graft.operators.IvfIndex.refresh(spark, root,
      all.filter(col("vec_id") % 10 === 3), batchId = Some(2L),
      compactAfter = 1)
    CountingMockFs.recordedOpens.clear()
    CountingMockFs.recordPaths = true
    val res2 =
      try graft.operators.IvfIndex
        .searchTopK(spark, root, q, probesOverride = Some(probes))
        .collect()
      finally CountingMockFs.recordPaths = false
    assert(res2.nonEmpty)
    val expected2 = graft.operators.IvfIndex
      .probedCells(spark, root, q, probes).toSet
    val opened2 = CountingMockFs.recordedOpens.asScala.toSet
      .filter(p => p.contains("/cells") && p.endsWith(".parquet"))
    assert(opened2.exists(_.contains("merged_")),
      "harness: the fold did not produce a probed merged tier")
    val openedCells2 = opened2.flatMap(p =>
      "cell=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toInt))
    assert(openedCells2.subsetOf(expected2),
      s"post-fold search read NON-probed cells ${openedCells2 -- expected2}")
    all.unpersist()
  }

  test("PQ encode plan is map-only: no Window argmin, no Exchange") {
    val n = Tables.load(spark, sf, "embeddings").count()
    val plan = graft.operators.PqIndex.encode(spark, sf, n)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "encode reintroduced the row_number argmin (corpus x M x K shuffle)")
    assert(!plan.contains("Exchange"),
      "encode must not shuffle — broadcast codebooks + per-row loop only")
  }
}
