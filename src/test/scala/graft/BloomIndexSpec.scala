package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{BloomIndex, DataSkipping, TableWriter, TxnLog}

/** Per-file bloom index: point lookups prune to the files that may hold
  * the key, results stay exact, un-indexed files/columns are always
  * kept, and vacuum protects the latest build while reclaiming
  * superseded ones.
  */
class BloomIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  /** orders spread over 8 files by a write-side repartition on the key,
    * so each o_orderkey lives in exactly one file.
    */
  private def fixture(tag: String): String = {
    val dir = freshDir(tag)
    TableWriter.write(spark,
      Tables.load(spark, sf, "orders").repartition(8, col("o_orderkey")),
      dir, version = 0L, commitTs = 1000L)
    BloomIndex.build(spark, dir, Seq("o_orderkey"), version = 0L)
    dir
  }

  test("point lookup prunes to ~1 of 8 files and stays exact") {
    val dir = fixture("bi1")
    val key = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey")).head().getLong(0)
    val (kept, _, _) =
      DataSkipping.filesFor(spark, dir, col("o_orderkey") === key)
    val total = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.size
    assert(total == 8, s"fixture wrote $total files")
    assert(kept.size < total, "bloom index pruned nothing")
    val got = DataSkipping.readWhere(spark, dir, col("o_orderkey") === key)
      .count()
    val want = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") === key).count()
    assert(got == want && want > 0)
  }

  test("an absent key prunes every file") {
    val dir = fixture("bi2")
    val (kept, _, _) =
      DataSkipping.filesFor(spark, dir, col("o_orderkey") === 999999999L)
    // 8 independent ~0.8% FPP probes: all-file survival is astronomically
    // unlikely; allow at most one false positive
    assert(kept.size <= 1, s"${kept.size} files kept for an absent key")
    assert(DataSkipping.readWhere(spark, dir,
      col("o_orderkey") === 999999999L).count() == 0)
  }

  test("files appended after the build are always kept") {
    val dir = fixture("bi3")
    TableWriter.append(spark,
      Tables.load(spark, sf, "orders")
        .filter(col("o_orderkey") === 7L)
        .withColumn("o_orderkey", lit(424242L)),
      dir, commitTs = 2000L)
    val (kept, _, _) =
      DataSkipping.filesFor(spark, dir, col("o_orderkey") === 424242L)
    assert(kept.nonEmpty, "post-build file wrongly pruned")
    assert(DataSkipping.readWhere(spark, dir,
      col("o_orderkey") === 424242L).count() > 0)
  }

  test("string columns index and probe") {
    val dir = freshDir("bi4")
    TableWriter.write(spark,
      Tables.load(spark, sf, "customer").repartition(6, col("c_name")),
      dir, version = 0L, commitTs = 1000L)
    BloomIndex.build(spark, dir, Seq("c_name"), version = 0L)
    val name = Tables.load(spark, sf, "customer")
      .select(col("c_name")).head().getString(0)
    val (kept, _, _) =
      DataSkipping.filesFor(spark, dir, col("c_name") === name)
    assert(kept.size < 6)
    assert(DataSkipping.readWhere(spark, dir, col("c_name") === name)
      .count() == 1)
  }

  test("blooms are sized per FILE (own row count), never by the largest " +
      "file, and the prune path moves only names to the driver") {
    val dir = freshDir("bi6")
    // one 4-row file and one ~1500-row file in a single table
    val small = Tables.load(spark, sf, "orders").limit(4).coalesce(1)
    val big = Tables.load(spark, sf, "orders").coalesce(1)
    TableWriter.write(spark, small, dir, version = 0L, commitTs = 1000L)
    TableWriter.append(spark, big, dir, commitTs = 2000L)
    BloomIndex.build(spark, dir, Seq("o_orderkey"), version = 1L)
    val d = BloomIndex.latestBuild(spark, dir).get
    val rows = spark.read.parquet(s"$dir/$d")
      .select(col("file_name"), org.apache.spark.sql.functions
        .length(col("bits")).as("len"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows.size == 2)
    val lens = rows.values.toSeq.sorted
    assert(lens.head < lens.last,
      s"per-file sizing must differ for 4 vs ~1500 rows, got $rows")
    // prunedFiles drops the file that can't hold the key (names only)
    val key = big.select(col("o_orderkey"))
      .orderBy(col("o_orderkey").desc).head().getLong(0)
    val dropped = BloomIndex.prunedFiles(spark, dir,
      Seq(("o_orderkey", Seq(key))))
    assert(dropped.size == 1, s"expected the small file dropped: $dropped")
    // exactness end to end
    assert(DataSkipping.readWhere(spark, dir,
      col("o_orderkey") === key).count() ==
      Tables.load(spark, sf, "orders")
        .filter(col("o_orderkey") === key).count())
  }

  test("vacuum keeps the latest build, reclaims superseded ones") {
    val dir = fixture("bi5")
    TableWriter.append(spark, Tables.load(spark, sf, "orders").limit(10),
      dir, commitTs = 2000L)
    BloomIndex.build(spark, dir, Seq("o_orderkey"), version = 1L)
    assert(BloomIndex.supersededBuilds(spark, dir).size == 1)
    TableWriter.vacuum(spark, dir, retainMillis = 0L,
      nowMillis = System.currentTimeMillis() + 10000L)
    assert(BloomIndex.supersededBuilds(spark, dir).isEmpty)
    assert(BloomIndex.latestBuild(spark, dir).isDefined)
    assert(BloomIndex.load(spark, dir).nonEmpty)
    // pruning still works after vacuum
    val key = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey")).head().getLong(0)
    assert(DataSkipping.readWhere(spark, dir,
      col("o_orderkey") === key).count() > 0)
  }
}
