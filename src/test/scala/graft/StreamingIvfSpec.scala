package graft

import graft.txn.TableWriter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming ANN-index maintenance: the CDC tail of a growing embeddings
  * table drives `IvfIndex.refresh` per micro-batch (foreachBatch), so
  * the persisted index tracks the table WITHOUT per-batch rebuilds —
  * the 100 TB operating mode: ingest commits land on the table, the
  * maintenance stream assigns just the new vectors to the existing
  * centroids and appends to the cell table. Cross-batch accumulation,
  * no-dup/no-loss, and post-stream searchability are pinned here; q376
  * gates the recall of the same refresh path through the DuckDB oracle.
  */
class StreamingIvfSpec extends AnyFunSuite {
  import SparkTestSession._

  test("CDC tail drives IvfIndex.refresh per micro-batch; the index " +
      "tracks the table exactly") {
    import spark.implicits._
    val table = Files.createTempDirectory("ivf_stream_tbl").toString
    val root = {
      val r = Files.createTempDirectory("ivf_stream_idx").toString
      new java.io.File(r).delete(); r
    }
    val all = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    val n = all.count()

    // v0: 80% of the corpus lands on the table; the index builds from it
    TableWriter.write(spark, all.filter(col("vec_id") % 5 =!= 4),
      table, version = 0L, commitTs = 1000L)
    graft.operators.IvfIndex.build(spark, root,
      all.filter(col("vec_id") % 5 =!= 4))

    // v1, v2: ingest commits append the remaining 20% in two batches
    TableWriter.write(spark, all.filter(col("vec_id") % 10 === 4),
      table, version = 1L, commitTs = 2000L)
    TableWriter.write(spark, all.filter(col("vec_id") % 10 === 9),
      table, version = 2L, commitTs = 3000L)

    // maintenance stream: the incremental tail (no history — the build
    // already covers v0; startingVersion marks the CONSUMED version, so
    // 0 streams exactly v1..) refreshes the index per micro-batch
    var batches = 0
    var retrains = 0
    val q = spark.readStream.format("graft.sources.GraftCdc")
      .option("tablePath", table)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1") // one commit per batch
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val batch = df.filter(col("op") === "c")
          .select(col("vec_id"), col("v"))
        if (!batch.isEmpty) {
          // keyed by the micro-batch id: Spark's foreachBatch is
          // at-least-once, and the key makes a replayed batch rewrite
          // its own rows instead of appending duplicates
          val r = graft.operators.IvfIndex.refresh(spark, root, batch,
            batchId = Some(id))
          batches += 1
          if (r.retrained) retrains += 1
        }
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ivf_stream_ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()

    assert(batches == 2, s"expected one refresh per ingest commit, got $batches")
    assert(retrains == 0,
      "same-distribution ingest must never trip the drift retrain")
    val cells = graft.operators.IvfIndex.cellsDF(spark, root).cache()
    assert(cells.count() == n, "index must track the table exactly")
    assert(cells.select("vec_id").distinct().count() == n,
      "a streamed vector was indexed twice")
    // the grown index is queryable
    val hits = graft.operators.IvfIndex.searchTopK(spark, root,
      all.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv")))
    assert(hits.count() > 0)
    // a STREAMED vector is reachable: querying with its own embedding
    // under a fresh query id (so self-exclusion doesn't apply) must
    // return it as the top hit — cosine 1 with itself, and its cell is
    // by construction the query's rank-1 probe
    val fr = all.filter(col("vec_id") % 10 === 9)
      .orderBy(col("vec_id")).head
    val probe = Seq((-1L, fr.getSeq[Double](1))).toDF("query_id", "qv")
    val top1 = graft.operators.IvfIndex.searchTopK(spark, root, probe)
      .orderBy(col("rnk")).head
    assert(top1.getLong(2) == fr.getLong(0),
      "a refreshed vector must surface as its own nearest neighbor")
    cells.unpersist(); all.unpersist()
  }
}
