package graft

import graft.txn.TableWriter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming PQ-index maintenance — StreamingIvfSpec's contract on the
  * compressed family: the CDC tail of a growing embeddings table drives
  * `PqIndex.refresh` per micro-batch (foreachBatch, keyed by the
  * micro-batch id for at-least-once replay idempotence), so the packed
  * code table tracks the table with batch-sized encode work and no
  * per-batch rebuild. q380/q391 gate the same path's recall through the
  * DuckDB oracle.
  */
class StreamingPqSpec extends AnyFunSuite {
  import SparkTestSession._

  test("CDC tail drives PqIndex.refresh per micro-batch; the packed " +
      "code table tracks the table exactly") {
    import spark.implicits._
    val table = Files.createTempDirectory("pq_stream_tbl").toString
    val root = {
      val r = Files.createTempDirectory("pq_stream_idx").toString
      new java.io.File(r).delete(); r
    }
    val all = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    val n = all.count()
    val base = all.filter(col("vec_id") % 5 =!= 4)

    TableWriter.write(spark, base, table, version = 0L, commitTs = 1000L)
    graft.operators.PqIndex.build(spark, root, base)

    TableWriter.write(spark, all.filter(col("vec_id") % 10 === 4),
      table, version = 1L, commitTs = 2000L)
    TableWriter.write(spark, all.filter(col("vec_id") % 10 === 9),
      table, version = 2L, commitTs = 3000L)

    var batches = 0
    var retrains = 0
    val q = spark.readStream.format("graft.sources.GraftCdc")
      .option("tablePath", table)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val batch = df.filter(col("op") === "c")
          .select(col("vec_id"), col("v"))
        if (!batch.isEmpty) {
          // the retrain corpus (evaluated only on drift) is the indexed
          // base plus this batch; same-distribution ingest must never
          // need it
          val r = graft.operators.PqIndex.refresh(spark, root, batch,
            base.unionByName(batch), batchId = Some(id))
          batches += 1
          if (r.retrained) retrains += 1
        }
      }
      .option("checkpointLocation",
        Files.createTempDirectory("pq_stream_ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()

    assert(batches == 2, s"expected one refresh per ingest commit, got $batches")
    assert(retrains == 0,
      "same-distribution ingest must never trip the drift retrain")
    val codes = graft.operators.PqIndex.codesDF(spark, root).cache()
    assert(codes.count() == n, "code table must track the table exactly")
    assert(codes.select("vec_id").distinct().count() == n,
      "a streamed vector was encoded twice")
    assert(graft.operators.PqIndex.metaDF(spark, root).head.getLong(0) == n)
    // a streamed vector is reachable through ADC scoring: its own
    // embedding under a fresh query id must return it as the top hit
    // (ADC cos of a vector with itself is its quantized self-similarity
    // — the maximum over the corpus for these synthetic embeddings)
    val fr = all.filter(col("vec_id") % 10 === 9)
      .orderBy(col("vec_id")).head
    val probe = Seq((-1L, fr.getSeq[Double](1))).toDF("query_id", "qv")
    val top = graft.operators.PqIndex.scoreTopK(spark, root, probe)
      .orderBy(col("rnk")).limit(5).collect().map(_.getLong(2)).toSet
    assert(top.contains(fr.getLong(0)),
      "a refreshed vector must surface in its own ADC top-5")
    codes.unpersist(); all.unpersist()
  }
}
