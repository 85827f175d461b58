package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{SnapshotReader, TableWriter}

/** End-to-end incremental corpus ingestion: a raw landing table is tailed
  * by the CDC stream, each micro-batch fingerprints its documents, drops
  * in-batch and against-corpus duplicates, and appends the survivors to a
  * versioned corpus table. The 100 TB shape every training-data pipeline
  * runs continuously — built entirely from this engine's own primitives
  * (GraftCdc tail → md5 fingerprint → anti-join → TableWriter.append).
  */
class IngestDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  test("incremental ingestion dedups arrivals against the corpus table") {
    import spark.implicits._
    val base = s"target/fixtures/ingest_${System.nanoTime()}"
    val raw = s"$base/raw"
    val corpus = s"$base/corpus"

    def fingerprinted(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("fp", md5(col("text").cast("binary")))
        .select(col("doc_id"), col("text"), col("fp"))

    // batch A seeds both tables (already deduplicated)
    val a = (0L until 10L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    TableWriter.write(spark, a, raw, version = 0L, commitTs = 1000L)
    TableWriter.write(spark, fingerprinted(a), corpus,
      version = 0L, commitTs = 1000L)

    // batch B: even ids repeat A's texts; 15 also duplicates 17 IN-batch
    val b = (10L until 20L).map { i =>
      val text = if (i % 2 == 0) s"text ${i - 10}"
      else if (i == 17L) "text fresh-15" else s"text fresh-$i"
      (i, text)
    }.toDF("doc_id", "text")
    TableWriter.append(spark, b, raw, commitTs = 2000L)

    val q = spark.readStream.format("graft.sources.GraftCdc")
      .option("tablePath", raw)
      .option("startingVersion", "0") // corpus already holds v0 = batch A
      .load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val docs = fingerprinted(
          batch.filter(col("op") === "c").select(col("doc_id"), col("text")))
        // in-batch keep-first, then anti-join the corpus's fingerprints
        val survivors = docs
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
          .filter(col("rn") === 1).drop("rn")
          .join(SnapshotReader.read(spark, corpus).select(col("fp")),
            Seq("fp"), "left_anti")
          .select(col("doc_id"), col("text"), col("fp"))
        if (!survivors.isEmpty)
          TableWriter.append(spark, survivors, corpus, commitTs = 3000L)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = SnapshotReader.read(spark, corpus)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    val expected =
      (0L until 10L).map(i => (i, s"text $i")).toSet ++ // batch A survives
        Set((11L, "text fresh-11"), (13L, "text fresh-13"),
          (15L, "text fresh-15"), (19L, "text fresh-19"))
    // even-id copies of A and the in-batch duplicate (17) are dropped;
    // the corpus stays exactly the distinct-text set with first-seen ids
    assert(got == expected, s"got $got")
  }

  test("incremental NEAR-dup ingestion: LSH index state carries across batches") {
    import spark.implicits._
    import graft.operators.IncrementalNearDup
    val base = s"target/fixtures/ingest_nd_${System.nanoTime()}"
    val raw = s"$base/raw"
    val corpus = s"$base/corpus"
    val index = s"$base/index"

    // ~20-token texts so 3-shingle sets are stable; nearCopy perturbs one
    // trailing token (high Jaccard), fresh texts share nothing
    def text(seed: Int): String =
      (0 until 20).map(i => s"w${seed}_$i").mkString(" ")
    def nearCopy(seed: Int): String =
      (0 until 19).map(i => s"w${seed}_$i").mkString(" ") + " changed_tail"

    // batch A seeds raw + corpus + index (docs 0..4, all distinct)
    val a = (0L until 5L).map(i => (i, text(i.toInt))).toDF("doc_id", "text")
    TableWriter.write(spark, a, raw, version = 0L, commitTs = 1000L)
    TableWriter.write(spark, a, corpus, version = 0L, commitTs = 1000L)
    IncrementalNearDup.seed(spark, a, index, commitTs = 1000L)
    assert(IncrementalNearDup.indexedCount(spark, index) == 5)

    // batch B: 10 near-copies corpus doc 2; 11 fresh; 12 near-copies 11
    // IN-batch (keep-first drops 12)
    val b = Seq((10L, nearCopy(2)), (11L, text(11)), (12L, nearCopy(11)))
      .toDF("doc_id", "text")
    TableWriter.append(spark, b, raw, commitTs = 2000L)
    // batch C arrives later: 20 near-copies the BATCH-B survivor 11 —
    // only droppable if the index state carried; 21 is fresh
    val c = Seq((20L, nearCopy(11)), (21L, text(21))).toDF("doc_id", "text")

    val q = spark.readStream.format("graft.sources.GraftCdc")
      .option("tablePath", raw)
      .option("startingVersion", "0") // corpus/index already hold batch A
      .load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val arrivals = batch.filter(col("op") === "c")
          .select(col("doc_id"), col("text"))
        if (!arrivals.isEmpty) {
          val survivors = IncrementalNearDup.processBatch(spark, arrivals,
            index, commitTs = 5000L)
          if (!survivors.isEmpty)
            TableWriter.append(spark, survivors, corpus, commitTs = 5000L)
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      TableWriter.append(spark, c, raw, commitTs = 3000L)
      q.processAllAvailable()
    } finally q.stop()

    val got = SnapshotReader.read(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    // near-copies 10 (vs corpus), 12 (in-batch), 20 (vs a batch-B
    // survivor) all dropped; 11 and 21 accepted
    assert(got == Set(0L, 1L, 2L, 3L, 4L, 11L, 21L), s"got $got")
    assert(IncrementalNearDup.indexedCount(spark, index) == 7)
  }

  test("boilerplate floods stay correct through the hot-bucket guard") {
    import spark.implicits._
    import graft.operators.{IncrementalNearDup, SkewGuard}
    def text(seed: Int): String =
      (0 until 20).map(i => s"w${seed}_$i").mkString(" ")
    def nearCopy(seed: Int): String =
      (0 until 19).map(i => s"w${seed}_$i").mkString(" ") + " changed_tail"
    val floodSize = SkewGuard.DefaultCap * 2 // every band bucket past cap

    // in-batch flood: identical docs collide in EVERY band bucket; star
    // routing must still collapse them to keep-first and accept the one
    // fresh doc — with a linear, not quadratic, candidate count
    val idx1 = s"target/fixtures/flood_in_${System.nanoTime()}"
    IncrementalNearDup.seed(spark,
      Seq((0L, text(99))).toDF("doc_id", "text"), idx1, commitTs = 1000L)
    val floodBatch = ((10L until 10L + floodSize).map((_, text(7))) :+
      (9000L, text(8))).toDF("doc_id", "text")
    val kept1 = IncrementalNearDup
      .processBatch(spark, floodBatch, idx1, commitTs = 2000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(10L, 9000L), s"got $kept1")

    // corpus-side flood: the INDEX holds an over-cap identical bucket; a
    // new near-copy must still drop, verified against the bucket's capped
    // representative
    val idx2 = s"target/fixtures/flood_corpus_${System.nanoTime()}"
    IncrementalNearDup.seed(spark,
      (0L until floodSize).map((_, text(5))).toDF("doc_id", "text"),
      idx2, commitTs = 1000L)
    val kept2 = IncrementalNearDup.processBatch(spark,
        Seq((5000L, nearCopy(5)), (5001L, text(9))).toDF("doc_id", "text"),
        idx2, commitTs = 2000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(5001L), s"got $kept2")
  }
}
