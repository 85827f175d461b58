package graft.sources

import graft.txn.{ChangeDataFeed, DeletionVectors, TableWriter}
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Byte-range splitting in the STREAMING sources (the batch scan's
  * `spark.sql.files.maxPartitionBytes` contract applied to CDC/CDF
  * planning): a large data file — a CONVERTed lake's multi-GB backfill,
  * in miniature — must plan as many range partitions, with DV-filtered
  * content, resume offsets, and row positions identical to the unsplit
  * read. Mirrors GraftBatchSpec's split pin (16 KB row groups under a
  * 64 KB budget).
  */
class CdcSplitSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  private val SplitKey = "spark.sql.files.maxPartitionBytes"

  /** One ~50k-row single data file with many 16 KB row groups at v0,
    * then a DV delete at v1 (id % 7 == 0) — so the stream sees a big
    * 'c'-with-live-DV snapshot event AND a 'd' dead-rows event.
    */
  private def buildTable(): String = {
    import spark.implicits._
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val dir = Files.createTempDirectory("cdc_split").toString + "/t"
    try {
      hc.setInt("parquet.block.size", 16 * 1024)
      TableWriter.write(spark,
        (0L until 50000L).map(i => (i, i * 3)).toDF("id", "v").coalesce(1),
        dir, version = 0L, commitTs = 1000L)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
    DeletionVectors.deleteWhere(spark, dir, col("id") % 7 === 0,
      version = 1L, commitTs = 2000L)
    dir
  }

  private def mkStream(table: String, extra: Map[String, String]) =
    new GraftCdcMicroBatchStream(
      GraftCdc.envelopeSchema(
        GraftCdc.declaredSchema(table, spark.sessionState.newHadoopConf())),
      Map("tablePath" -> table, "startingVersion" -> "0",
        "includeHistory" -> "true") ++ extra)

  /** (op, version, id) for every data row of the planned partitions, in
    * partition-then-row order.
    */
  private def rowsOf(stream: GraftCdcMicroBatchStream,
      parts: Array[InputPartition]): Seq[(String, Long, Long)] = {
    val rf = stream.createReaderFactory()
    parts.toSeq.flatMap { p =>
      val r = rf.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      try {
        while (r.next()) {
          val row = r.get()
          if (row.getUTF8String(0).toString != "m")
            buf += ((row.getUTF8String(0).toString, row.getLong(3),
              row.getLong(4)))
        }
      } finally r.close()
      buf.toSeq
    }
  }

  private def withSplitBudget[A](bytes: Long)(body: => A): A = {
    val prev = spark.conf.get(SplitKey)
    spark.conf.set(SplitKey, bytes.toString)
    try body finally spark.conf.set(SplitKey, prev)
  }

  test("a large file plans as many range partitions; DV content, order " +
      "and row positions identical to the unsplit read") {
    val table = buildTable()
    val whole = mkStream(table, Map.empty)
    val wholeParts =
      whole.planInputPartitions(whole.initialOffset(), whole.latestOffset())
    val wholeRows = rowsOf(whole, wholeParts)
    // FULL_COPY snapshot at v0 (before the delete): all 50k rows as 'c';
    // then v1's DV transition streams its dead rows as 'd'
    assert(wholeRows.count(_._1 == "c") == 50000L)
    assert(wholeRows.count(_._1 == "d") == 50000L / 7 + 1)

    withSplitBudget(64 * 1024) {
      val split = mkStream(table, Map.empty)
      val splitParts =
        split.planInputPartitions(split.initialOffset(), split.latestOffset())
      assert(splitParts.length > math.max(wholeParts.length * 4, 8),
        s"expected many range splits, got ${splitParts.length} " +
          s"(whole: ${wholeParts.length})")
      // ranges plan in byte order, rows in row order — the concatenation
      // is EXACTLY the unsplit read, not just the same multiset
      assert(rowsOf(split, splitParts) == wholeRows)
    }

    // dvMode="live" across splits: a snapshot taken AFTER the delete
    // (startingVersion=1) reads the big file with its DV attached — each
    // range must skip exactly its own dead positions (file-absolute)
    val liveWhole = mkStream(table, Map("startingVersion" -> "1"))
    val liveRows = rowsOf(liveWhole, liveWhole.planInputPartitions(
      liveWhole.initialOffset(), liveWhole.latestOffset()))
    assert(liveRows.count(_._1 == "c") == 50000L - (50000L / 7 + 1))
    withSplitBudget(64 * 1024) {
      val s = mkStream(table, Map("startingVersion" -> "1"))
      assert(rowsOf(s, s.planInputPartitions(
        s.initialOffset(), s.latestOffset())) == liveRows)
    }
  }

  test("mid-file resume offsets land identically across split boundaries") {
    val table = buildTable()
    // ground truth: the unsplit, uncapped drain
    val whole = mkStream(table, Map.empty)
    val fullRun = rowsOf(whole,
      whole.planInputPartitions(whole.initialOffset(), whole.latestOffset()))

    withSplitBudget(64 * 1024) {
      // capped drain with a restart (fresh stream) per batch: offsets are
      // raw file-absolute row positions, so each resume lands mid-file,
      // inside some byte range
      var off = mkStream(table, Map.empty).initialOffset()
        .asInstanceOf[WrappedOffset]
      var out = Vector.empty[(String, Long, Long)]
      var batches = 0
      var done = false
      while (!done && batches < 40) {
        val resumed = mkStream(table, Map("maxRowsPerTrigger" -> "7000"))
        val end = resumed.latestOffset(
          resumed.deserializeOffset(off.json()),
          resumed.getDefaultReadLimit).asInstanceOf[WrappedOffset]
        if (end.o == off.o) done = true
        else {
          out ++= rowsOf(resumed, resumed.planInputPartitions(off, end))
          off = end
          batches += 1
        }
      }
      assert(done, "capped stream failed to drain")
      assert(batches >= 8, s"expected row-capped batches, got $batches")
      assert(out == fullRun)
    }
  }

  test("streaming CDF splits inferred-insert adds and change sidecars") {
    import graft.txn.ChangeDataFeed._
    val table = buildTable() // v0 big append (inferred inserts), v1 has DV
    // enable CDF then a row-level update so a sidecar exists too
    TableWriter.setTableProperties(spark, table,
      Map(ChangeDataFeed.Prop -> "true"), version = 2L, commitTs = 3000L)
    TableWriter.updateWhere(spark, table, col("id") === 12L,
      Map("v" -> lit(999L)), version = 3L, commitTs = 4000L)

    def drain(): Seq[(Long, Long, String, Long)] = {
      val schema = GraftCdf.cdfSchema(
        GraftCdc.declaredSchema(table, spark.sessionState.newHadoopConf()))
      val s = new GraftCdfMicroBatchStream(schema,
        Map("tablePath" -> table, "startingVersion" -> "0"))
      val parts = s.planInputPartitions(CdfOffset(-1L), CdfOffset(0L)) ++
        s.planInputPartitions(CdfOffset(2L), CdfOffset(3L))
      val rf = s.createReaderFactory()
      parts.toSeq.flatMap { p =>
        val r = rf.createReader(p)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, String, Long)]
        try {
          while (r.next()) {
            val row = r.get()
            buf += ((row.getLong(0), row.getLong(1),
              row.getUTF8String(2).toString, row.getLong(3)))
          }
        } finally r.close()
        buf.toSeq
      }
    }

    val whole = drain()
    assert(whole.count(_._3 == Insert) == 50000)
    assert(whole.count(_._3 == UpdatePost) == 1)
    val got = withSplitBudget(64 * 1024)(drain())
    assert(got == whole)
  }
}
