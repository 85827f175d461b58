package graft.sources

import graft.Tables
import graft.txn.{CdcOffset, TableWriter}
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Row-granular mid-file resume (SURVEY §2.2 P3, reference
  * DeltaReader.java:263–282 / DeltaCheckpoint.java:56–64): with
  * maxRowsPerTrigger, offsets land inside files, and a restart from any
  * such offset reproduces exactly the remaining rows.
  */
class RowResumeSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  private def buildTable(): String = {
    val table = Files.createTempDirectory("row_resume").toString + "/t"
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    TableWriter.write(spark, li.limit(95).coalesce(1), table,
      version = 0L, commitTs = 1000L)
    TableWriter.write(spark, li.limit(155).except(li.limit(95)).coalesce(2),
      table, version = 1L, commitTs = 2000L)
    table
  }

  private def mkStream(table: String, extra: Map[String, String]) = {
    val schema = GraftCdc.envelopeSchema(
      GraftCdc.declaredSchema(table, spark.sessionState.newHadoopConf()))
    (schema, new GraftCdcMicroBatchStream(schema,
      Map("tablePath" -> table, "startingVersion" -> "0",
        "includeHistory" -> "true") ++ extra))
  }

  /** (op, version, orderkey, linenumber) for every data row of a batch. */
  private def rowsOf(stream: GraftCdcMicroBatchStream,
      parts: Array[InputPartition]): Seq[(String, Long, Long, Int)] = {
    val rf = stream.createReaderFactory()
    parts.toSeq.flatMap { p =>
      val r = rf.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Int)]
      try {
        while (r.next()) {
          val row = r.get()
          if (row.getUTF8String(0).toString != "m")
            buf += ((row.getUTF8String(0).toString, row.getLong(3),
              row.getLong(4), row.getInt(5)))
        }
      } finally r.close()
      buf.toSeq
    }
  }

  test("row-capped batches split mid-file and reproduce the full read exactly") {
    val table = buildTable()
    val (_, capped) = mkStream(table, Map("maxRowsPerTrigger" -> "40"))
    val (_, unlimited) = mkStream(table, Map.empty)

    // the uninterrupted run: one batch covering everything
    val off0 = unlimited.initialOffset()
    val endAll = unlimited.latestOffset()
    val fullRun = rowsOf(unlimited, unlimited.planInputPartitions(off0, endAll))
    assert(fullRun.size == 155)

    // the capped run: drain batch by batch, restarting the stream from the
    // serialized offset each time (every iteration is a "kill + resume")
    var off = capped.initialOffset().asInstanceOf[WrappedOffset]
    var batches = Vector.empty[Seq[(String, Long, Long, Int)]]
    var midFileOffsets = 0
    var safety = 0
    var done = false
    while (!done && safety < 50) {
      safety += 1
      // fresh stream instance = restart from checkpointed offset JSON
      val (_, resumed) = mkStream(table, Map("maxRowsPerTrigger" -> "40"))
      val end = resumed.latestOffset(
        resumed.deserializeOffset(off.json()),
        resumed.getDefaultReadLimit).asInstanceOf[WrappedOffset]
      if (end.o == off.o) done = true
      else {
        if (end.o.fileIndex >= 0) midFileOffsets += 1
        batches :+= rowsOf(resumed,
          resumed.planInputPartitions(off, end))
        off = end
      }
    }
    assert(done, "capped stream failed to drain")
    assert(batches.forall(_.size <= 40), batches.map(_.size).mkString(","))
    assert(batches.count(_.nonEmpty) >= 4, s"expected row-split batches, got ${batches.map(_.size)}")
    assert(midFileOffsets > 0, "no mid-file offset was ever produced")
    // byte-identical: same rows, same per-batch-concatenation order
    assert(batches.flatten == fullRun)
  }

  test("maxRowsPerTrigger bounds micro-batch sizes end-to-end") {
    val table = buildTable()
    val q = spark.readStream.format("graft.sources.GraftCdc")
      .option("tablePath", table)
      .option("startingVersion", "0")
      .option("includeHistory", "true")
      .option("maxRowsPerTrigger", "60")
      .load()
      .writeStream.outputMode("append")
      .format("memory").queryName("row_capped_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
      assert(sizes.forall(_ <= 60), sizes.mkString(","))
      assert(sizes.length >= 3)
      assert(spark.table("row_capped_out").count() == 155)
      // content identical to the batch CDC read
      val got = spark.table("row_capped_out")
        .groupBy("op").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      val want = graft.txn.CdcReader.cdc(spark, table)
        .groupBy("op").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got == want)
    } finally q.stop()
  }
}
