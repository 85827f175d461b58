package graft.streaming

import graft.txn.{CdcOffset, CdcReader}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Driver-side micro-batch loop over the CDC log — the v1 streaming
  * surface of SURVEY.md §7.3 ("driver-side foreachBatch loop"): each
  * batch is one atomic offset advance, with the offset persisted to the
  * checkpoint dir via write-temp + rename *after* the batch function
  * succeeds. A crash between process() and the offset commit replays the
  * batch — exactly-once end-to-end when the sink is idempotent or
  * transactional, which is Structured Streaming's own contract
  * (SURVEY.md §2.8 T6).
  *
  * The restore-min-checkpoint semantics of the reference
  * (DeltaLakeConnectorSource.java:119–187) collapse to a single offset
  * file here because Spark owns partition assignment.
  */
object CdcStreamRunner {

  private def offsetPath(checkpointDir: String) = new Path(checkpointDir, "offset.json")

  def readOffset(spark: SparkSession, checkpointDir: String): Option[CdcOffset] = {
    val p = offsetPath(checkpointDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        Some(CdcOffset.fromJson(bytes.toString("UTF-8")))
      } finally in.close()
    }
  }

  private def writeOffset(spark: SparkSession, checkpointDir: String, o: CdcOffset): Unit = {
    val p = offsetPath(checkpointDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val tmp = new Path(checkpointDir, ".offset.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(o.json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"offset commit failed at $checkpointDir")
  }

  /** Drain available commits, at most `maxBatches` micro-batches. Returns
    * the offset after the last processed batch.
    */
  def run(
      spark: SparkSession,
      tablePath: String,
      checkpointDir: String,
      startingVersion: Long = 0L,
      includeHistory: Boolean = true,
      maxBatches: Int = Int.MaxValue)(process: DataFrame => Unit): CdcOffset = {
    var off = readOffset(spark, checkpointDir).getOrElse {
      if (includeHistory) CdcOffset(CdcOffset.FullCopy, startingVersion, -1, -1)
      else CdcOffset(CdcOffset.Incremental, startingVersion, -1, -1)
    }
    var batches = 0
    var continue = true
    while (continue && batches < maxBatches) {
      CdcReader.pollIncremental(spark, tablePath, off) match {
        case (Some(df), next) =>
          process(df)
          writeOffset(spark, checkpointDir, next)
          off = next
          batches += 1
        case (None, _) => continue = false
      }
    }
    off
  }
}
