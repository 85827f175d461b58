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

  // Offsets are monotonically-named files (offset-<n>.json); the current
  // offset is the max n. A crash can therefore never observe a "no offset"
  // state mid-commit — the previous file is untouched until the new one is
  // fully renamed into place (rename-to-fresh-name, never delete-then-rename).
  private val OffsetRe = """offset-(\d+)\.json""".r

  private def listOffsets(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[(Long, Path)] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case OffsetRe(n) => Some((n.toLong, st.getPath))
        case _           => None
      }
    }.sortBy(_._1)

  def readOffset(spark: SparkSession, checkpointDir: String): Option[CdcOffset] = {
    val dir = new Path(checkpointDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    listOffsets(fs, dir).lastOption.map { case (_, p) =>
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        CdcOffset.fromJson(bytes.toString("UTF-8"))
      } finally in.close()
    }
  }

  private def writeOffset(spark: SparkSession, checkpointDir: String, o: CdcOffset): Unit = {
    val dir = new Path(checkpointDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val existing = listOffsets(fs, dir)
    val next = existing.lastOption.map(_._1 + 1).getOrElse(0L)
    val tmp = new Path(checkpointDir, s".offset-$next.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(o.json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!fs.rename(tmp, new Path(checkpointDir, s"offset-$next.json")))
      throw new IllegalStateException(s"offset commit failed at $checkpointDir")
    // retain the latest two; older ones are garbage
    existing.dropRight(1).foreach { case (_, p) => fs.delete(p, false) }
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
