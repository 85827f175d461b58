package graft.sources

import graft.txn._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** Group-based (copy-on-write) row-level operations — the DSv2 surface
  * behind SQL `MERGE INTO`, `UPDATE`, and predicate-shaped `DELETE`
  * that `SupportsDelete` refuses.
  *
  * The contract Spark's rewrite plans rely on: the operation's SCAN
  * reads the candidate file groups (file pruning + the runtime
  * `_graft_file` group filter narrow it to files that actually contain
  * matches), the WRITE receives the complete replacement content of
  * those groups, and commit() lands removes(scanned files) + adds(new
  * files) in ONE log version. Untouched files are never rewritten; a
  * concurrent writer that removed a scanned file fails the operation
  * loudly instead of resurrecting or double-counting rows.
  */
private[sources] class GraftRowLevelOperation(
    cmd: RowLevelOperation.Command,
    properties: Map[String, String],
    partitionColumns: Seq[String]) extends RowLevelOperation {

  private val tablePath = properties("tablePath")
  // the scan instance doubles as the replaced-group record: after
  // execution its `kept` list is exactly the post-runtime-filter group
  // set the write must replace
  @volatile private var builtScan: GraftBatchScan = _

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = properties ++ options.asCaseSensitiveMap().asScala
    new GraftBatchScanBuilder(GraftBatch.resolve(merged), merged) {
      override def build(): Scan = super.build() match {
        case g: GraftBatchScan => builtScan = g; g
        case other => other // agg pushdown never fires under a rewrite
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftRowLevelBatchWrite(
          tablePath, info.schema(), partitionColumns,
          () => Option(builtScan).map(_.kept).getOrElse(Seq.empty),
          cmd.toString)
      }
    }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftBatch.FileMetadataColumn))
}

/** The replacing write: task writers reuse the streaming sink's
  * parquet writer (hive layout, attempt-unique names, footer stats);
  * the driver commits removes+adds atomically with a liveness check on
  * every replaced file.
  */
private[sources] class GraftRowLevelBatchWrite(
    tablePath: String,
    writeSchema: StructType,
    partCols: Seq[String],
    replacedFiles: () => Seq[AddFile],
    op: String) extends BatchWrite {

  require(!writeSchema.fieldNames.contains(GraftBatch.FileMetadataColumn),
    s"unexpected metadata column in the replace-data write schema: " +
      writeSchema.simpleString)

  private def conf = org.apache.spark.sql.SparkSession.active
    .sessionState.newHadoopConf()

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val serConf = new SerializableConfiguration(conf)
    GraftRowLevelWriterFactory(tablePath, writeSchema.json, partCols, serConf)
  }

  private def dropFiles(adds: Seq[AddFile]): Unit = {
    val fs = new Path(tablePath).getFileSystem(conf)
    adds.foreach(a =>
      try fs.delete(new Path(TxnLog.dataPath(tablePath, a.path)), false)
      catch { case _: Throwable => () })
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val adds = messages.flatMap {
      case m: GraftStreamCommitMessage => m.adds
      case _ => Seq.empty
    }.toSeq
    val removes = replacedFiles()
    val log = new TxnLog(tablePath, conf)
    val ts = System.currentTimeMillis()
    var attempt = 0
    while (true) {
      val snap = log.snapshotLatest()
      TxnLog.assertWritable(snap, tablePath)
      // every replaced file must still be live: a concurrent OPTIMIZE /
      // DELETE that removed one means the replacement content is stale
      val live = snap.files.map(_.path).toSet
      val gone = removes.filterNot(r => live.contains(r.path))
      if (gone.nonEmpty) {
        dropFiles(adds)
        throw new IllegalStateException(
          s"$op conflict at $tablePath: ${gone.size} scanned file(s) no " +
            s"longer live (e.g. ${gone.head.path}) — re-run the statement")
      }
      try {
        log.commit(snap.version + 1,
          removes.map(f => RemoveFile(f.path, ts, f.partitionValues)) ++
            adds :+ CommitInfo(op, ts))
        return
      } catch {
        case e: IllegalStateException
            if e.getMessage != null &&
              e.getMessage.startsWith("concurrent commit") =>
          attempt += 1
          if (attempt > 20) { dropFiles(adds); throw e }
          Thread.sleep(1L + scala.util.Random.nextInt(8))
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    dropFiles(messages.flatMap {
      case m: GraftStreamCommitMessage => m.adds
      case _ => Seq.empty
    }.toSeq)
}

private[sources] case class GraftRowLevelWriterFactory(
    tablePath: String,
    schemaJson: String,
    partitionColumns: Seq[String],
    conf: SerializableConfiguration) extends DataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    new GraftStreamingDataWriter(tablePath,
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[StructType],
      partitionColumns, conf.value, partitionId, taskId, epochId = 0L)
}
