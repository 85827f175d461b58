package graft.sources

import graft.txn._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** Delta-based (merge-on-read) row-level operations — the DSv2
  * `SupportsDelta` surface behind SQL `UPDATE` / `MERGE INTO` / `DELETE`
  * when `spark.graft.update.mode=dv` (resp. `spark.graft.delete.mode=dv`
  * for the rewrite-path DELETE). Where the group-based operation
  * ([[GraftRowLevelOperation]]) rewrites every file GROUP containing a
  * match, this one never rewrites a data file at all:
  *
  *  - matched OLD rows are identified by the scan's (file, position)
  *    row id (`_graft_file`, `_graft_pos`) and marked dead in a
  *    KB-scale deletion-vector sidecar — the DELETE-dv machinery
  *    ([[graft.txn.DeletionVectors]]) applied to UPDATE and MERGE;
  *  - replacement rows (UPDATE/MERGE-update images) and MERGE inserts
  *    APPEND as new files.
  *
  * A 1k-row UPDATE on a 100 TB table therefore writes kilobytes of
  * sidecar + one small file, instead of rewriting every touched ~1 GB
  * file. `graft_reorg` folds the vectors back off the hot path.
  *
  * Spark plans `WriteDelta` for an operation implementing
  * [[SupportsDelta]]: each task's [[DeltaWriter]] receives discriminated
  * delete(id) / update(id, row) / insert(row) calls, so exact CDF images
  * come for free — dead handles stage per task (with an 'u'/'d' kind),
  * update rows and insert rows write to SEPARATE data files, and the
  * commit reconstructs update_preimage/delete rows by joining the
  * handles back to the affected files (the only re-read, proportional
  * to AFFECTED files, not the table).
  */
private[sources] class GraftDeltaRowLevelOperation(
    cmd: RowLevelOperation.Command,
    properties: Map[String, String],
    partitionColumns: Seq[String])
  extends RowLevelOperation with SupportsDelta {

  private val tablePath = properties("tablePath")
  @volatile private var builtScan: GraftBatchScan = _
  @volatile private var builtFilters: Array[
    org.apache.spark.sql.sources.Filter] = Array.empty

  override def command(): RowLevelOperation.Command = cmd

  /** (file, raw position) — exactly the identity a DV sidecar keys. */
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftBatch.FileMetadataColumn),
    Expressions.column(GraftBatch.PosMetadataColumn))

  // keep update() discriminated from delete()+insert(): the CDF needs
  // exact update_preimage/update_postimage rows, not a delete/insert pair
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = properties ++ options.asCaseSensitiveMap().asScala
    new GraftBatchScanBuilder(GraftBatch.resolve(merged), merged) {
      override def build(): Scan = super.build() match {
        case g: GraftBatchScan =>
          builtScan = g; builtFilters = pushedFilters(); g
        case other => other
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = new GraftDeltaBatchWrite(
          tablePath, info.schema(), partitionColumns,
          () => Option(builtScan), () => builtFilters, cmd.toString)
      }
    }

  // row ids arrive via rowId(); partition values ride the data row
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty
}

/** One task's delta output: new data files (update images and inserts
  * written SEPARATELY so the commit can classify CDF rows without
  * re-deriving anything) plus the staged dead-handle files.
  */
private[sources] case class GraftDeltaCommitMessage(
    updateAdds: Seq[AddFile],
    insertAdds: Seq[AddFile],
    handleFiles: Seq[String]) extends WriterCommitMessage

private[sources] object GraftDeltaBatchWrite {
  /** Staged dead-handle row shape: which file, which raw position, and
    * whether the row died to an UPDATE ('u') or a DELETE ('d').
    */
  val HandleSchema: StructType = StructType(Seq(
    StructField("file_name", StringType, nullable = false),
    StructField("row_index", LongType, nullable = false),
    StructField("kind", StringType, nullable = false)))
}

/** The merge-on-read commit: one DV directory (new dead rows + carried
  * prior kills of the affected files), re-adds of the affected files
  * with updated pointers, appends of the new files, exact CDF sidecars
  * — all in ONE log version, under the same two conflict checks as the
  * copy-on-write path (AddFile IDENTITY on every file gaining a
  * pointer; no concurrently appended file may have matched the read).
  */
private[sources] class GraftDeltaBatchWrite(
    tablePath: String,
    dataSchema: StructType,
    partCols: Seq[String],
    boundScan: () => Option[GraftBatchScan],
    pushedFilters: () => Array[org.apache.spark.sql.sources.Filter],
    cmdName: String) extends DeltaBatchWrite {

  private val op = s"${cmdName}_DV"
  private val txnId = java.util.UUID.randomUUID().toString.take(8)
  private[sources] val stagingRel = s".staging-rlh-$txnId"

  require(!dataSchema.fieldNames.contains(GraftBatch.FileMetadataColumn) &&
      !dataSchema.fieldNames.contains(GraftBatch.PosMetadataColumn),
    s"unexpected metadata column in the delta write data schema: " +
      dataSchema.simpleString)

  private def conf = org.apache.spark.sql.SparkSession.active
    .sessionState.newHadoopConf()

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    GraftDeltaWriterFactory(tablePath, dataSchema.json, partCols,
      stagingRel, new SerializableConfiguration(conf))

  private def dropStaging(): Unit = {
    val p = new Path(tablePath, stagingRel)
    try p.getFileSystem(conf).delete(p, true)
    catch { case _: Throwable => () }
  }

  private def collect(messages: Array[WriterCommitMessage])
      : Seq[GraftDeltaCommitMessage] =
    messages.toSeq.collect { case m: GraftDeltaCommitMessage => m }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val msgs = collect(messages)
    val updateAdds = msgs.flatMap(_.updateAdds)
    val insertAdds = msgs.flatMap(_.insertAdds)
    val newAdds = updateAdds ++ insertAdds
    // only files named by SUCCESSFUL task commits count — the staging
    // dir may hold orphans from failed attempts
    val handlePaths = msgs.flatMap(_.handleFiles)
      .map(rel => s"$tablePath/$stagingRel/$rel")
    val log = new TxnLog(tablePath, conf)
    def fail(t: Throwable): Nothing = {
      GraftRowLevelOps.dropFiles(tablePath, conf, newAdds)
      dropStaging()
      throw t
    }
    try GraftRowLevelOps.validateReplacement(tablePath, conf, newAdds, log)
    catch { case t: Throwable => dropStaging(); throw t }

    val handles =
      if (handlePaths.isEmpty) None
      else Some(spark.read.schema(GraftDeltaBatchWrite.HandleSchema)
        .parquet(handlePaths: _*).persist())
    try {
      // bounded: one row per file that LOST rows (≤ |files|)
      val affectedNames: Set[String] = handles match {
        case None => Set.empty
        case Some(h) => h.select(col("file_name")).distinct()
          .collect().map(_.getString(0)).toSet
      }
      val scan = boundScan().getOrElse(throw new IllegalStateException(
        s"$op at $tablePath: no bound scan — the delta write cannot " +
          "locate the rows it marks dead"))
      // handles and DV sidecars key rows by file BASENAME — sound for
      // files this table wrote (names embed version + ordinal) but a
      // shallow-clone import can collide with a local name. A silent
      // collision would mark the WRONG file's positions dead: refuse.
      val dupNames = scan.boundResolved.files
        .groupBy(f => new Path(f.path).getName)
        .collect { case (n, fs) if fs.size > 1 => n }
      if (dupNames.nonEmpty)
        fail(new UnsupportedOperationException(
          s"$op at $tablePath in dv mode: ${dupNames.size} live file " +
            s"basename(s) collide (e.g. ${dupNames.head}; clone " +
            "imports?) — deletion-vector row identity is " +
            "basename-keyed; run in copy-on-write mode or deep-clone " +
            "first"))
      val byName = scan.boundResolved.files
        .map(f => new Path(f.path).getName -> f).toMap
      val affected = affectedNames.toSeq.sorted.map(n => byName.getOrElse(n,
        fail(new IllegalStateException(
          s"$op at $tablePath: handle names unknown file $n"))))

      val ts = System.currentTimeMillis()
      var attempt = 0
      var committed = false
      while (!committed) {
        val snap = log.snapshotLatest()
        TxnLog.assertWritable(snap, tablePath)
        // identity, not path: a concurrent DV delete re-adds the same
        // path with a NEW pointer — re-pointing it from OUR carried set
        // would silently resurrect the concurrently deleted rows
        val current = snap.files.map(f => f.path -> f).toMap
        val stale = affected.filterNot(a => current.get(a.path).contains(a))
        if (stale.nonEmpty)
          fail(new IllegalStateException(
            s"$op conflict at $tablePath: ${stale.size} scanned file(s) " +
              s"changed or vanished since the scan (e.g. " +
              s"${stale.head.path}) — re-run the statement"))
        val matching = GraftRowLevelOps.matchingConcurrentAppends(
          log, scan, pushedFilters())
        if (matching.nonEmpty)
          fail(new IllegalStateException(
            s"$op conflict at $tablePath: ${matching.size} file(s) " +
              s"appended concurrently may match the operation's read " +
              s"(e.g. ${matching.head.path}) — re-run the statement"))

        val version = snap.version + 1
        // the new vector: this statement's dead rows + the affected
        // files' prior kills (pointers replace, never chain)
        val dvRel: Option[String] = handles.map { h =>
          val newDead = h.select(col("file_name"), col("row_index"),
            lit(version).as("deleted_at"))
          val allRows = DeletionVectors
            .carriedRows(spark, tablePath, affected)
            .fold(newDead)(newDead.unionByName(_))
          DeletionVectors.stageVector(spark, tablePath, version, allRows)
        }
        val removes = affected.map(f =>
          RemoveFile(f.path, ts, f.partitionValues))
        val readds = affected.map(_.copy(
          modificationTime = ts, dataChange = true, dv = dvRel))
        val protocol: Seq[Action] =
          if (dvRel.isEmpty ||
              snap.protocol.exists(_.minReaderVersion >= 2)) Seq.empty
          else Seq(Protocol(2, 2))
        val cdcActions: Seq[Action] =
          if (!ChangeDataFeed.enabled(snap)) Seq.empty
          else stageCdf(spark, snap, affected, handles, updateAdds,
            insertAdds, version)
        try {
          log.commit(version,
            protocol ++ removes ++ readds ++ newAdds ++ cdcActions :+
              CommitInfo(op, ts))
          committed = true
        } catch {
          case e: IllegalStateException
              if e.getMessage != null &&
                e.getMessage.startsWith("concurrent commit") =>
            // the staged vector is version-named: drop and re-stage
            // against the new head next attempt (CDC files re-stage too;
            // uncommitted leftovers are invisible and vacuum-swept)
            dvRel.foreach(DeletionVectors.dropVector(spark, tablePath, _))
            attempt += 1
            if (attempt > 20) fail(e)
            Thread.sleep(1L + scala.util.Random.nextInt(8))
        }
      }
    } finally {
      handles.foreach(_.unpersist())
      dropStaging()
    }
  }

  /** Exact change rows for the feed: update/delete PREIMAGES join the
    * dead handles back to the affected files' live rows (the only
    * re-read — affected files, never the table); update POSTIMAGES and
    * inserts read straight from the just-staged new files.
    */
  private def stageCdf(
      spark: org.apache.spark.sql.SparkSession,
      snap: Snapshot,
      affected: Seq[AddFile],
      handles: Option[org.apache.spark.sql.DataFrame],
      updateAdds: Seq[AddFile],
      insertAdds: Seq[AddFile],
      version: Long): Seq[CdcFile] = {
    val declared = snap.metadata.map(m =>
      DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
    val partitionColumns =
      snap.metadata.map(_.partitionColumns).getOrElse(Seq.empty)
    val pre = handles.filter(_ => affected.nonEmpty).map { h =>
      DeletionVectors.readFiles(spark, tablePath, affected, declared,
          withRowMeta = true)
        .join(h, col("_fn") === col("file_name") &&
          col("_ri") === col("row_index"))
        .withColumn(ChangeDataFeed.TypeCol,
          when(col("kind") === "u", ChangeDataFeed.UpdatePre)
            .otherwise(ChangeDataFeed.Delete))
        .drop("_fn", "_ri", "_path", "file_name", "row_index", "kind")
    }
    def readNew(adds: Seq[AddFile], kind: String) =
      if (adds.isEmpty) None
      else Some(declared.fold(spark.read)(s => spark.read.schema(s))
        .option("basePath", tablePath)
        .parquet(adds.map(a => TxnLog.dataPath(tablePath, a.path)): _*)
        .withColumn(ChangeDataFeed.TypeCol, lit(kind)))
    val frames = pre.toSeq ++
      readNew(updateAdds, ChangeDataFeed.UpdatePost).toSeq ++
      readNew(insertAdds, ChangeDataFeed.Insert).toSeq
    if (frames.isEmpty) Seq.empty
    else ChangeDataFeed.stage(spark, frames.reduce(_ unionByName _),
      tablePath, version, partitionColumns)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = collect(messages)
    GraftRowLevelOps.dropFiles(tablePath, conf,
      msgs.flatMap(m => m.updateAdds ++ m.insertAdds))
    dropStaging()
  }
}

private[sources] case class GraftDeltaWriterFactory(
    tablePath: String,
    schemaJson: String,
    partitionColumns: Seq[String],
    stagingRel: String,
    conf: SerializableConfiguration) extends DeltaWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaDataWriter(tablePath,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      partitionColumns, stagingRel, conf.value, partitionId, taskId)
}

/** One task's delta writer. Update images and inserts go to SEPARATE
  * data writers (distinct epoch tags keep the attempt-unique names
  * apart) so the commit can classify CDF rows by file provenance; dead
  * handles stream to one small parquet sidecar in the write's staging
  * dir. All three writers are lazy — a task that only deletes writes
  * no data file at all.
  */
private[sources] class GraftDeltaDataWriter(
    tablePath: String,
    schema: StructType,
    partitionColumns: Seq[String],
    stagingRel: String,
    conf: Configuration,
    partitionId: Int,
    taskId: Long) extends DeltaWriter[InternalRow] {

  private var updWriter: GraftStreamingDataWriter = _
  private var insWriter: GraftStreamingDataWriter = _

  private val handleSchema = GraftDeltaBatchWrite.HandleSchema
  private val handleType =
    GraftStreamingWrite.messageTypeOf(handleSchema, Seq.empty)
  private val handleFactory = new SimpleGroupFactory(handleType)
  private var handleWriter: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = _
  private var handleRel: String = _

  private def handles() = {
    if (handleWriter == null) {
      val attempt = java.util.UUID.randomUUID().toString.take(8)
      handleRel = f"handles-$partitionId%05d-$taskId-$attempt.parquet"
      val p = new Path(new Path(tablePath, stagingRel), handleRel)
      p.getFileSystem(conf).mkdirs(p.getParent)
      handleWriter = ExampleParquetWriter.builder(p)
        .withType(handleType).withConf(conf).build()
    }
    handleWriter
  }

  private def writeHandle(id: InternalRow, kind: String): Unit = {
    // rowId() order: (_graft_file absolute path, _graft_pos)
    val abs = id.getUTF8String(0).toString
    val g = handleFactory.newGroup()
    g.add("file_name", abs.substring(abs.lastIndexOf('/') + 1))
    g.add("row_index", id.getLong(1))
    g.add("kind", kind)
    handles().write(g)
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    writeHandle(id, "d")

  override def update(
      meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    writeHandle(id, "u")
    if (updWriter == null)
      updWriter = new GraftStreamingDataWriter(tablePath, schema,
        partitionColumns, conf, partitionId, taskId, epochId = 1L)
    updWriter.write(row)
  }

  override def insert(row: InternalRow): Unit = {
    if (insWriter == null)
      insWriter = new GraftStreamingDataWriter(tablePath, schema,
        partitionColumns, conf, partitionId, taskId, epochId = 2L)
    insWriter.write(row)
  }

  private def addsOf(w: GraftStreamingDataWriter): Seq[AddFile] =
    if (w == null) Seq.empty
    else w.commit() match {
      case m: GraftStreamCommitMessage => m.adds
      case _ => Seq.empty
    }

  override def commit(): WriterCommitMessage = {
    if (handleWriter != null) handleWriter.close()
    GraftDeltaCommitMessage(
      updateAdds = addsOf(updWriter),
      insertAdds = addsOf(insWriter),
      handleFiles = Option(handleRel).toSeq)
  }

  override def abort(): Unit = {
    if (handleWriter != null) {
      try handleWriter.close() catch { case _: Throwable => () }
      val p = new Path(new Path(tablePath, stagingRel), handleRel)
      try p.getFileSystem(conf).delete(p, false)
      catch { case _: Throwable => () }
    }
    if (updWriter != null) updWriter.abort()
    if (insWriter != null) insWriter.abort()
  }

  override def close(): Unit = {
    if (handleWriter != null)
      try handleWriter.close() catch { case _: Throwable => () }
    if (updWriter != null) updWriter.close()
    if (insWriter != null) insWriter.close()
  }
}
