package graft.sources

import graft.txn._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Native DSv2 streaming sink — `df.writeStream.toTable("gcat.ns.t")`.
  *
  * Tasks write parquet files straight into the table tree under
  * attempt-unique names (hive layout for partitioned tables) and report
  * AddFile actions; the driver commits ONE log version per epoch with a
  * txn marker (`STREAMV2_<queryId>_<epochId>` in CommitInfo.operation,
  * the [[graft.streaming.GraftTableSink]] idea lifted into the V2
  * protocol). A replayed epoch finds its marker, deletes the replay's
  * files, and commits nothing — exactly-once to the table across
  * restarts. The marker scan reads newest-first and stops at the first
  * older epoch of the same query, so steady-state cost is O(1) commits.
  *
  * Restrictions (refused loudly at planning): column-mapped tables
  * (files must carry physical names) and nested/decimal payload types
  * (the task-side writer covers the primitive surface).
  */
private[sources] class GraftStreamingWrite(
    tablePath: String,
    schema: StructType,
    declaredPartitionColumns: Seq[String],
    queryId: String) extends StreamingWrite {

  import GraftStreamingWrite._

  // Partition columns come from the table's OWN metadata, not the caller:
  // via the TableProvider path (writeStream.format("graft")) the caller
  // passes Seq.empty, and trusting that would silently write a partitioned
  // table's files unpartitioned at the root — a mixed layout that breaks
  // hive inference and pruning. A non-empty ctor value must agree.
  // `readVersion` anchors the per-epoch metadata-commutativity scan.
  private val (partitionColumns: Seq[String], readVersion: Long) = {
    val conf = new Configuration()
    val snap = new TxnLog(tablePath, conf).snapshotLatest()
    val meta = snap.metadata.getOrElse(throw new IllegalArgumentException(
      s"no table metadata at $tablePath"))
    if (meta.columnMapping.nonEmpty)
      throw new UnsupportedOperationException(
        s"streaming write into a column-mapped table is not supported " +
          s"($tablePath)")
    require(declaredPartitionColumns.isEmpty ||
        declaredPartitionColumns == meta.partitionColumns,
      s"declared partition columns $declaredPartitionColumns do not match " +
        s"the table's ${meta.partitionColumns} at $tablePath")
    val declared = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(declared) == shape(schema),
      s"streaming write schema ${schema.simpleString} does not match the " +
        s"table schema at $tablePath")
    schema.fields.filterNot(f => meta.partitionColumns.contains(f.name))
      .foreach(f => messageFieldOf(f)) // fail fast on unsupported types
    (meta.partitionColumns, snap.version)
  }

  // High-water mark of the metadata-commutativity scan; epochs commit
  // serially on the driver, so advancing it across epochs keeps the scan
  // O(new versions) instead of O(stream lifetime) per epoch.
  private var checked: Long = readVersion

  private def marker(epochId: Long) = s"STREAMV2_${queryId}_$epochId"
  private val markerRe = s"STREAMV2_${java.util.regex.Pattern.quote(queryId)}_(\\d+)".r

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val serConf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    GraftStreamingWriterFactory(tablePath, schema.json,
      partitionColumns, serConf)
  }

  private def conf = org.apache.spark.sql.SparkSession.active
    .sessionState.newHadoopConf()

  private def dropFiles(adds: Seq[AddFile]): Unit = {
    val fs = new Path(tablePath).getFileSystem(conf)
    adds.foreach(a =>
      fs.delete(new Path(TxnLog.dataPath(tablePath, a.path)), false))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val adds = messages.flatMap {
      case m: GraftStreamCommitMessage => m.adds
      case _ => Seq.empty
    }.toSeq
    val log = new TxnLog(tablePath, conf)
    // replay detection: this epoch already committed → the replay's
    // files are orphans, delete them and commit nothing
    val alreadyCommitted = log.versions().reverse.view.map { v =>
      log.read(v).collectFirst { case c: CommitInfo => c.operation }
    }.collectFirst {
      case Some(op) if op == marker(epochId) => true
      case Some(markerRe(k)) if k.toLong < epochId => false
    }.getOrElse(false)
    if (alreadyCommitted) { dropFiles(adds); return }

    // Metadata-commutativity scan (appendRebasing's rule, TableWriter
    // .scala:760): a concurrent schema evolution / RENAME COLUMN /
    // protocol upgrade interleaved since this writer validated its schema
    // means the epoch's files carry a stale physical shape — rebasing
    // over it would commit wrong data. Drop the files and fail the epoch;
    // the restarted query re-validates against the new snapshot.
    var attempt = 0
    while (true) {
      val latest = log.latestVersion().getOrElse(readVersion)
      var v = checked + 1
      while (v <= latest) {
        val unsafe = log.read(v).exists {
          case _: graft.txn.Metadata | _: graft.txn.Protocol => true
          case _ => false
        }
        if (unsafe) {
          dropFiles(adds)
          throw new IllegalStateException(
            s"concurrent metadata change at $tablePath v$v — streaming " +
              "epoch unsafe to rebase; restart the query against the new " +
              "table snapshot")
        }
        v += 1
      }
      checked = latest
      try {
        log.commit(latest + 1,
          adds :+ CommitInfo(marker(epochId), System.currentTimeMillis()))
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

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    dropFiles(messages.flatMap {
      case m: GraftStreamCommitMessage => m.adds
      case _ => Seq.empty
    }.toSeq)
}

private[sources] object GraftStreamingWrite {

  /** Spark field → parquet field (primitive surface only). */
  def messageFieldOf(f: StructField): org.apache.parquet.schema.Type = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val b = f.dataType match {
      case LongType => Types.optional(INT64)
      case IntegerType => Types.optional(INT32)
      case DoubleType => Types.optional(DOUBLE)
      case FloatType => Types.optional(FLOAT)
      case BooleanType => Types.optional(BOOLEAN)
      case StringType =>
        Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
      case TimestampType => Types.optional(INT64).as(
        LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.MICROS))
      case TimestampNTZType => Types.optional(INT64).as(
        LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.MICROS))
      case DateType => Types.optional(INT32).as(
        LogicalTypeAnnotation.dateType())
      case ShortType => Types.optional(INT32).as(
        LogicalTypeAnnotation.intType(16, true))
      case ByteType => Types.optional(INT32).as(
        LogicalTypeAnnotation.intType(8, true))
      case other => throw new UnsupportedOperationException(
        s"streaming write does not support column '${f.name}': $other " +
          "(use GraftTableSink.append/foreachBatch for nested payloads)")
    }
    b.named(f.name)
  }

  def messageTypeOf(schema: StructType, partitionColumns: Seq[String]): MessageType = {
    val b = Types.buildMessage()
    schema.fields.filterNot(f => partitionColumns.contains(f.name))
      .foreach(f => b.addField(messageFieldOf(f)))
    b.named("spark_schema")
  }
}

private[sources] case class GraftStreamCommitMessage(adds: Seq[AddFile])
  extends WriterCommitMessage

private[sources] case class GraftStreamingWriterFactory(
    tablePath: String,
    schemaJson: String,
    partitionColumns: Seq[String],
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int,
      taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamingDataWriter(tablePath,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      partitionColumns, conf.value, partitionId, taskId, epochId)
}

/** One task's writer: a parquet file per touched hive partition, written
  * directly under the table tree with an attempt-unique name (uncommitted
  * files are invisible to readers; vacuum sweeps aborted ones).
  */
private[sources] class GraftStreamingDataWriter(
    tablePath: String,
    schema: StructType,
    partitionColumns: Seq[String],
    conf: Configuration,
    partitionId: Int,
    taskId: Long,
    epochId: Long) extends DataWriter[InternalRow] {

  private val fileSchema =
    GraftStreamingWrite.messageTypeOf(schema, partitionColumns)
  private val factory = new SimpleGroupFactory(fileSchema)
  private val attempt = java.util.UUID.randomUUID().toString.take(8)
  private val partIdx: Seq[Int] =
    partitionColumns.map(c => schema.fieldIndex(c))
  private val dataFields: Seq[(StructField, Int)] =
    schema.fields.zipWithIndex.toSeq
      .filterNot { case (f, _) => partitionColumns.contains(f.name) }

  // partition-value dir (hive layout, declared order) → open writer
  private val writers = scala.collection.mutable.LinkedHashMap.empty[
    String, org.apache.parquet.hadoop.ParquetWriter[
      org.apache.parquet.example.data.Group]]
  private var fileSeq = 0

  private def relDirOf(row: InternalRow): String =
    partitionColumns.zip(partIdx).map { case (c, i) =>
      val v =
        if (row.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__"
        else schema(c).dataType match {
          case StringType => row.getUTF8String(i).toString
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case other => throw new UnsupportedOperationException(
            s"streaming-write partition column '$c' of type $other")
        }
      s"$c=$v"
    }.mkString("/")

  private def writerFor(relDir: String) =
    writers.getOrElseUpdate(relDir, {
      val rel = (if (relDir.isEmpty) "" else s"$relDir/") +
        f"part-s$epochId%05d-$partitionId%05d-$fileSeq%03d-$attempt.parquet"
      fileSeq += 1
      val p = new Path(TxnLog.dataPath(tablePath, rel))
      p.getFileSystem(conf).mkdirs(p.getParent)
      val w = ExampleParquetWriter.builder(p)
        .withType(fileSchema).withConf(conf).build()
      pathsByDir(relDir) = rel
      w
    })

  private val pathsByDir = scala.collection.mutable.LinkedHashMap.empty[String, String]

  override def write(row: InternalRow): Unit = {
    val relDir = relDirOf(row)
    val g = factory.newGroup()
    dataFields.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          g.add(f.name, row.getLong(i))
        case IntegerType | DateType => g.add(f.name, row.getInt(i))
        case DoubleType => g.add(f.name, row.getDouble(i))
        case FloatType => g.add(f.name, row.getFloat(i))
        case BooleanType => g.add(f.name, row.getBoolean(i))
        case StringType => g.add(f.name, row.getUTF8String(i).toString)
        case ShortType => g.add(f.name, row.getShort(i).toInt)
        case ByteType => g.add(f.name, row.getByte(i).toInt)
        case other => throw new UnsupportedOperationException(other.toString)
      }
    }
    writerFor(relDir).write(g)
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.close())
    val now = System.currentTimeMillis()
    val adds = pathsByDir.toSeq.map { case (relDir, rel) =>
      val p = new Path(TxnLog.dataPath(tablePath, rel))
      val fs = p.getFileSystem(conf)
      AddFile(
        path = rel,
        partitionValues = TableWriter.partitionValuesOf(relDir),
        size = fs.getFileStatus(p).getLen,
        modificationTime = now,
        dataChange = true,
        stats = TableWriter.footerStats(p, conf))
    }
    GraftStreamCommitMessage(adds)
  }

  override def abort(): Unit = {
    writers.values.foreach(w => try w.close() catch { case _: Throwable => () })
    pathsByDir.values.foreach { rel =>
      val p = new Path(TxnLog.dataPath(tablePath, rel))
      try p.getFileSystem(conf).delete(p, false)
      catch { case _: Throwable => () }
    }
  }

  override def close(): Unit =
    writers.values.foreach(w => try w.close() catch { case _: Throwable => () })
}
