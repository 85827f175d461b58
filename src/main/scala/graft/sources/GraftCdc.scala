package graft.sources

import graft.txn._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 micro-batch streaming source over the graft transaction
  * log — the `spark.readStream.format("graft.sources.GraftCdc")` surface
  * (SURVEY.md §7.1 step 4). Offsets are [[CdcOffset]] JSON in Spark's own
  * streaming checkpoint; each micro-batch covers the commits between two
  * offsets, FULL_COPY snapshot first when `includeHistory=true`
  * (two-phase backfill, reference semantics T2).
  *
  * Each data-file event becomes one InputPartition; the reader streams
  * rows from the file (parquet-mr) and attaches the CDC envelope. This is
  * deliberately the row-granular path — batch analytics go through the
  * vectorized [[CdcReader.cdc]]; the streaming tail's per-commit volume
  * is small, matching the reference's design point
  * (ParquetReaderUtils.java:72–91, minus the whole-file materialization
  * and the defects).
  */
class GraftCdc extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // fail fast on bad options at load(), not first batch
    val parsed = CdcOptions.parse(options.asCaseSensitiveMap().asScala.toMap)
    GraftCdc.envelopeSchema(GraftCdc.declaredSchema(
      parsed.tablePath, new Configuration()))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftCdcTable(schema, properties.asScala.toMap)
}

object GraftCdc {

  val EnvelopeCols = 4

  def declaredSchema(tablePath: String, conf: Configuration): StructType = {
    require(tablePath != null && tablePath.nonEmpty, "tablePath is required")
    val log = new TxnLog(tablePath, conf)
    log.snapshotLatest().metadata
      .map(m => DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
      .getOrElse(throw new IllegalArgumentException(
        s"no Metadata action in $tablePath — cannot infer schema"))
  }

  def envelopeSchema(payload: StructType): StructType =
    StructType(
      StructField("op", StringType, nullable = false) ::
        StructField("partition_value", StringType, nullable = false) ::
        StructField("ts", LongType, nullable = false) ::
        StructField("commit_version", LongType, nullable = false) ::
        // payload is always nullable on read: under schema evolution, files
        // written before an add-column commit surface that column as null
        payload.fields.map(_.copy(nullable = true)).toList)
}

private[sources] class GraftCdcTable(
    tableSchema: StructType,
    properties: Map[String, String]) extends Table with SupportsRead {

  override def name(): String = s"graftcdc(${properties.getOrElse("tablePath", "?")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tableSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GraftCdcMicroBatchStream(tableSchema,
          properties ++ options.asCaseSensitiveMap().asScala)
    }
}

private[sources] class GraftCdcMicroBatchStream(
    schema: StructType,
    options: Map[String, String])
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private val opts = CdcOptions.parse(options)
  // session Hadoop conf captured on the driver, shipped to executors in
  // each partition — s3a/hdfs credentials configured on the session work
  private val serConf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
  private def log = new TxnLog(opts.tablePath, serConf.value)

  override def initialOffset(): Offset = {
    val start = opts.resolveStartVersion(log)
    val phase =
      if (opts.includeHistory) CdcOffset.FullCopy else CdcOffset.Incremental
    WrappedOffset(CdcOffset(phase, start, -1, -1))
  }

  override def latestOffset(): Offset = {
    val latest = log.latestVersion().getOrElse(0L)
    WrappedOffset(CdcOffset(CdcOffset.Incremental, latest, -1, -1))
  }

  // ------ admission control (backpressure) ------
  // The Spark-native form of the reference's bounded blocking queue
  // (DeltaLakeConnectorSource.java:57, 98–100): each micro-batch admits at
  // most maxVersionsPerTrigger commits and/or maxFilesPerTrigger data-file
  // events, so a restart against a deep backlog drains in bounded batches
  // instead of swallowing the whole log at once.

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    if (opts.maxVersionsPerTrigger.isDefined || opts.maxFilesPerTrigger.isDefined)
      ReadLimit.maxFiles(
        opts.maxFilesPerTrigger.orElse(opts.maxVersionsPerTrigger).get.toInt)
    else ReadLimit.allAvailable()
  }

  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[WrappedOffset].o
    val l = log
    val latest = l.latestVersion().getOrElse(0L)
    val limited =
      opts.maxVersionsPerTrigger.isDefined || opts.maxFilesPerTrigger.isDefined
    if (!limited) return latestOffset()
    if (s.phase == CdcOffset.FullCopy)
      // first admitted batch is the snapshot alone; incremental caps apply
      // from the next batch on
      return WrappedOffset(CdcOffset(CdcOffset.Incremental, s.version, -1, -1))
    var endV = s.version
    var files = 0L
    var versions = 0L
    val capV = opts.maxVersionsPerTrigger.getOrElse(Long.MaxValue)
    val capF = opts.maxFilesPerTrigger.getOrElse(Long.MaxValue)
    val it = l.changes(s.version + 1).iterator
    var stop = false
    while (!stop && it.hasNext && versions < capV) {
      val (v, actions) = it.next()
      val n = actions.count(a =>
        a.isInstanceOf[AddFile] || a.isInstanceOf[RemoveFile])
      // always admit at least one version per batch, else never progress
      if (versions > 0 && files + n > capF) stop = true
      else {
        endV = v
        files += n
        versions += 1
        if (files >= capF) stop = true
      }
    }
    WrappedOffset(CdcOffset(CdcOffset.Incremental, math.max(endV, s.version), -1, -1))
  }

  override def deserializeOffset(json: String): Offset =
    WrappedOffset(CdcOffset.fromJson(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WrappedOffset].o
    val e = end.asInstanceOf[WrappedOffset].o
    val l = log
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    val partCols = l.snapshotLatest().metadata.map(_.partitionColumns).getOrElse(Nil)

    def filePart(rel: String, pv: Map[String, String], op: String, ts: Long, v: Long): Unit =
      parts += CdcFilePartition(s"${opts.tablePath}/$rel", op,
        CdcReader.partitionValueString(pv), pv, ts, v, schema.json, partCols,
        serConf)

    if (s.phase == CdcOffset.FullCopy) {
      val snap = l.snapshot(s.version)
      snap.files.foreach(f =>
        filePart(f.path, f.partitionValues, "c", f.modificationTime, snap.version))
    }
    l.changes(s.version + 1).takeWhile(_._1 <= e.version).foreach { case (v, actions) =>
      actions.foreach {
        case a: AddFile => filePart(a.path, a.partitionValues, "c", a.modificationTime, v)
        case r: RemoveFile => filePart(r.path, r.partitionValues, "r", r.deletionTimestamp, v)
        case _: graft.txn.Metadata => parts += CdcMetaPartition(v, schema.json)
        case _ => ()
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcPartitionReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class WrappedOffset(o: CdcOffset) extends Offset {
  override def json(): String = o.json
}

/** One data-file CDC event; fields are all JVM-serializable. */
private[sources] case class CdcFilePartition(
    filePath: String,
    op: String,
    partitionValue: String,
    partitionValues: Map[String, String],
    ts: Long,
    version: Long,
    schemaJson: String,
    partitionColumns: Seq[String],
    conf: SerializableConfiguration) extends InputPartition

/** A schema-change control row (op='m'). */
private[sources] case class CdcMetaPartition(
    version: Long, schemaJson: String) extends InputPartition
