package graft.txn

import org.apache.spark.sql.SparkSession

/** COPY INTO — idempotent bulk file ingestion (the Delta/warehouse
  * `COPY INTO` statement): every raw source file lands in the table
  * EXACTLY ONCE, no matter how many times the command is retried,
  * because the per-file idempotence marker ([[SetTxn]] with
  * `appId = "copy:<source path>"`) commits ATOMICALLY with the
  * ingested data. A retry consults the snapshot's txn map and skips
  * files already recorded — there is no window where data landed but
  * the marker didn't (the failure mode of any two-commit design).
  *
  * Scale shape: source discovery runs as CLUSTER JOBS (breadth-first
  * frontier listing via [[DistributedLs]] — skewed trees fan out past
  * one task), the already-ingested check is a set
  * lookup against the snapshot's txn map (bounded by ingested-file
  * count; see [[TxnLog]]'s txn-marker retention for how that set stays
  * bounded over a table's life), reading + writing the new files is
  * fully distributed, and the row count comes from the committed
  * AddFiles' own stats — never a per-source-file driver footer loop.
  */
object CopyInto {

  private val AppPrefix = "copy:"

  /** Result of one COPY INTO run. */
  final case class CopyResult(
      version: Long,
      filesCopied: Long,
      rowsCopied: Long,
      filesSkipped: Long)

  /** Ingest every parquet file under `srcDir` not already recorded in
    * the table's txn map. The target table must exist (its schema is
    * the contract the source files are read under — extra source
    * columns refuse rather than silently dropping).
    */
  def run(spark: SparkSession, tablePath: String, srcDir: String)
      : CopyResult = {
    val conf = spark.sessionState.newHadoopConf()
    val srcRoot = new org.apache.hadoop.fs.Path(srcDir)
    val fs = srcRoot.getFileSystem(conf)
    // RECURSIVE listing so a nested source layout ingests instead of
    // silently returning CopyResult(0,0,0,0) — breadth-first cluster
    // listing (DistributedLs), so a skewed source tree fans out past one
    // task. Hive-style `col=value` segments refuse loudly (the walk
    // REPORTS them instead of descending) — flattening them would DROP
    // the partition columns (they live in the path, not the files), and
    // the right tool for a hive layout is CONVERT, which keeps them.
    require(fs.exists(srcRoot), s"COPY INTO: $srcDir does not exist")
    val discovered = DistributedLs.parquetFiles(spark, conf, srcDir,
      descend = name => !name.contains('='))
    val hiveDirs = discovered.collect { case e if e.isDir => e.name }
    require(hiveDirs.isEmpty,
      s"COPY INTO: $srcDir contains a hive-partitioned directory " +
        s"(${hiveDirs.head}) — its partition values live in the path and " +
        "would be dropped by file-level ingestion; use graft_convert for " +
        "hive layouts")
    // idempotence keys are FULLY-QUALIFIED URIs: two files with the same
    // path on different filesystems (mockfs:// vs file://) must not alias
    // as already-ingested. Markers written before the URI-keyed format
    // (scheme-less paths) still count — a format migration must not
    // re-ingest a table's whole history as duplicates.
    val all = discovered.collect { case e if !e.isDir => e.uriStr }.sorted
    val log = new TxnLog(tablePath, conf)
    val snap = log.snapshotLatest()
    val ingested = snap.txns.keySet
      .filter(_.startsWith(AppPrefix)).map(_.stripPrefix(AppPrefix))
    def seen(uri: String): Boolean =
      ingested.contains(uri) ||
        ingested.contains(new org.apache.hadoop.fs.Path(uri).toUri.getPath)
    val fresh = all.filterNot(seen)
    if (fresh.isEmpty)
      return CopyResult(snap.version, 0L, 0L, all.length.toLong)

    val declared = org.apache.spark.sql.types.DataType
      .fromJson(snap.metadata.get.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // schema inference reads FOOTERS only — the check is metadata-cheap
    val srcCols = spark.read.parquet(fresh: _*).schema.fieldNames.toSet
    val extra = srcCols -- declared.fieldNames.toSet
    require(extra.isEmpty,
      s"COPY INTO $tablePath: source files carry columns absent from " +
        s"the table schema: ${extra.mkString(", ")} — refusing to drop " +
        "data silently")
    val df = spark.read.schema(declared).parquet(fresh: _*)
    val now = System.currentTimeMillis()
    val markers = fresh.map(p => SetTxn(AppPrefix + p, 1L, now)).toSeq
    val next = snap.version + 1
    TableWriter.write(spark, df, tablePath,
      partitionBy = snap.metadata.map(_.partitionColumns).getOrElse(Seq.empty),
      version = next, commitTs = now, operation = "COPY INTO",
      extraActions = markers)
    // row count from the COMMITTED AddFiles' own stats (one commit read,
    // bounded by output file count) — never a per-source-file footer loop
    val rows = log.read(next).collect {
      case a: AddFile => a.stats.map(_.numRecords).getOrElse(0L)
    }.sum
    CopyResult(next, fresh.length.toLong, rows,
      (all.length - fresh.length).toLong)
  }
}
