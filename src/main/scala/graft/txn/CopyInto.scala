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
  * Scale shape: listing is one filesystem glob; the already-ingested
  * check is a driver-side set lookup against the snapshot's txn map
  * (bounded by ingested-file count, the same cardinality class as the
  * log's file list); reading + writing the new files is fully
  * distributed.
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
    // silently returning CopyResult(0,0,0,0); hive-style `col=value`
    // segments refuse loudly — flattening them would DROP the partition
    // columns (they live in the path, not the files), and the right tool
    // for a hive layout is CONVERT, which keeps them
    val found = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.Path]
    def visit(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) ()
        else if (st.isDirectory) {
          require(!name.contains('='),
            s"COPY INTO: $srcDir contains a hive-partitioned directory " +
              s"($name) — its partition values live in the path and would " +
              "be dropped by file-level ingestion; use graft_convert for " +
              "hive layouts")
          visit(st.getPath)
        } else if (name.endsWith(".parquet")) found += st.getPath
      }
    visit(srcRoot)
    // idempotence keys are FULLY-QUALIFIED URIs: two files with the same
    // path on different filesystems (mockfs:// vs file://) must not alias
    // as already-ingested. Markers written before the URI-keyed format
    // (scheme-less paths) still count — a format migration must not
    // re-ingest a table's whole history as duplicates.
    val all = found.map(p => fs.makeQualified(p).toUri.toString).sorted.toSeq
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
    // row count from the source FOOTERS, not a second pass over the
    // data pages (the write below is the only data read)
    val rows = fresh.map(p => TableWriter
      .footerStats(new org.apache.hadoop.fs.Path(p), conf)
      .map(_.numRecords).getOrElse(0L)).sum
    val now = System.currentTimeMillis()
    val markers = fresh.map(p => SetTxn(AppPrefix + p, 1L, now)).toSeq
    val next = snap.version + 1
    TableWriter.write(spark, df, tablePath,
      partitionBy = snap.metadata.map(_.partitionColumns).getOrElse(Seq.empty),
      version = next, commitTs = now, operation = "COPY INTO",
      extraActions = markers)
    CopyResult(next, fresh.length.toLong, rows,
      (all.length - fresh.length).toLong)
  }
}
