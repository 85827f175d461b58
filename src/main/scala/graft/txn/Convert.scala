package graft.txn

import org.apache.spark.sql.SparkSession

/** CONVERT TO DELTA, graft-style: register an existing plain-parquet
  * directory (flat or hive-partitioned) as a graft table IN PLACE —
  * one metadata commit referencing the files where they already sit,
  * ZERO bytes of data rewritten. The migration path for a 100 TB
  * parquet lake: after conversion every engine feature (time travel,
  * DV deletes, MERGE, OPTIMIZE, CDC streaming, data skipping from the
  * footers' own stats) applies to data that was never copied.
  *
  * Both discovery and per-file footer stats run as CLUSTER JOBS
  * (breadth-first frontier listing via [[DistributedLs]] — re-
  * parallelizing each discovered directory LEVEL, so even a lake whose
  * files all sit under one top-level directory fans out — then one
  * footer open per file in tasks): a million-file lake converts in
  * parallel, never as a million serial driver RPCs. Only
  * file METADATA reaches the driver — the same cardinality the commit
  * itself must hold. Hive `col=value` directory segments become the
  * table's partition columns — they must agree across every file, and
  * the schema (including inferred partition column types) is Spark's
  * own unified read schema of the directory. Refuses if a transaction
  * log already exists.
  */
object Convert {

  final case class ConvertResult(
      version: Long, filesRegistered: Long, rowsRegistered: Long)

  def run(spark: SparkSession, dir: String): ConvertResult = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    // fail fast ON THE DRIVER with a clear error: a nonexistent root
    // would otherwise surface as a wrapped SparkException from the first
    // discovery task, and a file-typed root as a confusing
    // qualification-drift refusal from the relativize guard below
    require(fs.exists(root), s"CONVERT: $dir does not exist")
    require(fs.getFileStatus(root).isDirectory,
      s"CONVERT: $dir is a file, not a directory")
    val log = new TxnLog(dir, conf)
    require(log.versions().isEmpty,
      s"CONVERT: $dir already has a transaction log — refusing to " +
        "re-register (the log IS the table)")

    // discovery: (rel, size, mtime, qualified path) per parquet file —
    // breadth-first cluster listing (DistributedLs), so even a skewed
    // tree with one top-level directory fans out. rel derives from the
    // URI rendering; the 4th element is the PATH string: Hadoop's
    // Path(String) does not decode percent-escapes, so a URI round-trip
    // would mangle escaped partition values ("a b" → "a%20b")
    val rootUri = fs.makeQualified(root).toUri
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val files: Seq[(String, Long, Long, String)] =
      DistributedLs.parquetFiles(spark, conf, dir).map { e =>
        val rel = rootUri.relativize(java.net.URI.create(e.uriStr)).getPath
        // URI.relativize returns the CHILD URI unchanged when the
        // executor-side qualified URI does not prefix-match the driver's
        // root (authority/normalization drift between the two
        // makeQualified calls) — an absolute rel would silently corrupt
        // AddFile.path and hive partition parsing; fail loudly instead
        require(rel.nonEmpty && !rel.startsWith("/") && !rel.contains("://"),
          s"CONVERT: executor-qualified file URI ${e.uriStr} does not " +
            s"relativize under the table root $rootUri — filesystem " +
            "qualification drift between driver and executors; refusing " +
            "to register a corrupt path")
        (rel, e.size, e.mtime, e.pathStr)
      }.sortBy(_._1)
    require(files.nonEmpty, s"CONVERT: no parquet files under $dir")

    val partKeySets = files
      .map { case (rel, _, _, _) =>
        TableWriter.partitionValuesOf(rel).keySet
      }.distinct
    require(partKeySets.size == 1,
      s"CONVERT: inconsistent hive partitioning under $dir: " +
        partKeySets.mkString(" vs "))
    // partition COLUMN ORDER from directory depth, not set order
    val partCols = files.head._1.split('/').dropRight(1)
      .filter(_.contains('=')).map(_.split("=", 2)(0)).toSeq

    // schema AFTER discovery so the partition-column types can be vetted:
    // Spark's directory read types the hive partition columns
    // (date/numeric inference included). An UNPARTITIONED lake infers
    // from the discovered list instead — a directory read does not
    // descend plain (non-hive) nesting — and from ONE footer by default:
    // Spark's own mergeSchema=false semantics read a single footer
    // anyway, and handing it all N paths re-LISTS every file (an
    // O(files) walk the rehearsal spec flagged); opting into
    // spark.sql.parquet.mergeSchema=true unions all footers, as it
    // would for any parquet read
    val schema =
      if (partCols.isEmpty) {
        val merge = spark.conf.getOption("spark.sql.parquet.mergeSchema")
          .exists(_.equalsIgnoreCase("true"))
        val srcs = if (merge) files.map(_._4) else Seq(files.head._4)
        spark.read.parquet(srcs: _*).schema
      } else spark.read.parquet(dir).schema
    partCols.foreach { c =>
      schema.find(_.name == c).map(_.dataType).foreach {
        case org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType =>
          // timestamp-inferred directory values are session-zone formatted
          // strings the partition-value readers do not parse; refusing
          // loudly beats registering a table that throws at first read
          throw new IllegalArgumentException(
            s"CONVERT: partition column $c under $dir was inferred as a " +
              "timestamp; set spark.sql.sources." +
              "partitionColumnTypeInference.enabled=false and re-run to " +
              "register it as a string partition column")
        case _ => ()
      }
    }

    // footer stats in tasks: one footer open per file, parallel —
    // tight = false because these files come from ARBITRARY writers, and
    // non-parquet-mr writers truncate binary min/max (max incremented
    // past the real data) — sound for skipping, wrong for stats-only
    // MIN/MAX answers, so the flag routes string MIN/MAX back to a scan
    val statsByRel: Map[String, Option[FileStats]] =
      spark.sparkContext
        .parallelize(files.map(f => (f._1, f._4)),
          math.max(1, math.min(files.size, 64)))
        .mapPartitions { it =>
          val c = serConf.value
          it.map { case (rel, uri) =>
            (rel, TableWriter
              .footerStats(new org.apache.hadoop.fs.Path(uri), c)
              .map(_.copy(tight = false)))
          }
        }.collect().toMap

    val now = System.currentTimeMillis()
    var rows = 0L
    val adds = files.map { case (rel, len, mtime, _) =>
      val stats = statsByRel(rel)
      rows += stats.map(_.numRecords).getOrElse(0L)
      AddFile(
        path = rel,
        partitionValues = TableWriter.partitionValuesOf(rel),
        size = len,
        modificationTime = mtime,
        dataChange = true,
        stats = stats)
    }
    log.commit(0L,
      Metadata(schema.json, partCols) +: adds :+ CommitInfo("CONVERT", now))
    ConvertResult(0L, adds.size.toLong, rows)
  }
}
