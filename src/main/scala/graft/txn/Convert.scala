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
  * Discovery is one recursive listing; per-file column stats come from
  * parquet FOOTERS (no data pages read). Hive `col=value` directory
  * segments become the table's partition columns — they must agree
  * across every file, and the schema (including inferred partition
  * column types) is Spark's own unified read schema of the directory.
  * Refuses if a transaction log already exists.
  */
object Convert {

  final case class ConvertResult(
      version: Long, filesRegistered: Long, rowsRegistered: Long)

  def run(spark: SparkSession, dir: String): ConvertResult = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"CONVERT: $dir does not exist")
    val log = new TxnLog(dir, conf)
    require(log.versions().isEmpty,
      s"CONVERT: $dir already has a transaction log — refusing to " +
        "re-register (the log IS the table)")

    val files = scala.collection.mutable.ArrayBuffer
      .empty[(String, org.apache.hadoop.fs.FileStatus)]
    def visit(p: org.apache.hadoop.fs.Path, rel: String): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) ()
        else if (st.isDirectory)
          visit(st.getPath, if (rel.isEmpty) name else s"$rel/$name")
        else if (name.endsWith(".parquet"))
          files += (((if (rel.isEmpty) "" else s"$rel/") + name, st))
      }
    visit(root, "")
    require(files.nonEmpty, s"CONVERT: no parquet files under $dir")

    val partKeySets = files
      .map { case (rel, _) => TableWriter.partitionValuesOf(rel).keySet }
      .distinct
    require(partKeySets.size == 1,
      s"CONVERT: inconsistent hive partitioning under $dir: " +
        partKeySets.mkString(" vs "))
    // partition COLUMN ORDER from directory depth, not set order
    val partCols = files.head._1.split('/').dropRight(1)
      .filter(_.contains('=')).map(_.split("=", 2)(0)).toSeq

    // schema AFTER discovery so the partition-column types can be vetted:
    // Spark's directory read unifies footers and types the hive partition
    // columns (date/numeric inference included)
    val schema = spark.read.parquet(dir).schema
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

    val now = System.currentTimeMillis()
    var rows = 0L
    val adds = files.map { case (rel, st) =>
      // tight = false: these files come from ARBITRARY writers, and
      // non-parquet-mr writers truncate binary min/max (max incremented
      // past the real data) — sound for skipping, wrong for stats-only
      // MIN/MAX answers, so the flag routes string MIN/MAX back to a scan
      val stats = TableWriter.footerStats(st.getPath, conf)
        .map(_.copy(tight = false))
      rows += stats.map(_.numRecords).getOrElse(0L)
      AddFile(
        path = rel,
        partitionValues = TableWriter.partitionValuesOf(rel),
        size = st.getLen,
        modificationTime = st.getModificationTime,
        dataChange = true,
        stats = stats)
    }.toSeq
    log.commit(0L,
      Metadata(schema.json, partCols) +: adds :+ CommitInfo("CONVERT", now))
    ConvertResult(0L, adds.size.toLong, rows)
  }
}
