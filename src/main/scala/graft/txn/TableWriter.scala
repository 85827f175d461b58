package graft.txn

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-parquet table writer: stages a DataFrame write, then commits
  * AddFile actions atomically — the "Delta sink" of SURVEY.md §7.1 step 3.
  * Files are written by Spark's distributed parquet writer (one task per
  * partition), so the data path scales with the cluster; only the
  * file-list commit is driver-side.
  */
object TableWriter {

  /** Write `df` as version `v` of `tablePath` (appending to prior
    * versions), optionally hive-partitioned by `partitionBy`.
    * `commitTs` is the deterministic event/commit time recorded in the
    * log (epoch millis) so fixtures and tests are reproducible.
    */
  /** Route every row to one of `n` buckets by the reference's output
    * contract — murmur3_x86_32 of the canonical partition-value string
    * modulo n (DeltaReader.java:60–63, DeltaRecord.java:228–234) — and
    * make the routing a SINK property: one shuffle, bucket i's rows land
    * in files under `route=i`. A downstream consumer (the reference's
    * per-partition Pulsar producers) reads its slot's directory only.
    */
  def writeRouted(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      partitionBy: Seq[String],
      routeBuckets: Int,
      version: Long = 0L,
      commitTs: Long = 0L): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, concat, lit}
    // null partition values hash as the canonical hive form the txn log
    // records ("col=__HIVE_DEFAULT_PARTITION__") — concat_ws would DROP
    // the null part and silently route to a slot that disagrees with the
    // file's recorded partitionValues
    val pvExpr =
      if (partitionBy.isEmpty) lit("")
      else concat(partitionBy.sorted.zipWithIndex.flatMap { case (c, i) =>
        val part = Seq(lit(c), lit("="),
          coalesce(col(c).cast("string"), lit("__HIVE_DEFAULT_PARTITION__")))
        if (i == 0) part else lit(",") +: part
      }: _*)
    val routed = df
      .withColumn("route", graft.functions.Murmur3X86.routeIndex(pvExpr, routeBuckets))
      .repartition(routeBuckets, col("route"))
    write(spark, routed, tablePath, partitionBy = Seq("route") ++ partitionBy,
      version = version, commitTs = commitTs, operation = "WRITE_ROUTED")
  }

  def write(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      partitionBy: Seq[String] = Seq.empty,
      version: Long = 0L,
      commitTs: Long = 0L,
      operation: String = "WRITE",
      extraActions: Seq[Action] = Seq.empty): Unit = {
    // INT64-micros timestamps (not INT96) so every reader — including the
    // row-granular streaming PartitionReader — sees a plain long column.
    // Scoped to this write: the previous session value is restored after.
    val tsTypeKey = "spark.sql.parquet.outputTimestampType"
    val prevTsType = spark.conf.getOption(tsTypeKey)
    spark.conf.set(tsTypeKey, "TIMESTAMP_MICROS")
    try doWrite(spark, df, tablePath, partitionBy, version, commitTs,
      operation, extraActions)
    finally prevTsType match {
      case Some(v) => spark.conf.set(tsTypeKey, v)
      case None    => spark.conf.unset(tsTypeKey)
    }
  }

  private def doWrite(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      partitionBy: Seq[String],
      version: Long,
      commitTs: Long,
      operation: String,
      extraActions: Seq[Action]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    val staging = new Path(tablePath, s".staging-$version")
    fs.delete(staging, true)

    val writer = if (partitionBy.nonEmpty) df.write.partitionBy(partitionBy: _*)
    else df.write
    writer.mode("overwrite").parquet(staging.toString)

    // Move staged parts into the table tree under stable names and build
    // the AddFile actions from their (relative) paths.
    val adds = scala.collection.mutable.ArrayBuffer.empty[AddFile]
    def visit(dir: Path, rel: String): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) visit(st.getPath, if (rel.isEmpty) name else s"$rel/$name")
        else if (name.endsWith(".parquet")) {
          val destRel =
            (if (rel.isEmpty) "" else s"$rel/") +
              f"part-$version%05d-${adds.size}%05d.parquet"
          val dest = new Path(table, destRel)
          fs.mkdirs(dest.getParent)
          if (!fs.rename(st.getPath, dest))
            throw new IllegalStateException(s"rename failed: $dest")
          adds += AddFile(
            path = destRel,
            partitionValues = partitionValuesOf(rel),
            size = st.getLen,
            modificationTime = commitTs,
            dataChange = true)
        }
      }
    visit(staging, "")
    fs.delete(staging, true)

    val meta = Metadata(df.schema.json, partitionBy)
    val log = new TxnLog(tablePath, conf)
    val metaAction: Seq[Action] =
      if (version == 0L || extraActions.exists(_.isInstanceOf[Metadata])) Seq(meta)
      else Seq.empty
    log.commit(version,
      metaAction ++ extraActions.filterNot(_.isInstanceOf[Metadata]) ++
        adds.toSeq :+ CommitInfo(operation, commitTs))
  }

  /** Commit RemoveFile actions for every live file whose partitionValues
    * satisfy `pred` — partition-granularity delete, the CDC-generating
    * delete shape of the reference (RemoveFile actions,
    * DeltaReader.java:221–235). Data files are retained for replay.
    */
  def removeWhere(
      spark: SparkSession,
      tablePath: String,
      pred: Map[String, String] => Boolean,
      version: Long,
      commitTs: Long): Seq[RemoveFile] = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    val doomed = log.snapshotLatest().files.filter(f => pred(f.partitionValues))
    val removes = doomed.map(f =>
      RemoveFile(f.path, commitTs, f.partitionValues))
    log.commit(version, removes :+ CommitInfo("DELETE", commitTs))
    removes
  }

  /** `l_returnflag=A/...` → Map(l_returnflag -> A) (hive-style dirs). */
  private[txn] def partitionValuesOf(rel: String): Map[String, String] =
    if (rel.isEmpty) Map.empty
    else rel.split('/').filter(_.contains('=')).map { seg =>
      val Array(k, v) = seg.split("=", 2)
      k -> v
    }.toMap
}
