package graft.txn

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Symlink-style manifest export (the Delta `symlink_format_manifest`
  * idea): materialize the CURRENT snapshot's live file list as plain
  * text so engines that speak only "a directory of parquet files" —
  * Presto/Trino/Hive-style external tables, or a plain DuckDB
  * `read_parquet([...])` — can read a consistent table version without
  * understanding the transaction log. The manifest is itself versioned
  * (`_manifest/manifest-<v>/part-*`) and regenerating it is
  * metadata-only.
  *
  * Scale shape: the live list comes from [[SnapshotFiles.filesDF]]
  * (checkpoint read distributed + bounded tail) and is WRITTEN BY A
  * SPARK JOB as a directory of text parts — a 5M-file manifest never
  * exists as one driver string or one serial stream, matching how Delta
  * writes per-partition manifests as a job. Legacy single-file
  * manifests (`manifest-<v>.txt`) still read.
  *
  * A deletion vector CANNOT be expressed to a manifest reader (it would
  * resurrect deleted rows), so DV-carrying snapshots are refused —
  * OPTIMIZE folds vectors back into plain files, after which export
  * works again. Same failure-over-misread stance as the Protocol guard.
  */
object Manifest {

  /** Write the manifest for the latest snapshot; returns its path. */
  def generate(spark: SparkSession, tablePath: String): Path = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    val version = log.latestVersion().getOrElse(0L)
    val live = SnapshotFiles.filesDF(spark, tablePath)
    // the DV refusal is ONE bounded aggregate over the distributed list,
    // never a driver materialization of the file set
    require(live.filter(col("dv").isNotNull).isEmpty,
      s"cannot export a manifest for $tablePath: snapshot v$version " +
        "carries deletion vectors a manifest reader would ignore — run " +
        "OPTIMIZE to fold them back first")
    val tableQ = {
      val p = new Path(tablePath)
      p.getFileSystem(conf).makeQualified(p)
    }
    val tableQStr = tableQ.toString
    // same resolution the log readers use: Path(parent, child) keeps
    // external (shallow-clone-imported) absolute paths absolute, where a
    // string concat would corrupt them
    val toAbs = udf((rel: String) => new Path(new Path(tableQStr), rel).toString)
    val dest = new Path(tableQ, f"_manifest/manifest-$version%020d")
    live.select(toAbs(col("path")).as("value"))
      .write.mode("overwrite").text(dest.toString)
    dest
  }

  /** Latest manifest's file list (what an external reader would see).
    * Reads both forms: a part-file directory (current) and the legacy
    * single `manifest-<v>.txt`.
    */
  def files(spark: SparkSession, tablePath: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(tablePath, "_manifest")
    val fs = dir.getFileSystem(conf)
    val latest = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("manifest-")).maxBy(_.getName)
    val parts: Seq[Path] =
      if (fs.getFileStatus(latest).isDirectory)
        fs.listStatus(latest).map(_.getPath)
          .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
          .sortBy(_.getName).toSeq
      else Seq(latest)
    parts.flatMap { p =>
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toIndexedSeq
      finally in.close()
    }
  }

  /** Read the table THROUGH its manifest — the external reader's view:
    * just a list of parquet files, no log, no DVs, no column mapping.
    */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(files(spark, tablePath): _*)
}
