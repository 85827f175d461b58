package graft.txn

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Symlink-style manifest export (the Delta `symlink_format_manifest`
  * idea): materialize the CURRENT snapshot's live file list as plain
  * text so engines that speak only "a directory of parquet files" —
  * Presto/Trino/Hive-style external tables, or a plain DuckDB
  * `read_parquet([...])` — can read a consistent table version without
  * understanding the transaction log. The manifest is itself versioned
  * (`_manifest/manifest-<v>.txt`) and regenerating it is metadata-only.
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
    val snap = log.snapshotLatest()
    require(snap.files.forall(_.dv.isEmpty),
      s"cannot export a manifest for $tablePath: snapshot v${snap.version} " +
        "carries deletion vectors a manifest reader would ignore — run " +
        "OPTIMIZE to fold them back first")
    val tableQ = {
      val p = new Path(tablePath)
      p.getFileSystem(conf).makeQualified(p)
    }
    val fs = tableQ.getFileSystem(conf)
    val dest = new Path(tableQ, f"_manifest/manifest-${snap.version}%020d.txt")
    fs.mkdirs(dest.getParent)
    val body = snap.files.map(f => new Path(tableQ, f.path).toString)
      .sorted.mkString("", "\n", "\n")
    val out = fs.create(dest, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    dest
  }

  /** Latest manifest's file list (what an external reader would see). */
  def files(spark: SparkSession, tablePath: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(tablePath, "_manifest")
    val fs = dir.getFileSystem(conf)
    val latest = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("manifest-")).maxBy(_.getName)
    val in = fs.open(latest)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toIndexedSeq
    finally in.close()
  }

  /** Read the table THROUGH its manifest — the external reader's view:
    * just a list of parquet files, no log, no DVs, no column mapping.
    */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(files(spark, tablePath): _*)
}
