package graft.txn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The latest snapshot's LIVE file list as a DataFrame — the
  * metadata-scale alternative to `TxnLog.snapshot().files` for consumers
  * that only need the file list (manifest export, maintenance sweeps):
  * the newest parquet CHECKPOINT is read distributed (it already holds
  * the live adds and the remove tombstones), and only the commit TAIL
  * past it (≤ checkpointInterval commits by construction) is
  * driver-parsed. A 5M-file table's list never materializes on the
  * driver — the same economics as vacuum's reclaim scan, which this
  * mirrors (TableWriter.vacuum's checkpoint-base + tail union).
  */
object SnapshotFiles {

  /** Columns: `path` (table-relative), `dv` (deletion-vector dir or
    * null) for every live file of the LATEST snapshot.
    */
  def filesDF(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    val cp: Option[Long] = log.checkpointVersions().lastOption
    // checkpoint rows are SNAPSHOT STATE at cp: each path appears once,
    // as a live add or a remove tombstone — stamping them all v=cp keeps
    // newest-wins correct against the tail (whose versions are > cp)
    val base: Option[DataFrame] = cp.map { cv =>
      spark.read.parquet(log.checkpointPaths(cv).map(_.toString): _*)
        .filter(col("kind").isin("add", "remove"))
        .select(
          col("kind"),
          coalesce(
            get_json_object(col("json"), "$.add.path"),
            get_json_object(col("json"), "$.remove.path")).as("path"),
          get_json_object(col("json"), "$.add.dv").as("dv"),
          lit(cv).as("v"))
    }
    val tailRows: Seq[(String, String, String, Long)] =
      log.changes(cp.map(_ + 1).getOrElse(0L)).flatMap { case (v, actions) =>
        actions.flatMap {
          case a: AddFile    => Some(("add", a.path, a.dv.orNull, v))
          case r: RemoveFile => Some(("remove", r.path, null: String, v))
          case _             => None
        }
      }.toSeq
    val tailDf = tailRows.toDF("kind", "path", "dv", "v")
    val acts = base.map(_.unionByName(tailDf)).getOrElse(tailDf)
    // newest add vs newest remove per path; a DV transition (remove +
    // re-add in ONE commit) lands equal versions — live, same tie rule
    // as vacuum's reclaim test, stated in the opposite direction
    acts.groupBy(col("path"))
      .agg(
        max(when(col("kind") === "add", struct(col("v"), col("dv"))))
          .as("a"),
        max(when(col("kind") === "remove", col("v"))).as("r"))
      .filter(col("a").isNotNull &&
        (col("r").isNull || col("r") <= col("a.v")))
      .select(col("path"), col("a.dv").as("dv"))
  }
}
