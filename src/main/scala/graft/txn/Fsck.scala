package graft.txn

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** FSCK REPAIR TABLE — reconcile the transaction log with physical
  * storage after out-of-band file loss (an operator's `rm`, a bucket
  * lifecycle rule, a failed restore). Live log entries whose data files
  * no longer exist are committed as removes, so snapshot reads stop
  * failing on the first lost split instead of crashing task after task.
  *
  * Delta parity: FSCK REPAIR TABLE's semantics — the removes carry
  * `dataChange=true` (rows really left the logical table) but the change
  * feed CANNOT reconstruct them (the bytes are gone), so
  * [[ChangeDataFeed.tableChanges]] refuses ranges crossing an FSCK
  * commit while the metadata-only [[ChangeDataFeed.changesSummary]]
  * still audits the lost-row COUNTS from the log's stats.
  *
  * Scale shape: existence checking is one `listStatus` per DISTINCT
  * data directory (table root + one per partition dir of a live file),
  * never one RPC per file — on an object store a million-file table
  * costs as many LIST calls as it has partitions, all driver-side
  * metadata, no executor work at all.
  */
object Fsck {

  val Operation = "FSCK"

  /** Live files whose bytes are gone, as table-relative paths (absolute
    * for shallow-clone imports). Pure read — shared by [[repair]] and
    * dry-run callers.
    */
  def missingFiles(spark: SparkSession, tablePath: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    missingOf(log.snapshotLatest().files.map(_.path), tablePath, conf)
  }

  private def missingOf(
      paths: Seq[String],
      tablePath: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    if (paths.isEmpty) return Seq.empty
    val resolved = paths.map(p => p -> new Path(TxnLog.dataPath(tablePath, p)))
    val byDir = resolved.groupBy(_._2.getParent)
    byDir.toSeq.flatMap { case (dir, files) =>
      // per-directory filesystem: shallow-clone imports record ABSOLUTE
      // paths that may live on a different store than the table root
      val fs = dir.getFileSystem(conf)
      val existing: Set[String] =
        try fs.listStatus(dir).map(_.getPath.getName).toSet
        catch { case _: java.io.FileNotFoundException => Set.empty[String] }
      files.collect { case (rel, p) if !existing(p.getName) => rel }
    }.sorted
  }

  /** Commit removes for every live-but-missing file; returns the removed
    * table-relative paths (empty = clean table, nothing committed).
    * Re-verifies under the commit's version inside the optimistic retry,
    * so a concurrent writer re-adding or removing the same path can't be
    * clobbered.
    */
  def repair(
      spark: SparkSession,
      tablePath: String,
      commitTs: Long): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    var removed: Seq[String] = Seq.empty
    OptimisticTxn.retrying(log) { v =>
      val snap = log.snapshotLatest()
      TxnLog.assertWritable(snap, tablePath)
      val liveByPath = snap.files.map(f => f.path -> f).toMap
      removed = missingOf(liveByPath.keys.toSeq, tablePath, conf)
      if (removed.nonEmpty) {
        val removes = removed.map { p =>
          val f = liveByPath(p)
          RemoveFile(p, commitTs, f.partitionValues, dataChange = true)
        }
        log.commit(v, removes :+ CommitInfo(Operation, commitTs))
      }
    }
    removed
  }
}
