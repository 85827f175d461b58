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
  * never one RPC per file — and past a few dozen directories the LIST
  * calls fan out as a Spark job (one task per directory batch), so a
  * 100k-partition table checks in parallel instead of serially on the
  * driver.
  */
object Fsck {

  val Operation = "FSCK"

  /** Above this many distinct directories, existence checks run as
    * executor tasks instead of a driver loop.
    */
  private[graft] val DriverDirThreshold = 64

  /** Live files whose bytes are gone, as table-relative paths (absolute
    * for shallow-clone imports). Pure read — shared by [[repair]] and
    * dry-run callers.
    */
  def missingFiles(spark: SparkSession, tablePath: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    missingOf(spark, log.snapshotLatest().files.map(_.path), tablePath, conf)
  }

  private def missingOf(
      spark: SparkSession,
      paths: Seq[String],
      tablePath: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    if (paths.isEmpty) return Seq.empty
    val resolved = paths.map { p =>
      val abs = new Path(TxnLog.dataPath(tablePath, p))
      (p, abs.getParent.toString, abs.getName)
    }
    val byDir: Seq[(String, Seq[(String, String)])] = resolved
      .groupBy(_._2).view
      .mapValues(_.map(t => (t._1, t._3))).toSeq
    def checkOne(
        dir: String,
        files: Seq[(String, String)],
        c: org.apache.hadoop.conf.Configuration): Seq[String] = {
      // per-directory filesystem: shallow-clone imports record ABSOLUTE
      // paths that may live on a different store than the table root
      val d = new Path(dir)
      val fs = d.getFileSystem(c)
      val existing: Set[String] =
        try fs.listStatus(d).map(_.getPath.getName).toSet
        catch { case _: java.io.FileNotFoundException => Set.empty[String] }
      files.collect { case (rel, name) if !existing(name) => rel }
    }
    if (byDir.size <= DriverDirThreshold)
      byDir.flatMap { case (d, fsq) => checkOne(d, fsq, conf) }.sorted
    else {
      // many partition dirs: one listStatus per dir, fanned out as tasks
      // (the collect is bounded by the MISSING count, not the file count)
      val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
      spark.sparkContext
        .parallelize(byDir, math.max(1, math.min(byDir.size, 64)))
        .flatMap { case (d, fsq) => checkOne(d, fsq, serConf.value) }
        .collect().toSeq.sorted
    }
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
      removed = missingOf(spark, liveByPath.keys.toSeq, tablePath, conf)
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
