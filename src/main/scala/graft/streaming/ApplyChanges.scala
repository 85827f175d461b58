package graft.streaming

import graft.txn._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** APPLY CHANGES: replay a CDC envelope stream (op / commit_version
  * rows, the graft_changes shape) into a target graft table — the Delta
  * "apply changes into" idea, one call per `foreachBatch` micro-batch.
  *
  * Two identity modes:
  *
  *  - KEYED (`keyCols` non-empty): the declared key identifies one
  *    logical row, so the whole micro-batch COLLAPSES to the last op
  *    per key (version order; within a version the insert of an r+c
  *    pair wins — that pair IS an update). The replay is then AT MOST
  *    two commits regardless of how many source versions the batch
  *    spans — one keyed DV delete of every touched key (skipped when
  *    the target does not exist yet), one append of the surviving
  *    rows. Batch boundaries cannot change the outcome
  *    (ApplyChangesSpec pins invariance), and cost no longer scales
  *    with source commit count — the r7 serial-replay flaw.
  *
  *  - FULL-ROW (`keyCols` empty, for tables with no declared key):
  *    removes must see the state BEFORE their version, so versions
  *    replay in order — but runs of consecutive INSERT-ONLY versions
  *    batch into a single append commit (a remove-bearing version
  *    flushes the pending run first, applies its keyed-by-full-row DV
  *    delete, then starts a new run with its own inserts). Note
  *    full-row deleteMatching kills ALL duplicate copies of a matched
  *    row (see DeletionVectors.deleteMatching) — exact replay needs a
  *    duplicate-free table or a declared key.
  *
  * Remove ops cover BOTH envelope codes: 'r' (file-level removes) and
  * 'd' (deletion-vector deletes). 'm' (schema-change) control rows
  * carry no payload and are skipped.
  */
object ApplyChanges {

  val EnvelopeCols: Seq[String] =
    Seq("op", "partition_value", "ts", "commit_version")

  /** Replay one micro-batch of the CDC envelope into `dst`. */
  def applyBatch(
      spark: SparkSession,
      batch: DataFrame,
      dst: String,
      keyCols: Seq[String] = Seq.empty,
      envelope: Seq[String] = EnvelopeCols): Unit = {
    val b = batch.filter(col("op").isin("r", "d", "c")).persist()
    try {
      if (b.isEmpty) return
      if (keyCols.nonEmpty) applyKeyed(spark, b, dst, keyCols, envelope)
      else applyFullRow(spark, b, dst, envelope)
    } finally { b.unpersist(); () }
  }

  /** Replay one micro-batch of the CHANGE DATA FEED (the
    * [[graft.sources.GraftCdf]] / graft_table_changes shape) into `dst`,
    * keyed: `delete` AND `update_preimage` rows drop their keys,
    * `update_postimage` and `insert` rows upsert. Preimages must count
    * as removes — an UPDATE is free to SET a key column, and then the
    * OLD key exists only in the preimage; dropping preimages would
    * leave that stale row in the replica forever. For the common
    * key-preserving update the preimage's remove and the postimage's
    * upsert share a key, and the collapse resolves them: last change
    * per key in `_commit_version` order, postimage/insert outranking a
    * remove within one version (that pair IS an update). The replay is
    * at most one keyed DV delete plus one append regardless of how many
    * source commits the batch spans.
    */
  def applyCdfBatch(
      spark: SparkSession,
      batch: DataFrame,
      dst: String,
      keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "applyCdfBatch needs declared key columns")
    import graft.txn.ChangeDataFeed._
    val b = batch
      .withColumn("op",
        when(col(TypeCol).isin(Delete, UpdatePre), "r")
          .when(col(TypeCol).isin(Insert, UpdatePost), "c"))
      .filter(col("op").isNotNull)
      .withColumn("commit_version", col(VersionCol))
      .drop(TypeCol, VersionCol, TimestampCol)
      .persist()
    try {
      if (b.isEmpty) return
      applyKeyed(spark, b, dst, keyCols,
        envelope = Seq("op", "commit_version"))
    } finally { b.unpersist(); () }
  }

  private def nextVersion(spark: SparkSession, dst: String): Long =
    new TxnLog(dst, spark.sessionState.newHadoopConf())
      .latestVersion().map(_ + 1).getOrElse(0L)

  private def applyKeyed(
      spark: SparkSession,
      b: DataFrame,
      dst: String,
      keyCols: Seq[String],
      envelope: Seq[String]): Unit = {
    // last op per key across the batch: commit_version ascending, and
    // within a version 'c' outranks 'r' (remove-then-insert = update)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("commit_version").desc,
        when(col("op") === "c", 2).otherwise(1).desc)
    val last = b.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // one DV delete of every touched key (an upsert's old copy and a
    // plain delete are the same operation under a key), then one append
    if (nextVersion(spark, dst) > 0L) {
      DeletionVectors.deleteMatching(spark, dst,
        b.select(keyCols.map(col): _*).distinct(), keyCols,
        version = nextVersion(spark, dst),
        commitTs = System.currentTimeMillis())
    }
    val ins = last.filter(col("op") === "c").drop(envelope: _*)
    if (!ins.isEmpty)
      TableWriter.write(spark, ins, dst,
        version = nextVersion(spark, dst),
        commitTs = System.currentTimeMillis())
  }

  private def applyFullRow(
      spark: SparkSession,
      b: DataFrame,
      dst: String,
      envelope: Seq[String]): Unit = {
    // bounded driver lists: versions in this batch, and which carry removes
    val versions = b.select(col("commit_version")).distinct()
      .collect().map(_.getLong(0)).sorted
    val withRemoves = b.filter(col("op").isin("r", "d"))
      .select(col("commit_version")).distinct()
      .collect().map(_.getLong(0)).toSet

    def flushInserts(run: Seq[Long]): Unit = if (run.nonEmpty) {
      val ins = b.filter(col("op") === "c" &&
        col("commit_version").isin(run: _*)).drop(envelope: _*)
      if (!ins.isEmpty)
        TableWriter.write(spark, ins, dst,
          version = nextVersion(spark, dst),
          commitTs = System.currentTimeMillis())
    }

    var pending = Vector.empty[Long]
    versions.foreach { v =>
      if (withRemoves.contains(v)) {
        // this version's removes reference the state before v: land
        // every earlier insert, then delete, then open a new run
        flushInserts(pending)
        pending = Vector.empty
        val dels = b.filter(col("op").isin("r", "d") &&
          col("commit_version") === v).drop(envelope: _*)
        DeletionVectors.deleteMatching(spark, dst, dels, dels.columns.toSeq,
          version = nextVersion(spark, dst),
          commitTs = System.currentTimeMillis())
      }
      pending :+= v
    }
    flushInserts(pending)
  }
}
