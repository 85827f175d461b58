package graft.operators

import graft.txn.{CdcReader, CommitInfo, SnapshotReader, TableWriter, TxnLog}
import graft.txn.{AddFile, RemoveFile}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-view maintenance (IVM) for distributive
  * aggregates — grouped COUNT + SUM (AVG derives as sum/cnt at read time) —
  * over a graft table.
  *
  * The MV is itself a graft table: every refresh is a versioned commit, so
  * the view is time-travelable and its own CDC stream exists. A refresh
  * applies ONLY the CDC delta since the last refreshed base version: row
  * additions (op 'c') count +1, row removals (whole-file 'r' and
  * deletion-vector 'd') count −1, and the signed per-key delta aggregate
  * merges into the stored state with ONE outer join. The base table is
  * never re-aggregated — at 100 TB the refresh cost is proportional to the
  * CHANGED rows, not the table.
  *
  * Exactly-once accounting rests on three invariants:
  *  - The refreshed-through base version rides INSIDE the MV commit's
  *    CommitInfo (`base=<v>`), so state and watermark move atomically — a
  *    crash between "write state" and "record watermark" cannot exist, and
  *    the same delta can never be double-applied.
  *  - The delta is BOUNDED above by the base version read at refresh
  *    start (`commit_version <= latest`): a base commit landing mid-refresh
  *    is excluded now and picked up — exactly once — by the next refresh.
  *  - The merge join is NULL-SAFE (`<=>` per key, keys coalesced across
  *    sides): a NULL group key is one group, matching SQL GROUP BY, so the
  *    MV cannot accumulate duplicate NULL-key rows.
  *
  * An event-free range (compaction / VACUUM / Z-order commit only —
  * dataChange=false) advances the watermark with a metadata-only MV commit
  * instead of crashing or rewriting the state generation.
  *
  * Sums run in exact decimal (the engine's money convention, see
  * queries/Relational.scala) so additive maintenance cannot drift from a
  * from-scratch recompute: decimal addition is associative, float addition
  * is not.
  */
object MaterializedAgg {

  /** keys → GROUP BY columns; sums → columns maintained as exact-decimal
    * SUMs alongside the row count.
    */
  final case class Spec(keys: Seq[String], sums: Seq[String])

  private val SumType = DecimalType(25, 2)
  private def money(c: Column): Column = c.cast(DecimalType(15, 2))

  private val BaseRe = """base=(\d+)""".r
  private def opString(kind: String, baseVersion: Long) =
    s"$kind base=$baseVersion"

  /** The base-table version the MV state reflects — read back from the
    * newest MV commit's CommitInfo, the same atomic unit the state landed
    * in (no side file that can lag or lead the commit).
    */
  def refreshedThrough(spark: SparkSession, mvPath: String): Long = {
    val log = new TxnLog(mvPath, spark.sessionState.newHadoopConf())
    // lazy newest-first: every MV commit carries the marker, so this
    // reads ONE commit file in steady state — history() would read the
    // whole log, turning an N-batch stream into O(N²) driver log I/O
    log.versions().reverseIterator.flatMap { v =>
      log.read(v).collectFirst {
        case c: CommitInfo
            if BaseRe.findFirstMatchIn(c.operation).isDefined =>
          BaseRe.findFirstMatchIn(c.operation).get.group(1).toLong
      }
    }.nextOption().getOrElse(throw new IllegalStateException(
      s"no MV base watermark in the log at $mvPath"))
  }

  private def aggOf(df: DataFrame, spec: Spec, sign: Column): DataFrame = {
    val aggs = sum(sign).as("mv_cnt") +:
      spec.sums.map(c => sum(sign * money(col(c))).cast(SumType)
        .as(s"sum_$c"))
    df.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full aggregate of the base snapshot at `versionAsOf` → MV commit v0.
    * The base version is resolved BEFORE the snapshot read so the recorded
    * watermark can never trail a concurrently landing base commit.
    */
  def create(spark: SparkSession, basePath: String, mvPath: String,
      spec: Spec, versionAsOf: Option[Long] = None): Long = {
    val baseV = versionAsOf.getOrElse(
      new TxnLog(basePath, spark.sessionState.newHadoopConf())
        .latestVersion().getOrElse(0L))
    val base = SnapshotReader.read(spark, basePath, versionAsOf = Some(baseV))
    val mv = aggOf(base, spec, lit(1L))
    TableWriter.write(spark, mv, mvPath, version = 0L,
      commitTs = System.currentTimeMillis(),
      operation = opString("MV CREATE", baseV))
    baseV
  }

  /** True iff the base's commit range (from, latest] contains any CDC row
    * event — dataChange file adds/removes. Compaction-only and
    * schema-change-only ranges are event-free for IVM purposes (op='m'
    * carries no payload rows). Driver-side log walk: touches commit FILES
    * only, never data.
    */
  private def hasRowEvents(log: TxnLog, from: Long, latest: Long): Boolean =
    log.changes(from + 1).exists { case (v, actions) =>
      v <= latest && actions.exists {
        case a: AddFile    => a.dataChange
        case r: RemoveFile => r.dataChange
        case _             => false
      }
    }

  /** Apply the CDC delta (base's versions (refreshedThrough, latest]) to
    * the stored state. No-op when the base hasn't moved; watermark-only
    * commit when it moved without row events. Returns the new
    * refreshed-through version.
    */
  def refresh(spark: SparkSession, basePath: String, mvPath: String,
      spec: Spec): Long = {
    val from = refreshedThrough(spark, mvPath)
    val conf = spark.sessionState.newHadoopConf()
    val baseLog = new TxnLog(basePath, conf)
    val latest = baseLog.latestVersion().getOrElse(0L)
    if (latest <= from) return from

    val now = System.currentTimeMillis()
    val mvLog = new TxnLog(mvPath, conf)
    val mvSnap = mvLog.snapshotLatest()

    if (!hasRowEvents(baseLog, from, latest)) {
      // OPTIMIZE/VACUUM/schema-only range: the aggregate is unchanged —
      // advance the watermark atomically with a metadata-only commit so
      // the next refresh doesn't rewalk the same versions.
      mvLog.commit(mvSnap.version + 1,
        Seq(CommitInfo(opString("MV REFRESH", latest), now)))
      return latest
    }

    val delta = CdcReader.cdc(spark, basePath, startingVersion = from,
        includeHistory = false)
      .filter(col("op").isin("c", "r", "d")) // 'm' carries no rows
      // upper bound = the version read at refresh start: a base commit
      // landing mid-refresh stays OUT of this delta and is applied —
      // exactly once — by the refresh that records it
      .filter(col("commit_version") <= latest)
      .withColumn("_sign",
        when(col("op") === "c", lit(1L)).otherwise(lit(-1L)))
    applyDelta(spark, mvPath, mvSnap, spec, delta, latest, now)
    latest
  }

  /** [[refresh]] with the delta read from the CHANGE DATA FEED instead of
    * the file-level op envelope: +1 for insert/update_postimage, −1 for
    * delete/update_preimage. Identical state to [[refresh]] by
    * construction (the envelope's 'r'+'c' churn of a rewritten file
    * cancels its survivors; the feed never reads them at all) — but the
    * delta scan is proportional to the CHANGED ROWS, not the churned
    * files: a 1-row UPDATE in a 1 GB file costs a KB-scale sidecar read
    * here versus two full file scans through the envelope. Requires
    * `graft.enableChangeDataFeed` on the base for row-level DML commits
    * (deletion-vector transitions without it refuse, same as the feed).
    */
  def refreshFromCdf(spark: SparkSession, basePath: String, mvPath: String,
      spec: Spec): Long = {
    import graft.txn.ChangeDataFeed
    val from = refreshedThrough(spark, mvPath)
    val conf = spark.sessionState.newHadoopConf()
    val baseLog = new TxnLog(basePath, conf)
    val latest = baseLog.latestVersion().getOrElse(0L)
    if (latest <= from) return from
    val now = System.currentTimeMillis()
    val mvLog = new TxnLog(mvPath, conf)
    val mvSnap = mvLog.snapshotLatest()
    if (!hasRowEvents(baseLog, from, latest)) {
      mvLog.commit(mvSnap.version + 1,
        Seq(CommitInfo(opString("MV REFRESH", latest), now)))
      return latest
    }
    val delta = ChangeDataFeed
      .tableChanges(spark, basePath, from + 1, Some(latest))
      .withColumn("_sign",
        when(col(ChangeDataFeed.TypeCol).isin(
          ChangeDataFeed.Insert, ChangeDataFeed.UpdatePost), lit(1L))
          .otherwise(lit(-1L)))
    applyDelta(spark, mvPath, mvSnap, spec, delta, latest, now)
    latest
  }

  /** CONTINUOUSLY maintained MV: stream the base's change feed
    * ([[graft.sources.GraftCdf]]) and fold each micro-batch's signed
    * delta into the stored state — UPDATEs and DELETEs flow, not just
    * appends (the upsertAggregate sink's limitation). Exactly-once
    * across restarts comes from the MV's OWN base watermark (committed
    * atomically with every state generation): the delta keeps only
    * `_commit_version` > watermark, so a replayed batch (same
    * checkpoint, crash between MV commit and offset commit) nets an
    * empty delta and no commit, and a FRESH checkpoint simply
    * re-delivers already-applied versions that filter out — no
    * batch-id bookkeeping, nothing to go stale. The converse mismatch
    * (an OLD checkpoint whose offsets start past the MV watermark —
    * someone recreated the MV) cannot be filtered into correctness:
    * the batch's versions must extend the watermark contiguously, and
    * a gap REFUSES loudly instead of silently losing the middle.
    * Start the stream AFTER [[create]]; it picks up from the MV's
    * recorded base watermark.
    */
  def maintainFromCdfStream(
      spark: SparkSession,
      basePath: String,
      mvPath: String,
      spec: Spec,
      checkpointLocation: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.txn.ChangeDataFeed
    val from0 = refreshedThrough(spark, mvPath)
    spark.readStream.format("graft.sources.GraftCdf")
      .option("tablePath", basePath)
      .option("startingVersion", (from0 + 1).toString)
      .load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val conf = spark.sessionState.newHadoopConf()
        val mvLog = new TxnLog(mvPath, conf)
        val mvSnap = mvLog.snapshotLatest()
        val from = refreshedThrough(spark, mvPath)
        val delta = batch
          .withColumn("_sign",
            when(col(ChangeDataFeed.TypeCol).isin(
              ChangeDataFeed.Insert, ChangeDataFeed.UpdatePost), lit(1L))
              .otherwise(lit(-1L)))
          .persist()
        try {
          val bounds = delta
            .agg(min(col(ChangeDataFeed.VersionCol)),
              max(col(ChangeDataFeed.VersionCol))).head()
          if (!bounds.isNullAt(0)) {
            val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
            // contiguity: the batch must reach back to the watermark —
            // an old checkpoint against a recreated MV starts PAST it,
            // and the skipped middle would be lost forever. The watermark
            // only ever advances to the max ROW-BEARING version, so a
            // non-row-bearing base commit in between (OPTIMIZE, SET
            // TBLPROPERTIES) legitimately leaves lo > from + 1 — before
            // refusing, verify the gap actually carries row events
            // (bounded: reads only the gap's commit FILES, never data).
            if (lo > from + 1) {
              val baseLog = new TxnLog(basePath, conf)
              val gapHasRows = baseLog.changes(from + 1)
                .takeWhile(_._1 < lo)
                .exists { case (_, actions) => actions.exists {
                  case a: AddFile    => a.dataChange
                  case r: RemoveFile => r.dataChange
                  case _             => false
                } }
              require(!gapHasRows,
                s"streaming MV at $mvPath: batch starts at base version " +
                  s"$lo but the MV watermark is $from and versions in " +
                  "between carry data changes — the stream checkpoint " +
                  "does not extend this MV's state (recreate the MV or " +
                  "start a fresh checkpoint)")
            }
            if (hi > from) {
              val nowMs = System.currentTimeMillis()
              applyDelta(spark, mvPath, mvSnap, spec,
                delta.filter(col(ChangeDataFeed.VersionCol) > from),
                hi, nowMs)
            }
          }
        } finally { delta.unpersist(); () }
        ()
      }
      .start()
  }

  /** Merge a signed delta frame into the stored MV state (shared by the
    * envelope and change-feed refresh paths).
    */
  private def applyDelta(
      spark: SparkSession,
      mvPath: String,
      mvSnap: graft.txn.Snapshot,
      spec: Spec,
      delta: DataFrame,
      latest: Long,
      now: Long,
      extra: Seq[graft.txn.Action] = Seq.empty): Unit = {
    val dAgg = aggOf(delta, spec, col("_sign"))
      .withColumnRenamed("mv_cnt", "_d_cnt")
    val dRenamed = spec.sums.foldLeft(dAgg)((d, c) =>
      d.withColumnRenamed(s"sum_$c", s"_d_sum_$c"))

    val zero = lit(BigDecimal(0)).cast(SumType)
    val cur = SnapshotReader.read(spark, mvPath)
    // null-safe equality: a NULL group key is ONE group on both sides
    val joinCond = spec.keys.map(k => cur(k) <=> dRenamed(k)).reduce(_ && _)
    val merged = cur.join(dRenamed, joinCond, "full_outer")
      .select(spec.keys.map(k => coalesce(cur(k), dRenamed(k)).as(k)) ++
        Seq((coalesce(col("mv_cnt"), lit(0L)) +
          coalesce(col("_d_cnt"), lit(0L))).as("mv_cnt")) ++
        spec.sums.map(c =>
          (coalesce(col(s"sum_$c"), zero) + coalesce(col(s"_d_sum_$c"), zero))
            .cast(SumType).as(s"sum_$c")): _*)
      .filter(col("mv_cnt") > 0) // fully-dead groups leave the view
    // the refresh REPLACES the state: remove every current MV file in the
    // same commit the new aggregate lands in (snapshot isolation — a
    // reader sees exactly one generation); the watermark rides in the
    // commit's CommitInfo, atomic with the state it describes
    val removes = mvSnap.files.map(f =>
      RemoveFile(f.path, now, f.partitionValues))
    TableWriter.write(spark, merged, mvPath, version = mvSnap.version + 1,
      commitTs = now, operation = opString("MV REFRESH", latest),
      extraActions = removes ++ extra)
  }
}
