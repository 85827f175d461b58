package graft.operators

import graft.txn.{AddFile, CommitInfo, RemoveFile, SnapshotReader, TableWriter, TxnLog}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history build from a versioned table: turn the table's
  * commit history into per-key validity intervals
  * (key, state, valid_from, valid_to) — valid_to NULL for the current
  * interval. The warehouse-dimension shape: "what did this key look
  * like, when".
  *
  * States are compared at per-KEY aggregate granularity (row count +
  * a caller-chosen cents-exact measure): the multiset view — row-level
  * comparison is ill-defined under duplicate keys, and integer cents
  * keep the comparison engine-exact.
  *
  * Scale: one scan per version (time travel), each reduced to per-key
  * aggregates BEFORE any join; key deletions surface through one
  * left-anti join per CONSECUTIVE version pair (tombstones), then a
  * single window partitioned by key orders ≤|versions| rows per key.
  * Never a versions × versions join. For tables with long histories,
  * bound `versions` to the range of interest.
  */
object Scd2 {

  /** Validity intervals for every key over `versions` (default: all).
    * Returns (keys..., n, cents, valid_from, valid_to) — one row per
    * interval, `valid_to` null while current. A deleted key's last
    * interval CLOSES at the version it vanished (and reopens if it
    * reappears).
    */
  def intervals(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      centsOf: Column,
      versions: Option[Seq[Long]] = None): DataFrame = {
    val log = new TxnLog(tablePath, spark.sessionState.newHadoopConf())
    val vs = versions.getOrElse(log.versions())
    require(vs.nonEmpty, s"no versions at $tablePath")
    val states = vs.map { v =>
      SnapshotReader.read(spark, tablePath, versionAsOf = Some(v))
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n"),
          sum(centsOf.cast("long")).as("cents"))
        .withColumn("version", lit(v))
    }
    // tombstones make ABSENCE explicit, so deletion closes an interval
    // and reappearance opens a fresh one — the window below never has to
    // reason about gaps
    val tombstones = vs.sliding(2).collect { case Seq(a, b) =>
      states(vs.indexOf(a)).select(keys.map(col): _*)
        .join(states(vs.indexOf(b)).select(keys.map(col): _*),
          keys, "left_anti")
        .withColumn("n", lit(null).cast("long"))
        .withColumn("cents", lit(null).cast("long"))
        .withColumn("version", lit(b))
    }.toSeq
    val all = (states ++ tombstones).reduce(_ unionByName _)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("version"))
    all
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
      .withColumn("is_first", lag(col("version"), 1).over(w).isNull)
      // null-safe compares: a transition to/from a tombstone is a change
      .filter(col("is_first") ||
        !(col("prev_n") <=> col("n")) ||
        !(col("prev_cents") <=> col("cents")))
      .withColumn("valid_from", col("version"))
      .withColumn("valid_to", lead(col("version"), 1).over(w))
      .filter(col("n").isNotNull) // absent-intervals are not output rows
      .select((keys.map(col) ++ Seq(col("n"), col("cents"),
        col("valid_from"), col("valid_to"))): _*)
  }

  /** Validity intervals built from the CHANGE DATA FEED instead of
    * per-version snapshot scans: one seed aggregate at `baseVersion`
    * plus the change rows after it. [[intervals]] re-aggregates the
    * WHOLE table once per version (N versions of a 100 TB table = N full
    * scans); this path costs one scan plus the changed rows — the same
    * economics [[graft.operators.MaterializedAgg.refreshFromCdf]] buys
    * the MV.
    *
    * Construction: state-opening events are the seed keys (at
    * `baseVersion`) and every insert/update_postimage group; closing
    * events are delete/update_preimage rows. An open interval at v
    * closes at the SMALLEST closing version > v for its key (updates
    * close-and-reopen at the same version, so the pre@v pairs with the
    * previous open and the post@v starts the next interval), and stays
    * current (valid_to null) when no later close exists. Requires the
    * feed to be exact over the range — DML commits must carry sidecars
    * (append-only commits infer fine) — and KEYS TO BE UNIQUE per
    * version (the dimension-table contract): a change event speaks for
    * its whole key here, so a delete of one copy of a duplicated key
    * would close the key's interval while other copies live on.
    * [[intervals]] (per-version aggregate states) remains the correct
    * tool for duplicate-key tables.
    */
  def intervalsFromCdf(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      centsOf: Column,
      baseVersion: Long): DataFrame = {
    import graft.txn.ChangeDataFeed
    import ChangeDataFeed.{TypeCol, VersionCol, Insert, UpdatePre, UpdatePost, Delete}
    val seed = SnapshotReader.read(spark, tablePath,
        versionAsOf = Some(baseVersion))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(centsOf.cast("long")).as("cents"))
      .withColumn("valid_from", lit(baseVersion))
    // ONE aggregate pass over the feed (emptyOk: "no changes since the
    // base" is a legitimate answer — every seed interval stays open).
    // Both the opens and closes branches derive from this aggregate; NOT
    // persisted (a returned-lazy frame can never unpersist safely, and
    // the old persist leaked cached blocks on every call). The branches
    // differ only by the `_open` filter, which Catalyst pushes below the
    // aggregate and into each sidecar scan (PushedFilters on
    // _change_type) — the two branches aggregate DISJOINT row sets, so
    // the combined work equals one unfiltered pass and nothing needs a
    // cache (Scd2Spec pins the pushed filters + no leaked blocks).
    val events = ChangeDataFeed
      .tableChanges(spark, tablePath, baseVersion + 1, emptyOk = true)
      .groupBy((keys.map(col) :+ col(VersionCol).as("_v") :+
        col(TypeCol).isin(Insert, UpdatePost).as("_open")): _*)
      .agg(count(lit(1)).as("n"), sum(centsOf.cast("long")).as("cents"))
    val opens = seed.unionByName(
      events.filter(col("_open"))
        .select((keys.map(col) ++ Seq(col("_v").as("valid_from"),
          col("n"), col("cents"))): _*))
    val closes = events.filter(!col("_open"))
      .select((keys.map(col) :+ col("_v").as("_close_v")): _*)
      .distinct()
    // valid_to = min closing version AFTER the open; both sides are
    // change-scale (keys that ever changed), so the range join is small
    // and the per-key close list is bounded by the key's change count
    opens.join(closes, keys.map(k => opens(k) <=> closes(k))
        .reduce(_ && _) && col("_close_v") > col("valid_from"), "left")
      .groupBy((keys.map(opens(_)) :+ col("valid_from") :+ col("n") :+
        col("cents")): _*)
      .agg(min(col("_close_v")).as("valid_to"))
      .select((keys.map(col) ++ Seq(col("n"), col("cents"),
        col("valid_from"), col("valid_to"))): _*)
  }

  // ------------------------------------------------------------------
  // Incremental maintenance: the intervals frame as a MAINTAINED graft
  // table. A refresh walks only the base versions since the watermark,
  // and each step's cost is proportional to that version's CHANGED KEYS
  // (one filtered per-key aggregate + one MERGE into the history), never
  // to the table or to the history — the dimension-table upkeep shape at
  // 100 TB. The watermark rides INSIDE each history commit's CommitInfo
  // (`base=<v>`), the same atomic trick as MaterializedAgg: state and
  // watermark cannot diverge across a crash.
  // ------------------------------------------------------------------

  private val BaseRe = """base=(\d+)""".r

  /** The base version the history reflects (from the newest commit).
    * Lazy newest-first scan: every history commit carries the marker,
    * so one commit file is read in steady state (history() would read
    * the whole log each call).
    */
  def refreshedThrough(spark: SparkSession, historyPath: String): Long = {
    val log = new TxnLog(historyPath, spark.sessionState.newHadoopConf())
    log.versions().reverseIterator.flatMap { v =>
      log.read(v).collectFirst {
        case c: CommitInfo
            if BaseRe.findFirstMatchIn(c.operation).isDefined =>
          BaseRe.findFirstMatchIn(c.operation).get.group(1).toLong
      }
    }.nextOption().getOrElse(throw new IllegalStateException(
      s"no SCD2 watermark in the log at $historyPath"))
  }

  /** Seed the history table with the FULL interval build over base
    * versions ≤ the current latest. Returns the recorded watermark.
    */
  def create(
      spark: SparkSession,
      basePath: String,
      historyPath: String,
      keys: Seq[String],
      centsOf: Column): Long = {
    val baseLog = new TxnLog(basePath, spark.sessionState.newHadoopConf())
    val baseV = baseLog.latestVersion().getOrElse(
      throw new IllegalArgumentException(s"empty base at $basePath"))
    val versions = baseLog.versions().filter(_ <= baseV)
    val hist = intervals(spark, basePath, keys, centsOf, Some(versions))
    TableWriter.write(spark, hist, historyPath, version = 0L,
      commitTs = System.currentTimeMillis(),
      operation = s"SCD2 CREATE base=$baseV")
    baseV
  }

  /** Advance the history over base versions (watermark, latest]. Each
    * ROW-EVENT version merges its changed keys' transitions (close /
    * open / tombstone-close) as one versioned commit; trailing event-free
    * versions (compaction etc.) advance the watermark metadata-only.
    */
  def refresh(
      spark: SparkSession,
      basePath: String,
      historyPath: String,
      keys: Seq[String],
      centsOf: Column): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val baseLog = new TxnLog(basePath, conf)
    val from = refreshedThrough(spark, historyPath)
    val latest = baseLog.latestVersion().getOrElse(0L)
    if (latest <= from) return from
    val histLog = new TxnLog(historyPath, conf)

    baseLog.changes(from + 1).filter(_._1 <= latest).foreach {
      case (v, actions) =>
        // keys POSSIBLY changed at v: every key in a dataChange-added or
        // -removed file (rewrites over-approximate; the state compare
        // below turns untouched keys into no-ops)
        val added = actions.collect {
          case a: AddFile if a.dataChange => a }
        val removedPaths = actions.collect {
          case r: RemoveFile if r.dataChange => r.path }.toSet
        if (added.isEmpty && removedPaths.isEmpty) {
          // compaction / metadata-only: watermark advance, no state write
          histLog.commit(histLog.snapshotLatest().version + 1,
            Seq(CommitInfo(s"SCD2 NOOP base=$v", System.currentTimeMillis())))
        } else {
          val snapPrev = baseLog.snapshot(v - 1)
          val removed = snapPrev.files.filter(f => removedPaths(f.path))
          // RAW rows (dv stripped): a key whose last rows died in this
          // version's deletion vector must still count as changed — the
          // over-approximation is what keeps key discovery sound
          val touched = (added ++ removed).map(_.copy(dv = None)).distinct
          val changedKeys = graft.txn.DeletionVectors
            .readFiles(spark, basePath, touched,
              snapPrev.metadata.map(m =>
                org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
                  .asInstanceOf[org.apache.spark.sql.types.StructType]))
            .select(keys.map(col): _*).distinct()
          val newState = SnapshotReader.read(spark, basePath,
              versionAsOf = Some(v))
            .join(changedKeys, keys, "left_semi")
            .groupBy(keys.map(col): _*)
            .agg(count(lit(1)).as("n"), sum(centsOf.cast("long")).as("cents"))
          val open = SnapshotReader.read(spark, historyPath)
            .filter(col("valid_to").isNull)
            .join(changedKeys, keys, "left_semi")
          // FULL outer per changed key: present-only → open; absent-only
          // → close (deletion); both-but-different → close + open
          val joined = open.as("o").join(newState.as("s"),
            keys.map(k => col(s"o.$k") <=> col(s"s.$k")).reduce(_ && _),
            "full_outer")
          val changed = joined.filter(
            !(col("o.n") <=> col("s.n")) || !(col("o.cents") <=> col("s.cents")))
          val closes = changed.filter(col("o.n").isNotNull).select(
            (keys.map(k => col(s"o.$k").as(k)) ++ Seq(col("o.n").as("n"),
              col("o.cents").as("cents"), col("o.valid_from").as("valid_from"),
              lit(v).cast("long").as("valid_to"))): _*)
          val opens = changed.filter(col("s.n").isNotNull).select(
            (keys.map(k => col(s"s.$k").as(k)) ++ Seq(col("s.n").as("n"),
              col("s.cents").as("cents"), lit(v).cast("long").as("valid_from"),
              lit(null).cast("long").as("valid_to"))): _*)
          val delta = closes.unionByName(opens)
          val histV = histLog.snapshotLatest().version + 1
          if (delta.isEmpty)
            histLog.commit(histV,
              Seq(CommitInfo(s"SCD2 NOOP base=$v", System.currentTimeMillis())))
          else
            TableWriter.mergeUpsert(spark, historyPath, delta,
              keyCols = keys :+ "valid_from", version = histV,
              commitTs = System.currentTimeMillis(),
              operation = s"SCD2 REFRESH base=$v")
        }
    }
    latest
  }
}
