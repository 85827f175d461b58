package graft.txn

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change Data Feed (the Delta CDF idea): row-level change records per
  * commit, with exact UPDATE pre/post-images.
  *
  * The reference's CDC envelope (SURVEY §1.4; DeltaRecord.java:75–99)
  * reconstructs changes from file-level add/remove events, so a
  * copy-on-write UPDATE surfaces as "whole file removed + whole file
  * added" — survivors included. CDF closes that gap: when the table
  * property [[ChangeDataFeed.Prop]] is true, every DML path (MERGE /
  * UPDATE / DELETE, copy-on-write and deletion-vector alike) writes the
  * EXACT changed rows to `_change_data/` sidecars committed atomically
  * with the data (as [[CdcFile]] actions), and [[tableChanges]] serves
  * them back with `_change_type` ∈ {insert, update_preimage,
  * update_postimage, delete} plus `_commit_version` / `_commit_timestamp`.
  *
  * Commits WITHOUT change files stay readable by inference, exactly like
  * Delta: dataChange AddFiles read as inserts, dataChange RemoveFiles read
  * as deletes (of their rows live as of the PRIOR version — earlier DV
  * kills must not resurrect as delete events here). Inference refuses a
  * commit that re-adds a path it removes (a DV transition written with
  * CDF off): inferring there would double-count the file's surviving rows
  * as delete+insert while only a sliver changed.
  *
  * Scale shape: change files are proportional to the CHANGED rows, never
  * the table — a 100-row MERGE into a 100 TB table writes KB-scale
  * sidecars. Reads are one distributed parquet scan per commit group; no
  * driver-side row material ever.
  */
object ChangeDataFeed {

  /** Table property that turns on change-data capture for DML commits. */
  val Prop = "graft.enableChangeDataFeed"

  val TypeCol = "_change_type"
  val VersionCol = "_commit_version"
  val TimestampCol = "_commit_timestamp"

  val Insert = "insert"
  val UpdatePre = "update_preimage"
  val UpdatePost = "update_postimage"
  val Delete = "delete"

  /** Is CDF on for this snapshot? DML paths consult this at their write
    * snapshot, so enabling the property captures every LATER commit.
    */
  def enabled(snap: Snapshot): Boolean =
    snap.metadata.exists(_.properties.get(Prop).exists(_.equalsIgnoreCase("true")))

  /** Stage `changes` (table columns + [[TypeCol]]) as parquet under
    * `_change_data/` and return the [[CdcFile]] actions the caller must
    * fold into the SAME commit as the data it describes. Partition
    * columns ride INSIDE the files as regular columns — change files
    * answer "what changed", never "where does this row live", so hive
    * routing would buy nothing and cost a directory walk at read.
    */
  def stage(
      spark: SparkSession,
      changes: DataFrame,
      tablePath: String,
      version: Long): Seq[CdcFile] = {
    require(changes.columns.contains(TypeCol),
      s"change frame must carry $TypeCol")
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    val attemptId = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(tablePath, s".staging-cdc-$version-$attemptId")
    fs.delete(staging, true)
    changes.write.mode("overwrite").parquet(staging.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[CdcFile]
    fs.listStatus(staging).foreach { st =>
      if (st.getPath.getName.endsWith(".parquet")) {
        val destRel =
          f"_change_data/cd-$version%020d-${out.size}%05d-$attemptId.parquet"
        val dest = new Path(table, destRel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(st.getPath, dest))
          throw new IllegalStateException(s"rename failed: $dest")
        out += CdcFile(destRel, Map.empty, st.getLen)
      }
    }
    fs.delete(staging, true)
    out.toSeq
  }

  /** Timestamp-bounded feed (Delta's startingTimestamp/endingTimestamp):
    * start resolves to the FIRST commit at-or-after `startMillis`, end to
    * the LAST commit at-or-before `endMillis` (both strict — an empty
    * window errors rather than silently serving a neighboring range).
    * Commit timestamps are caller-supplied wall clocks, so resolution
    * clamps each to the running max of its predecessors (the expireLog
    * rule): one skewed clock can widen the window, never lose commits.
    */
  def tableChangesByTime(
      spark: SparkSession,
      tablePath: String,
      startMillis: Long,
      endMillis: Option[Long] = None): DataFrame = {
    val log = new TxnLog(tablePath, spark.sessionState.newHadoopConf())
    var runMax = Long.MinValue
    val stamped = log.versions().map { v =>
      val ts = log.read(v)
        .collectFirst { case c: CommitInfo => c.timestamp }
        .getOrElse(Long.MinValue)
      runMax = math.max(runMax, ts)
      (v, runMax)
    }
    val sv = stamped.find(_._2 >= startMillis).map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"no commit at or after timestamp $startMillis in $tablePath"))
    val ev = endMillis.map { t =>
      stamped.takeWhile(_._2 <= t).lastOption.map(_._1).getOrElse(
        throw new IllegalArgumentException(
          s"no commit at or before timestamp $t in $tablePath"))
    }
    tableChanges(spark, tablePath, sv, ev)
  }

  /** The change feed over versions [startingVersion, endingVersion]
    * (inclusive; endingVersion defaults to latest): table columns under
    * the writing commit's logical names, plus [[TypeCol]], [[VersionCol]],
    * [[TimestampCol]]. Schema evolution across the range unions by name —
    * pre-evolution change rows surface later columns as null, the q112
    * read-side contract.
    */
  def tableChanges(
      spark: SparkSession,
      tablePath: String,
      startingVersion: Long,
      endingVersion: Option[Long] = None): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    val end = endingVersion.getOrElse(log.latestVersion().getOrElse(
      throw new IllegalArgumentException(s"empty table at $tablePath")))
    val versions = log.versions().filter(v => v >= startingVersion && v <= end)
    require(versions.nonEmpty,
      s"no versions in [$startingVersion, $end] at $tablePath " +
        "(expired by log retention?)")
    val frames = versions.flatMap { v =>
      val actions = log.read(v)
      val ts = actions.collectFirst { case c: CommitInfo => c.timestamp }
        .getOrElse(0L)
      def stamp(df: DataFrame, kind: Option[String]): DataFrame = {
        val typed = kind.fold(df)(k => df.withColumn(TypeCol, lit(k)))
        typed.withColumn(VersionCol, lit(v))
          .withColumn(TimestampCol, lit(ts))
      }
      val cdcFiles = actions.collect { case c: CdcFile => c }
      if (cdcFiles.nonEmpty) {
        // exact change rows, written by the commit itself
        Seq(stamp(spark.read.parquet(
          cdcFiles.map(c => TxnLog.dataPath(tablePath, c.path)): _*), None))
      } else {
        val adds = actions.collect { case a: AddFile if a.dataChange => a }
        val removes = actions.collect {
          case r: RemoveFile if r.dataChange => r }
        val readded = adds.map(_.path).toSet intersect removes.map(_.path).toSet
        require(readded.isEmpty,
          s"version $v of $tablePath re-adds ${readded.size} file(s) it " +
            s"removes (a deletion-vector transition) without change data — " +
            s"set TBLPROPERTIES ('$Prop'='true') before row-level DML to " +
            "read it through the change feed")
        // inference (the Delta rule): adds are inserts; removes are
        // deletes of the file's rows LIVE at v-1 (its DV then applied —
        // rows an earlier commit killed already fed that commit's feed)
        val snapPrev = if (removes.nonEmpty) Some(log.snapshot(v - 1)) else None
        val insertRows =
          if (adds.isEmpty) None
          else {
            val snap = log.snapshot(v)
            Some(stamp(DeletionVectors.readFiles(spark, tablePath, adds,
              snap.metadata.map(m =>
                org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
                  .asInstanceOf[org.apache.spark.sql.types.StructType]),
              withRowMeta = false,
              // inserts must surface the ADDED bytes only, DV-free by
              // construction (a brand-new file carries no vector)
              mapping = snap.metadata.map(_.columnMapping)
                .getOrElse(Map.empty)), Some(Insert)))
          }
        val deleteRows = snapPrev.flatMap { prev =>
          val prevByPath = prev.files.map(f => f.path -> f).toMap
          val doomed = removes.flatMap(r => prevByPath.get(r.path))
          if (doomed.isEmpty) None
          else Some(stamp(DeletionVectors.readFiles(spark, tablePath, doomed,
            prev.metadata.map(m =>
              org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
                .asInstanceOf[org.apache.spark.sql.types.StructType]),
            withRowMeta = false,
            mapping = prev.metadata.map(_.columnMapping)
              .getOrElse(Map.empty)), Some(Delete)))
        }
        insertRows.toSeq ++ deleteRows.toSeq
      }
    }
    require(frames.nonEmpty,
      s"no data-changing commits in [$startingVersion, $end] at $tablePath")
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
