package graft.txn

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import java.nio.charset.StandardCharsets

/** Minimal Delta-style transaction log over any Hadoop filesystem
  * (file://, hdfs://, s3a:// — config comes from the Hadoop Configuration,
  * never from committed secrets; contrast reference core-site.xml:19–26).
  *
  * Layout: `<table>/_txn_log/%020d.json`, one commit per file, one JSON
  * action per line. Commits are atomic via write-temp + rename-if-absent,
  * which is the single-writer optimistic-concurrency protocol the
  * reference relies on delta-standalone for (DeltaReader.java:301–303).
  */
final class TxnLog(
    val tablePath: String,
    conf: Configuration,
    val checkpointInterval: Int = TxnLog.DefaultCheckpointInterval) {

  private implicit val formats: Formats = DefaultFormats

  private val logDir = new Path(tablePath, "_txn_log")
  private def fs: FileSystem = logDir.getFileSystem(conf)

  private def commitFile(v: Long): Path = new Path(logDir, f"$v%020d.json")
  private def checkpointFile(v: Long): Path =
    new Path(logDir, f"$v%020d.checkpoint.parquet")

  /** Commit-file reads since construction — observability hook for the
    * checkpoint spec (proves snapshot() reads checkpoint + tail, not the
    * whole log).
    */
  private[graft] var commitReads: Long = 0L

  /** All committed versions, ascending. */
  def versions(): Seq[Long] = {
    if (!fs.exists(logDir)) return Seq.empty
    fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .sorted
  }

  def latestVersion(): Option[Long] = versions().lastOption

  /** Atomically commit `actions` as version `v`. Fails if v exists.
    *
    * Mutual exclusion comes from `fs.create(dest, overwrite = false)`,
    * which fails-if-exists on local and HDFS filesystems (POSIX rename —
    * what a write-temp+rename protocol would rely on — silently
    * OVERWRITES on RawLocalFileSystem, so rename gives no exclusion
    * there). The full payload is written in one call before close; a
    * reader racing the close may observe a shorter file on local FS, the
    * same caveat Delta's LogStore documents per-filesystem. Object stores
    * without conditional-put need an external coordinator, as in Delta.
    */
  def commit(v: Long, actions: Seq[Action]): Unit = {
    fs.mkdirs(logDir)
    val out =
      try fs.create(commitFile(v), false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.io.IOException if fs.exists(commitFile(v)) =>
          throw new IllegalStateException(
            s"concurrent commit: version $v already exists at $tablePath")
      }
    try out.write(actions.map(a => Serialization.write(LogLine(a)))
      .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // Periodic parquet checkpoint (Delta's pre-checkpoint driver
    // bottleneck fix): snapshot resolution then reads one checkpoint +
    // ≤ interval tail commits instead of replaying the whole log.
    if (checkpointInterval > 0 && v > 0 && v % checkpointInterval == 0)
      writeCheckpoint(v)
  }

  /** Parse the actions of one commit, in file order. */
  def read(v: Long): Seq[Action] = {
    commitReads += 1
    val in = fs.open(commitFile(v))
    val text = try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 65536, false)
      bytes.toString("UTF-8")
    } finally in.close()
    text.split('\n').iterator.map(_.trim).filter(_.nonEmpty)
      .map(l => Serialization.read[LogLine](l).action).toSeq
  }

  /** Commit iterator from `fromVersion` (inclusive) — the engine's
    * equivalent of deltaLog.getChanges (DeltaReader.java:186–193), with
    * the version-skip defect (#7) fixed: every later version is returned.
    */
  def changes(fromVersion: Long): Iterator[(Long, Seq[Action])] =
    versions().iterator.filter(_ >= fromVersion).map(v => (v, read(v)))

  /** Committed checkpoint versions, ascending. */
  def checkpointVersions(): Seq[Long] = {
    if (!fs.exists(logDir)) return Seq.empty
    fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".checkpoint.parquet"))
      .map(_.stripSuffix(".checkpoint.parquet").toLong)
      .sorted
  }

  /** Write the live-file state at `v` as a parquet checkpoint: one row
    * per action (kind ∈ {add, meta}, json = the LogLine encoding), written
    * to a temp file then renamed in. Idempotent — re-writing the same
    * checkpoint is harmless.
    */
  def writeCheckpoint(v: Long): Unit = {
    val snap = snapshot(v)
    val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      "message checkpoint { required binary kind (UTF8); required binary json (UTF8); }")
    val tmp = new Path(logDir, f".$v%020d.checkpoint.parquet.tmp")
    fs.delete(tmp, false)
    val writeConf = new Configuration(conf)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, writeConf)
    val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(tmp, writeConf))
      .withConf(writeConf)
      .build()
    try {
      snap.metadata.foreach { m =>
        writer.write(factory.newGroup()
          .append("kind", "meta").append("json", Serialization.write(LogLine(m))))
      }
      snap.files.foreach { a =>
        writer.write(factory.newGroup()
          .append("kind", "add").append("json", Serialization.write(LogLine(a))))
      }
    } finally writer.close()
    if (!fs.rename(tmp, checkpointFile(v))) fs.delete(tmp, false) // lost benign race
  }

  /** Read a checkpoint back into (live files in original order, metadata). */
  private def readCheckpoint(v: Long): (Seq[AddFile], Option[Metadata]) = {
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), checkpointFile(v))
      .withConf(conf)
      .build()
    val files = scala.collection.mutable.ArrayBuffer.empty[AddFile]
    var meta: Option[Metadata] = None
    try {
      var g = reader.read()
      while (g != null) {
        val action = Serialization.read[LogLine](g.getString("json", 0)).action
        action match {
          case a: AddFile  => files += a
          case m: Metadata => meta = Some(m)
          case _           => ()
        }
        g = reader.read()
      }
    } finally reader.close()
    (files.toSeq, meta)
  }

  /** Replay the log up to `asOf` (inclusive) into the live-file state,
    * starting from the newest checkpoint ≤ asOf when one exists — the
    * driver then reads ≤ checkpointInterval+1 commit files regardless of
    * log length.
    */
  def snapshot(asOf: Long): Snapshot = {
    val vs = versions().filter(_ <= asOf)
    if (vs.isEmpty)
      throw new IllegalArgumentException(
        s"version $asOf does not exist in $tablePath (earliest: " +
          s"${versions().headOption.getOrElse("<empty log>")})")
    val cp = checkpointVersions().filter(_ <= asOf).lastOption
    var files = scala.collection.immutable.ListMap.empty[String, AddFile]
    var meta: Option[Metadata] = None
    cp.foreach { cv =>
      val (cpFiles, cpMeta) = readCheckpoint(cv)
      files = scala.collection.immutable.ListMap(cpFiles.map(a => a.path -> a): _*)
      meta = cpMeta
    }
    vs.filter(v => cp.forall(v > _)).foreach { v =>
      read(v).foreach {
        case a: AddFile    => files += (a.path -> a)
        case r: RemoveFile => files -= r.path
        case m: Metadata   => meta = Some(m)
        case _: CommitInfo => ()
      }
    }
    Snapshot(vs.last, files.values.toSeq, meta)
  }

  /** Latest snapshot; fails on an empty log (strict, per SURVEY §7.1 —
    * the reference's silent fallback-to-latest was defect-adjacent).
    */
  def snapshotLatest(): Snapshot =
    snapshot(latestVersion().getOrElse(
      throw new IllegalArgumentException(s"empty table at $tablePath")))

  /** Timestamp-as-of resolution: greatest version whose CommitInfo
    * timestamp ≤ ts (reference intent: DeltaReader.java:134–146, made
    * strict: no silent fallback).
    */
  def versionAtTimestamp(ts: Long): Long = {
    val stamped = versions().flatMap { v =>
      read(v).collectFirst { case c: CommitInfo => (v, c.timestamp) }
    }
    stamped.filter(_._2 <= ts).map(_._1).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"no commit at or before timestamp $ts in $tablePath"))
  }
}

object TxnLog {
  /** Checkpoint every N commits (Delta defaults to 10; same trade-off:
    * tail replay ≤ N commit files, checkpoint write amortized over N).
    */
  val DefaultCheckpointInterval = 10
}

/** Live state of the table at a version. */
final case class Snapshot(
    version: Long,
    files: Seq[AddFile],
    metadata: Option[Metadata]) {
  def filePaths(tablePath: String): Seq[String] =
    files.map(f => s"$tablePath/${f.path}")
}
