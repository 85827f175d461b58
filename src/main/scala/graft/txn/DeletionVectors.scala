package graft.txn

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Deletion vectors: row-level DELETE that never rewrites a data file —
  * the delete records WHICH rows died (by file + row position) in a small
  * sidecar, and every reader subtracts them. At 100 TB this is the
  * difference between "delete 1k rows = rewrite 1k × 1 GB files" and
  * "delete 1k rows = write one KB-scale sidecar"; compaction ([[purge]])
  * folds the vectors back into plain files asynchronously.
  *
  * Protocol: a table carrying DVs commits `Protocol(2, 2)` — engines that
  * don't understand the `dv` pointer (this engine before round 4) REFUSE
  * the table instead of silently resurrecting deleted rows.
  *
  * Layout: one DV directory per delete commit, `_dv/dv-<version>/`,
  * holding parquet rows `(file_name, row_index, deleted_at)`. The
  * affected `AddFile` re-commits with `dv` pointing at the directory;
  * a file deleted from twice gets a NEW directory holding the UNION of
  * its dead rows (pointers replace, never chain), with each row keeping
  * the version that first deleted it — which is exactly what CDC needs
  * to emit op='d' events per commit.
  *
  * Row identity is `_metadata.row_index` + `_metadata.file_name`: part
  * file names embed (version, ordinal) so they are unique per table, and
  * row_index is stable because data files are immutable.
  */
object DeletionVectors {

  /** Relative DV directory for a delete commit. */
  def dvDir(version: Long): String = f"_dv/dv-$version%020d"

  /** One read per vector dir, tagged `_dv_src` with the EXACT pointer
    * string the AddFile carries: pointers may be table-relative (own
    * deletes) or absolute (shallow-clone-imported source vectors), and
    * a clone can hold both a local `_dv/dv-N` and a source `/…/_dv/dv-N`
    * whose suffixes collide — tagging by pointer, not by a path regexp,
    * keys every validity join unambiguously. Sidecars are KB-scale; the
    * per-dir reads are metadata-cheap. The SHARED loader behind
    * [[dvRows]], [[SnapshotReader.statsCount]], and the CDC
    * DV-transition reader — pointer-resolution fixes land once.
    */
  private[graft] def readDvDirs(
      spark: SparkSession,
      tablePath: String,
      dirs: Seq[String]): DataFrame =
    dirs.map { d =>
      spark.read.parquet(TxnLog.dataPath(tablePath, d))
        .withColumn("_dv_src", lit(d))
    }.reduce(_ unionByName _)

  private def declaredSchema(snap: Snapshot): Option[StructType] =
    snap.metadata.map(m =>
      DataType.fromJson(m.schemaJson).asInstanceOf[StructType])

  /** The valid DV rows for `files` — (file_name, row_index, deleted_at),
    * honoring each file's CURRENT pointer (rows in superseded DV dirs for
    * the same file are ignored). Empty frame when no file carries a DV.
    */
  private def dvRows(
      spark: SparkSession,
      tablePath: String,
      files: Seq[AddFile]): Option[DataFrame] = {
    val withDv = files.filter(_.dv.isDefined)
    if (withDv.isEmpty) return None
    import spark.implicits._
    // (file_name → its current dv dir): the validity map. Small by
    // construction (one row per DV-carrying file) — broadcast.
    val pointer = withDv
      .map(f => (new Path(f.path).getName, f.dv.get)).toDF("file_name", "dv")
    val rows = readDvDirs(spark, tablePath, withDv.map(_.dv.get).distinct)
    Some(rows
      .join(broadcast(pointer),
        rows("file_name") === pointer("file_name") &&
          rows("_dv_src") === pointer("dv"))
      .select(rows("file_name").as("_dv_fn"), col("row_index").as("_dv_ri"),
        col("deleted_at")))
  }

  /** Dead-row count per DV-carrying file of `files` — `(file_name,
    * n_deleted)`, empty when no file carries a vector. Metadata-sized
    * work: only the KB-scale sidecars are read, never the data files —
    * this is what lets SHOW PARTITIONS-style row counts stay exact on a
    * DV table without scanning it.
    */
  def deletedPerFile(
      spark: SparkSession,
      tablePath: String,
      files: Seq[AddFile]): DataFrame = {
    import spark.implicits._
    dvRows(spark, tablePath, files) match {
      case Some(rows) =>
        rows.groupBy(col("_dv_fn").as("file_name"))
          .agg(count(lit(1)).as("n_deleted"))
          .select(col("file_name"), col("n_deleted"))
      case None =>
        Seq.empty[(String, Long)].toDF("file_name", "n_deleted")
    }
  }

  /** Read `files` of the table with deletion vectors applied. With
    * `withRowMeta`, the result keeps `_fn` (file name), `_ri` (row
    * index) and `_path` (normalized full path) columns — the handles the
    * delete/CDC machinery joins on.
    */
  def readFiles(
      spark: SparkSession,
      tablePath: String,
      files: Seq[AddFile],
      schema: Option[StructType],
      withRowMeta: Boolean = false,
      mapping: Map[String, String] = Map.empty): DataFrame = {
    require(files.nonEmpty, "readFiles needs at least one file")
    // Partition evolution: files written under DIFFERENT partition specs
    // (setPartitioning changes the layout of future writes only) cannot
    // share one hive-inference scan — Spark rejects mixed directory
    // depths. One scan PER SPEC (the spec is the partitionValues key
    // set; generations are few), unioned by name: a column that is
    // hive-encoded in one generation is plain data in another, so every
    // generation surfaces the same logical columns.
    // Shallow-clone imports live under the SOURCE root: hive partition
    // inference needs a basePath per PHYSICAL root, so external files
    // group by the root derived from their own path (parent minus one
    // hive segment per partition column — the source wrote the same
    // layout its log records). Local files keep tablePath. A clone that
    // appended locally after import thus scans as two generations of the
    // same spec, unioned by name — identical logical columns either way.
    def rootOf(f: AddFile): String =
      if (!TxnLog.isExternal(f.path)) tablePath
      else f.path.split('/').dropRight(f.partitionValues.size + 1)
        .mkString("/")
    def scanOne(group: Seq[AddFile], base: String): DataFrame = {
      val reader0 = spark.read.option("basePath", base)
      // Column mapping: the scan asks for PHYSICAL names (what the files
      // carry; logical names would resolve to nulls), then renames the
      // frame back to logical before anything downstream sees it.
      val reader = schema.fold(reader0)(s =>
        reader0.schema(ColumnMapping.physicalSchema(s, mapping)))
      reader.parquet(group.map(f => TxnLog.dataPath(tablePath, f.path)): _*)
    }
    def logical(df: DataFrame): DataFrame = ColumnMapping.toLogical(df, mapping)
    // `_metadata` resolves only against a scan relation, never through a
    // Union — so the per-group transform (logical rename + row-meta
    // columns) applies BEFORE generations merge.
    def scan(perGroup: DataFrame => DataFrame): DataFrame = files
      .groupBy(f => (f.partitionValues.keySet, rootOf(f))).toSeq
      .sortBy { case ((ks, root), _) =>
        (ks.toSeq.sorted.mkString(","), root) } // deterministic plan
      .map { case ((_, root), group) =>
        perGroup(logical(scanOne(group, root))) }
      .reduce(_ unionByName _)
    // DV-free fast path: a plain vectorized scan with zero added columns
    // (the common case must not pay for the feature)
    if (!withRowMeta && files.forall(_.dv.isEmpty))
      return scan(identity)
    val raw = scan(df => df
      .withColumn("_fn", col("_metadata.file_name"))
      .withColumn("_ri", col("_metadata.row_index"))
      .withColumn("_path",
        regexp_replace(col("_metadata.file_path"), "^file:/+", "/")))
    val live = dvRows(spark, tablePath, files) match {
      case None => raw
      case Some(dv) =>
        // dead rows are a sliver of the table; the join keys are the
        // (name, index) pair, so only row handles shuffle — and with a
        // small vector the anti-join broadcasts
        raw.join(dv.select(col("_dv_fn").as("_fn"), col("_dv_ri").as("_ri")),
          Seq("_fn", "_ri"), "left_anti")
    }
    if (withRowMeta) live else live.drop("_fn", "_ri", "_path")
  }

  /** Snapshot read with DVs applied (the [[SnapshotReader]] back end). */
  def readSnapshot(
      spark: SparkSession,
      tablePath: String,
      snap: Snapshot,
      withRowMeta: Boolean = false): DataFrame =
    readFiles(spark, tablePath, snap.files, declaredSchema(snap), withRowMeta,
      snap.metadata.map(_.columnMapping).getOrElse(Map.empty))

  /** Row-level DELETE WHERE via deletion vectors: no data file is
    * rewritten — matched row positions are written to a new DV directory
    * and the affected files re-commit with updated pointers.
    */
  def deleteWhere(
      spark: SparkSession,
      tablePath: String,
      pred: Column,
      version: Long,
      commitTs: Long): Unit =
    deleteRows(spark, tablePath, version, commitTs, live => live.filter(pred))

  /** Keyed DV delete — the CDC-apply shape: rows whose `keyCols` match
    * a row of `keys` are marked dead (left-semi join instead of a
    * predicate, so the delete side can be a full frame of arbitrary
    * size — no driver-side IN-list).
    *
    * Semantics are ALL COPIES per key: every live row matching a key is
    * deleted, and one delete row kills N duplicate copies — the correct
    * contract for keyed CDC replay (a key identifies ONE logical row)
    * and for full-row identity on duplicate-free tables. It is NOT a
    * multiplicity-preserving bag difference: replaying full-row CDC
    * onto a table holding duplicate copies of a row would delete all of
    * them. Callers needing bag semantics must carry an occurrence
    * discriminator in `keyCols`.
    */
  def deleteMatching(
      spark: SparkSession,
      tablePath: String,
      keys: DataFrame,
      keyCols: Seq[String],
      version: Long,
      commitTs: Long): Unit =
    deleteRows(spark, tablePath, version, commitTs,
      live => live.join(keys.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_semi"))

  /** Existing valid dead rows of `files` under their CURRENT pointers,
    * as (file_name, row_index, deleted_at) — what a new vector for the
    * same files must carry forward (pointers replace, never chain).
    * None when no file carries a vector.
    */
  private[graft] def carriedRows(
      spark: SparkSession,
      tablePath: String,
      files: Seq[AddFile]): Option[DataFrame] =
    dvRows(spark, tablePath, files.filter(_.dv.isDefined))
      .map(_.select(col("_dv_fn").as("file_name"),
        col("_dv_ri").as("row_index"), col("deleted_at")))

  /** Write `allRows` (file_name, row_index, deleted_at) as version
    * `version`'s deletion-vector directory (staged, then renamed into
    * place) and return the table-relative pointer the re-committed
    * AddFiles must carry. The caller folds the pointer into its OWN
    * commit; an uncommitted directory is invisible (vacuum sweeps it).
    */
  private[graft] def stageVector(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      allRows: DataFrame): String = {
    val conf = spark.sessionState.newHadoopConf()
    val rel = dvDir(version)
    val staging = new Path(tablePath, s".staging-dv-$version")
    val fs = staging.getFileSystem(conf)
    fs.delete(staging, true)
    allRows.write.mode("overwrite").parquet(staging.toString)
    val dest = new Path(tablePath, rel)
    fs.mkdirs(dest.getParent)
    fs.delete(dest, true)
    if (!fs.rename(staging, dest))
      throw new IllegalStateException(s"rename failed: $dest")
    rel
  }

  /** Drop an UNCOMMITTED staged vector dir (commit-retry cleanup). */
  private[graft] def dropVector(
      spark: SparkSession, tablePath: String, rel: String): Unit = {
    val p = new Path(tablePath, rel)
    try p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    catch { case _: Throwable => () }
  }

  private def deleteRows(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      commitTs: Long,
      mark: DataFrame => DataFrame): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    val snap = log.snapshotLatest()
    TxnLog.assertWritable(snap, tablePath)
    // the marker evaluates over the LIVE view (already-deleted rows
    // can't re-match — their deleted_at must keep the original version)
    // persisted: feeds the affected-file discovery, the vector write,
    // and (when the change feed is on) the delete change rows — without
    // it the marking scan runs three times. Cache the narrowest frame
    // every consumer can derive from: row handles in the common case,
    // full rows only when the feed needs them.
    val cdfOn = ChangeDataFeed.enabled(snap)
    val markedRaw = mark(readSnapshot(spark, tablePath, snap,
      withRowMeta = true))
    val cached = (if (cdfOn) markedRaw
      else markedRaw.select(col("_fn"), col("_ri"))).persist()
    val matched = cached
      .select(col("_fn").as("file_name"), col("_ri").as("row_index"),
        lit(version).as("deleted_at"))
    try {
    val affectedNames = matched.select("file_name").distinct()
      .collect().map(_.getString(0)).toSet // file names only, ≤ |files|
    if (affectedNames.isEmpty) {
      log.commit(version, Seq(CommitInfo("DELETE_DV", commitTs)))
      return
    }
    val affected = snap.files
      .filter(f => affectedNames.contains(new Path(f.path).getName))
    // union the affected files' EXISTING dead rows into the new vector
    // (pointers replace, never chain), keeping original deleted_at
    val carried = carriedRows(spark, tablePath, affected)
    val allRows = carried.fold(matched)(matched.unionByName(_))
    val rel = stageVector(spark, tablePath, version, allRows)

    val removes = affected.map(f =>
      RemoveFile(f.path, commitTs, f.partitionValues))
    val adds = affected.map(_.copy(
      modificationTime = commitTs, dataChange = true, dv = Some(rel)))
    val protocol: Seq[Action] =
      if (snap.protocol.exists(_.minReaderVersion >= 2)) Seq.empty
      else Seq(Protocol(2, 2))
    // Change data feed: the exact deleted rows, straight from the cached
    // marking scan (no second table read)
    val cdcActions: Seq[Action] =
      if (!cdfOn) Seq.empty
      else ChangeDataFeed.stage(spark,
        cached.drop("_fn", "_ri", "_path")
          .withColumn(ChangeDataFeed.TypeCol, lit(ChangeDataFeed.Delete)),
        tablePath, version, partitionColumns =
          snap.metadata.map(_.partitionColumns).getOrElse(Seq.empty))
    log.commit(version,
      protocol ++ removes ++ adds ++ cdcActions :+
        CommitInfo("DELETE_DV", commitTs))
    } finally cached.unpersist()
  }

  /** Fold every deletion vector back into plain files: DV-carrying files
    * rewrite without their dead rows as a REORGANIZATION commit
    * (dataChange=false — the logical table is unchanged, so CDC emits
    * nothing), clearing the pointers. The async-compaction half of the
    * DV design: deletes are cheap at write time, and purge restores
    * plain-reader speed (and v1-reader compatibility) off the hot path.
    */
  def purge(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      commitTs: Long): Seq[AddFile] = {
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(tablePath, conf)
    val snap = log.snapshotLatest()
    TxnLog.assertWritable(snap, tablePath)
    val doomed = snap.files.filter(_.dv.isDefined)
    if (doomed.isEmpty) return Seq.empty
    val partCols = snap.metadata.map(_.partitionColumns).getOrElse(Seq.empty)
    val live = readFiles(spark, tablePath, doomed, declaredSchema(snap))
    val adds = TableWriter.rewrite(spark, live, tablePath, partCols, version,
      commitTs, dataChange = false)
    val removes = doomed.map(f =>
      RemoveFile(f.path, commitTs, f.partitionValues, dataChange = false))
    log.commit(version, (removes ++ adds) :+ CommitInfo("PURGE_DV", commitTs))
    adds
  }
}
