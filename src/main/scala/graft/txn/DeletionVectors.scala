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

  /** Sidecar encodings. Vectors written since round 12 are ROARING
    * BITMAPS: one parquet row per (file_name, deleted_at) pair holding
    * the dead positions as a serialized Roaring64Bitmap plus its
    * cardinality — a 10⁸-row delete is one compressed-bitmap row, not
    * 10⁸ parquet rows, and readers hold ONE bitmap per file (bounded
    * memory) instead of a hash set of boxed longs. Row-granular
    * `deleted_at` survives exactly where the CDC needs it: per-version
    * bitmaps, since a row's kill version keys the op='d' replay.
    * LEGACY dirs (rounds 4–11: one row per dead row) read forever —
    * format is detected per directory from the parquet schema.
    */
  private[graft] def serializeBitmap(
      bm: org.roaringbitmap.longlong.Roaring64Bitmap): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bm.serialize(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }

  private[graft] def deserializeBitmap(
      bytes: Array[Byte]): org.roaringbitmap.longlong.Roaring64Bitmap = {
    val bm = new org.roaringbitmap.longlong.Roaring64Bitmap()
    bm.deserialize(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    bm
  }

  /** One read per vector dir NORMALIZED to the bitmap shape
    * `(file_name, deleted_at, n_rows, bitmap, _dv_src)` — legacy
    * row-per-dead-row dirs surface n_rows=1 and a null bitmap with
    * their row_index kept aside; `_dv_src` carries the EXACT pointer
    * string the AddFile holds: pointers may be table-relative (own
    * deletes) or absolute (shallow-clone-imported source vectors), and
    * a clone can hold both a local `_dv/dv-N` and a source `/…/_dv/dv-N`
    * whose suffixes collide — tagging by pointer, not by a path regexp,
    * keys every validity join unambiguously.
    */
  private def readDvDirsRaw(
      spark: SparkSession,
      tablePath: String,
      dirs: Seq[String]): DataFrame =
    dirs.map { d =>
      val raw = spark.read.parquet(TxnLog.dataPath(tablePath, d))
      val norm =
        if (raw.columns.contains("bitmap"))
          raw.select(col("file_name"), col("deleted_at"), col("n_rows"),
            col("bitmap"), lit(null).cast("long").as("row_index"))
        else
          raw.select(col("file_name"), col("deleted_at"),
            lit(1L).as("n_rows"),
            lit(null).cast("binary").as("bitmap"), col("row_index"))
      norm.withColumn("_dv_src", lit(d))
    }.reduce(_ unionByName _)

  /** The ROW-EXPANDED view `(file_name, row_index, deleted_at,
    * _dv_src)` of the given vector dirs — bitmap rows unpack through a
    * LAZY iterator (flatMap never materializes a whole dead set), so a
    * wide vector streams. The SHARED loader behind [[dvRows]],
    * [[SnapshotReader.statsCount]], and the CDC DV-transition reader —
    * pointer-resolution fixes land once.
    */
  private[graft] def readDvDirs(
      spark: SparkSession,
      tablePath: String,
      dirs: Seq[String]): DataFrame = {
    import spark.implicits._
    val raw = readDvDirsRaw(spark, tablePath, dirs)
    val legacy = raw.filter(col("bitmap").isNull)
      .select(col("file_name"), col("row_index"), col("deleted_at"),
        col("_dv_src"))
    val packed = raw.filter(col("bitmap").isNotNull)
      .select(col("file_name"), col("deleted_at"), col("bitmap"),
        col("_dv_src"))
      .as[(String, Long, Array[Byte], String)]
      .flatMap { case (f, d, b, src) =>
        val it = deserializeBitmap(b).getLongIterator
        new Iterator[(String, Long, Long, String)] {
          override def hasNext: Boolean = it.hasNext
          override def next(): (String, Long, Long, String) =
            (f, it.next(), d, src)
        }
      }
      .toDF("file_name", "row_index", "deleted_at", "_dv_src")
    legacy.unionByName(packed)
  }

  /** EXECUTOR-side sidecar fold (plain parquet-mr, no SparkSession):
    * the dead positions of `fileName` across every part of `dvDirPath`,
    * restricted to kill versions passing `keep`. Returns ONE
    * Roaring64Bitmap — the streaming/batch readers' bounded-memory
    * application path: a 10⁸-row vector folds as compressed bitmap ORs,
    * never a hash set of boxed longs. Handles both encodings.
    */
  private[graft] def deadPositions(
      dvDirPath: String,
      conf: org.apache.hadoop.conf.Configuration,
      fileName: String,
      keep: Long => Boolean = _ => true)
      : org.roaringbitmap.longlong.Roaring64Bitmap = {
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val out = new org.roaringbitmap.longlong.Roaring64Bitmap()
    val dir = new Path(dvDirPath)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        val r = ParquetReader.builder(new GroupReadSupport(), st.getPath)
          .withConf(conf).build()
        try {
          var g = r.read()
          while (g != null) {
            val t = g.getType
            if (g.getString(t.getFieldIndex("file_name"), 0) == fileName &&
                keep(g.getLong(t.getFieldIndex("deleted_at"), 0))) {
              if (t.containsField("bitmap"))
                out.or(deserializeBitmap(
                  g.getBinary(t.getFieldIndex("bitmap"), 0).getBytes))
              else out.addLong(g.getLong(t.getFieldIndex("row_index"), 0))
            }
            g = r.read()
          }
        } finally r.close()
      }
    out
  }

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
    val withDv = files.filter(_.dv.isDefined)
    if (withDv.isEmpty)
      return Seq.empty[(String, Long)].toDF("file_name", "n_deleted")
    // counts come straight from the sidecars' n_rows (bitmap rows carry
    // their cardinality; legacy rows normalize to 1) — a wide vector is
    // never expanded just to be counted
    val pointer = withDv
      .map(f => (new Path(f.path).getName, f.dv.get)).toDF("file_name", "dv")
    val raw = readDvDirsRaw(spark, tablePath, withDv.map(_.dv.get).distinct)
    raw.join(broadcast(pointer),
        raw("file_name") === pointer("file_name") &&
          raw("_dv_src") === pointer("dv"))
      .groupBy(raw("file_name").as("file_name"))
      .agg(sum(col("n_rows")).as("n_deleted"))
      .select(col("file_name"), col("n_deleted"))
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
    * commit; an uncommitted directory is invisible (vacuum's stale-
    * staging sweep reclaims crashed leftovers).
    *
    * The directory name carries an ATTEMPT-UNIQUE suffix: two writers
    * racing on the same target version would otherwise stage and
    * rename onto the SAME `_dv/dv-N` path — the loser's rename (or its
    * conflict-cleanup delete) clobbering the WINNER's just-committed
    * vector, resurrecting its deleted rows. Pointer strings are
    * opaque to every reader, so uniqueness is free.
    */
  private[graft] def stageVector(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      allRows: DataFrame): String = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val rel = s"${dvDir(version)}-$attempt"
    val staging = new Path(tablePath, s".staging-dv-$version-$attempt")
    val fs = staging.getFileSystem(conf)
    fs.delete(staging, true)
    // pack to the bitmap encoding: one row per (file, kill version),
    // positions as a Roaring64Bitmap — the shuffle moves row handles
    // (exactly what the legacy write moved) but what lands on disk is
    // compressed-bitmap-sized, and each group folds through ONE bitmap
    val packed = allRows
      .select(col("file_name").cast("string"),
        col("row_index").cast("long"), col("deleted_at").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(t => (t._1, t._3))
      .mapGroups { (key: (String, Long), it: Iterator[(String, Long, Long)]) =>
        val bm = new org.roaringbitmap.longlong.Roaring64Bitmap()
        it.foreach(t => bm.addLong(t._2))
        (key._1, key._2, bm.getLongCardinality, serializeBitmap(bm))
      }
      .toDF("file_name", "deleted_at", "n_rows", "bitmap")
    packed.write.mode("overwrite").parquet(staging.toString)
    val dest = new Path(tablePath, rel)
    fs.mkdirs(dest.getParent)
    // attempt-unique name: the destination cannot pre-exist, so no
    // delete-before-rename — a clobber here would be a UUID collision
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
