package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Table-maintenance operations: OPTIMIZE-style compaction (invisible to
  * CDC), VACUUM (storage reclaim past the retention horizon), and
  * stats-based file skipping.
  */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  test("compaction bin-packs partitions without emitting CDC events") {
    val table = freshTable("compact")
    val li = Tables.load(spark, sf, "lineitem").limit(600)
    // three commits -> >=3 files per l_returnflag partition
    TableWriter.write(spark, li.limit(200), table,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    TableWriter.write(spark, li.limit(400).except(li.limit(200)), table,
      partitionBy = Seq("l_returnflag"), version = 1L, commitTs = 2000L)
    TableWriter.write(spark, li.limit(600).except(li.limit(400)), table,
      partitionBy = Seq("l_returnflag"), version = 2L, commitTs = 3000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val before = log.snapshotLatest()
    assert(before.files.groupBy(_.partitionValues).values.exists(_.size > 1))
    val cdcBefore = CdcReader.cdc(spark, table).groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rowsBefore = SnapshotReader.read(spark, table).count()

    val adds = TableWriter.compact(spark, table, version = 3L, commitTs = 4000L)
    assert(adds.nonEmpty && adds.forall(!_.dataChange))

    val after = log.snapshotLatest()
    // one file per partition, same rows, same data
    assert(after.files.groupBy(_.partitionValues).values.forall(_.size == 1))
    assert(SnapshotReader.read(spark, table).count() == rowsBefore)
    // CDC replay is UNCHANGED: the reorganization emitted no events and
    // the snapshot phase replays logical content, not physical layout
    val cdcAfter = CdcReader.cdc(spark, table).groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cdcAfter == cdcBefore, s"$cdcBefore -> $cdcAfter")
    // time travel to the pre-compaction version still sees the old layout
    assert(SnapshotReader.read(spark, table, versionAsOf = Some(2L)).count()
      == rowsBefore)
  }

  test("the DSv2 stream emits nothing for a compaction commit") {
    val table = freshTable("compact_stream")
    val li = Tables.load(spark, sf, "lineitem").limit(200)
    TableWriter.write(spark, li.limit(100), table,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    TableWriter.write(spark, li.limit(200).except(li.limit(100)), table,
      partitionBy = Seq("l_returnflag"), version = 1L, commitTs = 2000L)
    TableWriter.compact(spark, table, version = 2L, commitTs = 3000L)
    val q = spark.readStream.format("graft.sources.GraftCdc")
      .option("tablePath", table)
      .option("startingVersion", "0")
      .option("includeHistory", "false") // incremental only: v1 + v2
      .load()
      .writeStream.outputMode("append")
      .format("memory").queryName("compact_stream_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("compact_stream_out")
    assert(out.filter(col("commit_version") === 2).count() == 0,
      "compaction commit must contribute zero stream rows")
    assert(out.filter(col("commit_version") === 1).count() == 100)
  }

  test("vacuum sweeps orphaned files from crashed writers") {
    val table = freshTable("vac_orphan")
    val li = Tables.load(spark, sf, "lineitem").limit(100)
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    // simulate a crashed writer: a data file on disk with no commit
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(table, "part-99999-00000.parquet")
    li.limit(5).coalesce(1).write.mode("overwrite")
      .parquet(table + "/.orphan_stage")
    val staged = fs.listStatus(new org.apache.hadoop.fs.Path(table + "/.orphan_stage"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(staged, orphan)
    fs.delete(new org.apache.hadoop.fs.Path(table + "/.orphan_stage"), true)
    assert(fs.exists(orphan))
    // inside retention: the orphan is safe (could be an in-flight write)
    val now = System.currentTimeMillis() + 1000
    assert(TableWriter.vacuum(spark, table,
      retainMillis = 3600 * 1000L, nowMillis = now).isEmpty)
    // past retention: swept; committed live files untouched
    val swept = TableWriter.vacuum(spark, table,
      retainMillis = 0L, nowMillis = now)
    assert(swept == Seq("part-99999-00000.parquet"), s"swept $swept")
    assert(!fs.exists(orphan))
    assert(SnapshotReader.read(spark, table).count() == 100)
  }

  test("vacuum from a CHECKPOINTED log retains recently-removed files: " +
      "tombstones ride the checkpoint, not a full log replay") {
    val table = freshTable("vac_tomb")
    val li = Tables.load(spark, sf, "lineitem").limit(200)
    val now = System.currentTimeMillis()
    TableWriter.write(spark, li, table, partitionBy = Seq("l_returnflag"),
      version = 0L, commitTs = now - 100000L)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // age every data file far past any horizon: the orphan mtime rule
    // alone would sweep them — only the log can prove they're retained
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val old = now - 10L * 24 * 3600 * 1000
    log.snapshotLatest().files.foreach(f => fs.setTimes(
      new org.apache.hadoop.fs.Path(table, f.path), old, old))
    val removed = TableWriter.removeWhere(spark, table,
      pv => pv.get("l_returnflag").contains("R"), version = 1L,
      commitTs = now - 1000L) // removed RECENTLY
    assert(removed.nonEmpty)
    log.writeCheckpoint(1L)
    // retention 1h: removal is in-window -> the tombstone in the
    // checkpoint must protect the aged files from the orphan sweep
    assert(TableWriter.vacuum(spark, table,
      retainMillis = 3600 * 1000L, nowMillis = now).isEmpty)
    removed.foreach(r => assert(
      fs.exists(new org.apache.hadoop.fs.Path(table, r.path)),
      "recently-removed file must survive a checkpoint-based vacuum"))
    // retention 0: the tombstone's timestamp passes the horizon -> gone
    val swept = TableWriter.vacuum(spark, table,
      retainMillis = 0L, nowMillis = now)
    assert(swept.sorted == removed.map(_.path).sorted, s"swept $swept")
  }

  test("a PRE-FEATURE checkpoint (no tombstone marker) is NOT trusted: " +
      "vacuum falls back to full replay and keeps in-retention removals") {
    val table = freshTable("vac_prefeature")
    val li = Tables.load(spark, sf, "lineitem").limit(150)
    val now = System.currentTimeMillis()
    TableWriter.write(spark, li, table, partitionBy = Seq("l_returnflag"),
      version = 0L, commitTs = now - 100000L)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(table).getFileSystem(conf)
    val log = new TxnLog(table, conf)
    val old = now - 10L * 24 * 3600 * 1000
    log.snapshotLatest().files.foreach(f => fs.setTimes(
      new org.apache.hadoop.fs.Path(table, f.path), old, old))
    val removed = TableWriter.removeWhere(spark, table,
      pv => pv.get("l_returnflag").contains("R"), version = 1L,
      commitTs = now - 1000L)
    log.writeCheckpoint(1L)
    // simulate an r12-era checkpoint: strip the marker + tombstones
    val cpFile = new org.apache.hadoop.fs.Path(table,
      f"_txn_log/${1L}%020d.checkpoint.parquet")
    val stripped = spark.read.parquet(cpFile.toString)
      .filter(!col("kind").isin("remove", "cdc", "tombstones"))
    val tmp = new org.apache.hadoop.fs.Path(table, ".cp_strip")
    stripped.coalesce(1).write.parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.delete(cpFile, false)
    assert(fs.rename(part, cpFile))
    fs.delete(tmp, true)
    // recently-removed + anciently-written: only a full replay knows
    // the removal is in-retention — trusting the stripped checkpoint
    // would orphan-sweep it
    assert(TableWriter.vacuum(spark, table,
      retainMillis = 3600 * 1000L, nowMillis = now).isEmpty)
    removed.foreach(r => assert(
      fs.exists(new org.apache.hadoop.fs.Path(table, r.path)),
      "pre-feature checkpoint must trigger the full-replay fallback"))
  }

  test("cdc sidecars stay protected while their commit is IN THE LOG, " +
      "age out only after expireLog drops it") {
    val table = freshTable("vac_cdc")
    import spark.implicits._
    val now = System.currentTimeMillis()
    TableWriter.write(spark, (0L until 50L).toDF("id"), table,
      version = 0L, commitTs = now - 2000L)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(table).getFileSystem(conf)
    // a real change-data sidecar committed as a CdcFile action
    val rel = f"_change_data/cd-${1L}%020d-00000-test.parquet"
    Seq((1L, "insert")).toDF("id", "_change_type").coalesce(1)
      .write.parquet(s"$table/.cdc_stage")
    val staged = fs.listStatus(new org.apache.hadoop.fs.Path(
      s"$table/.cdc_stage")).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$table/_change_data"))
    fs.rename(staged, new org.apache.hadoop.fs.Path(table, rel))
    fs.delete(new org.apache.hadoop.fs.Path(s"$table/.cdc_stage"), true)
    val log = new TxnLog(table, conf, tombstoneRetentionMillis = 1L)
    log.commit(1L, Seq(CdcFile(rel, Map.empty, 1L),
      CommitInfo("DELETE", now - 1000L)))
    log.commit(2L, Seq(CommitInfo("NOOP", now)))
    // checkpoint whose tiny tombstone retention EXPIRES the cdc ref —
    // the in-log protection must come from the filename's version, not
    // from the checkpoint
    log.writeCheckpoint(2L)
    val old = now - 10L * 24 * 3600 * 1000
    fs.setTimes(new org.apache.hadoop.fs.Path(table, rel), old, old)
    assert(TableWriter.vacuum(spark, table,
      retainMillis = 3600 * 1000L, nowMillis = now).isEmpty)
    assert(fs.exists(new org.apache.hadoop.fs.Path(table, rel)),
      "commit 1 is still in the log — its change file must survive")
    // expireLog drops commits below the checkpoint -> the sidecar ages out
    assert(log.expireLog(retainMillis = 0L, nowMillis = now + 100000L)
      .nonEmpty)
    val swept = TableWriter.vacuum(spark, table,
      retainMillis = 3600 * 1000L, nowMillis = now)
    assert(swept.contains(rel), s"expected $rel swept, got $swept")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(table, rel)))
    assert(SnapshotReader.read(spark, table).count() == 50L)
  }

  test("vacuum never sweeps live files whose commits EXPIRED from the log") {
    val table = freshTable("vac_expired")
    for (v <- 0L until 11L)
      TableWriter.write(spark,
        Tables.load(spark, sf, "lineitem").limit(10).withColumn("v",
          org.apache.spark.sql.functions.lit(v)),
        table, version = v, commitTs = 1000L * (v + 1))
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    assert(log.checkpointVersions().contains(10L))
    // drop commits v0..v9 — their AddFiles now exist ONLY in the
    // checkpoint; a referenced-set built from commit JSONs alone would
    // let the orphan sweep eat ten elevenths of the live table
    assert(log.expireLog(retainMillis = 0L, nowMillis = 99000L).nonEmpty)
    val before = SnapshotReader.read(spark, table).count()
    assert(before == 110L)
    val swept = TableWriter.vacuum(spark, table, retainMillis = 0L,
      nowMillis = System.currentTimeMillis() + 1000)
    assert(swept.isEmpty, s"live files swept after log expiry: $swept")
    assert(SnapshotReader.read(spark, table).count() == before)
  }

  test("append auto-assigns versions") {
    val table = freshTable("append_auto")
    val li = Tables.load(spark, sf, "lineitem")
    assert(TableWriter.append(spark, li.limit(50), table) == 0L)
    assert(TableWriter.append(spark,
      li.limit(80).except(li.limit(50)), table) == 1L)
    assert(SnapshotReader.read(spark, table).count() == 80)
  }

  test("vacuum deletes files unreferenced past the retention horizon") {
    val table = freshTable("vacuum")
    val li = Tables.load(spark, sf, "lineitem").limit(300)
    TableWriter.write(spark, li, table,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    val removed = TableWriter.removeWhere(spark, table,
      pv => pv.get("l_returnflag").contains("R"), version = 1L, commitTs = 2000L)
    assert(removed.nonEmpty)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sessionState.newHadoopConf())
    removed.foreach(r => assert(
      fs.exists(new org.apache.hadoop.fs.Path(table, r.path)),
      "removed files are retained until vacuum"))
    // retention not yet reached -> nothing deleted
    assert(TableWriter.vacuum(spark, table,
      retainMillis = 10000L, nowMillis = 3000L).isEmpty)
    // horizon passed -> exactly the removed files go
    val deleted = TableWriter.vacuum(spark, table,
      retainMillis = 1000L, nowMillis = 60000L)
    assert(deleted.sorted == removed.map(_.path).sorted)
    removed.foreach(r => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(table, r.path))))
    // the latest snapshot never referenced them — still fully readable
    assert(SnapshotReader.read(spark, table)
      .filter(col("l_returnflag") === "R").count() == 0)
    assert(SnapshotReader.read(spark, table).count() ==
      li.filter(col("l_returnflag") =!= "R").count())
  }

  test("merge rewrites only the files containing matched keys") {
    val table = freshTable("merge")
    val li = Tables.load(spark, sf, "lineitem")
    // range-partitioned files -> a narrow key batch touches few files
    TableWriter.write(spark, li.repartitionByRange(6, col("l_orderkey")),
      table, version = 0L, commitTs = 1000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val before = log.snapshotLatest().files.map(_.path).toSet
    // the synthetic lineitem is NOT PK-unique on (orderkey, linenumber) —
    // dedup so each source row owns its key
    val loKeys = li.dropDuplicates("l_orderkey", "l_linenumber")
      .orderBy(col("l_orderkey"), col("l_linenumber")).limit(20)
    val updates = loKeys.withColumn("l_quantity", col("l_quantity") + 1000)
    TableWriter.mergeUpsert(spark, table, updates,
      keyCols = Seq("l_orderkey", "l_linenumber"),
      version = 1L, commitTs = 2000L)
    val after = log.snapshotLatest().files.map(_.path).toSet
    // low keys live in the first range file(s): most files survive as-is
    assert((before & after).nonEmpty, "untouched files must keep their paths")
    assert((before -- after).size < before.size)
    // every target copy of a matched key is replaced by its ONE source row
    val keyCols = loKeys.select("l_orderkey", "l_linenumber")
    val matchedRows = li.join(keyCols,
      Seq("l_orderkey", "l_linenumber"), "left_semi").count()
    val snap = SnapshotReader.read(spark, table)
    assert(snap.count() == li.count() - matchedRows + 20)
    val updated = snap.join(keyCols, Seq("l_orderkey", "l_linenumber"))
    assert(updated.count() == 20)
    assert(updated.filter(col("l_quantity") <= 1000).count() == 0)
  }

  test("merge inserts unmatched source rows") {
    val table = freshTable("merge_ins")
    val li = Tables.load(spark, sf, "lineitem").limit(100)
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    // keys far outside the table
    val inserts = li.withColumn("l_orderkey", col("l_orderkey") + 900000000L)
    TableWriter.mergeUpsert(spark, table, inserts,
      keyCols = Seq("l_orderkey", "l_linenumber"),
      version = 1L, commitTs = 2000L)
    val snap = SnapshotReader.read(spark, table)
    assert(snap.count() == 200)
    assert(snap.filter(col("l_orderkey") >= 900000000L).count() == 100)
  }

  test("row-level delete rewrites only files with matches") {
    val table = freshTable("rowdel")
    val li = Tables.load(spark, sf, "lineitem")
    TableWriter.write(spark, li.repartitionByRange(6, col("l_orderkey")),
      table, version = 0L, commitTs = 1000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val before = log.snapshotLatest().files.map(_.path).toSet
    val maxKey = li.agg(max("l_orderkey")).collect()(0).getLong(0)
    // matches only in the top range file
    TableWriter.deleteWhere(spark, table, col("l_orderkey") > maxKey - 10,
      version = 1L, commitTs = 2000L)
    val after = log.snapshotLatest().files.map(_.path).toSet
    assert((before & after).nonEmpty, "files without matches must survive")
    val want = li.filter(col("l_orderkey") <= maxKey - 10).count()
    assert(SnapshotReader.read(spark, table).count() == want)
    // CDC sees the churn (dataChange=true): v1 has both r and c events
    val v1 = CdcReader.cdc(spark, table, startingVersion = 0L,
      includeHistory = false)
    assert(v1.filter(col("op") === "r").count() > 0)
    assert(v1.filter(col("op") === "c").count() > 0)
  }

  test("schema enforcement rejects drifted appends unless Metadata evolves") {
    val table = freshTable("enforce")
    val li = Tables.load(spark, sf, "lineitem").limit(50)
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    val drifted = li.withColumn("rogue", lit(1))
    intercept[IllegalArgumentException] {
      TableWriter.write(spark, drifted, table, version = 1L, commitTs = 2000L)
    }
    // same shape appends fine; declared evolution is the sanctioned path
    TableWriter.write(spark, li, table, version = 1L, commitTs = 2000L)
    TableWriter.write(spark, drifted, table, version = 2L, commitTs = 3000L,
      extraActions = Seq(Metadata(drifted.schema.json, Seq.empty)))
    assert(SnapshotReader.read(spark, table).columns.contains("rogue"))
  }

  test("size-aware compaction leaves already-large files untouched") {
    val table = freshTable("sizeaware")
    val li = Tables.load(spark, sf, "lineitem")
    // one large file, then three small append commits
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val bigPath = log.snapshotLatest().files.head.path
    val bigSize = log.snapshotLatest().files.head.size
    (1 to 3).foreach { i =>
      TableWriter.write(spark, li.limit(20 * i).except(li.limit(20 * (i - 1))),
        table, version = i.toLong, commitTs = 1000L + i)
    }
    TableWriter.compact(spark, table, version = 4L, commitTs = 5000L,
      minFileBytes = bigSize) // the big file is NOT a candidate
    val after = log.snapshotLatest().files
    assert(after.map(_.path).contains(bigPath), "large file must keep its path")
    // the three smalls packed into one
    assert(after.size == 2, s"expected big + 1 packed, got ${after.size}")
    assert(SnapshotReader.read(spark, table).count() == li.count() + 60)
  }

  test("cluster-by compaction makes file stats selective for skipping") {
    val table = freshTable("cluster")
    val li = Tables.load(spark, sf, "lineitem")
    // unsorted 6-way layout: every file spans ~the whole key range
    TableWriter.write(spark, li.repartition(6), table,
      version = 0L, commitTs = 1000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val keys = li.select(min("l_orderkey"), max("l_orderkey")).collect()(0)
    val (lo, hi) = (keys.getLong(0), keys.getLong(0) + 5)
    val keptBefore = DataSkipping.pruneFiles(log.snapshotLatest().files,
      org.apache.spark.sql.types.LongType, "l_orderkey", lo, hi)
    assert(keptBefore.size == 6, "unsorted files all overlap a narrow range")
    TableWriter.compact(spark, table, version = 1L, commitTs = 2000L,
      clusterBy = Some("l_orderkey"), targetFiles = 6)
    val after = log.snapshotLatest().files
    assert(after.size == 6)
    val keptAfter = DataSkipping.pruneFiles(after,
      org.apache.spark.sql.types.LongType, "l_orderkey", lo, hi)
    assert(keptAfter.size < keptBefore.size,
      s"clustering must tighten stats (kept ${keptAfter.size})")
    // content unchanged, rows preserved
    assert(SnapshotReader.read(spark, table).count() == li.count())
    assert(DataSkipping.readRange(spark, table, "l_orderkey", lo, hi).count() ==
      li.filter(col("l_orderkey").between(lo, hi)).count())
  }

  test("zorder compaction prunes on BOTH dimensions") {
    val li = Tables.load(spark, sf, "lineitem")
    val schema = li.schema
    def build(freshName: String)(
        shape: (String, Long, Long) => Unit): String = {
      val t = freshTable(freshName)
      TableWriter.write(spark, li.repartition(6), t,
        version = 0L, commitTs = 1000L)
      shape(t, 1L, 2000L)
      t
    }
    // one table z-ordered on (orderkey, suppkey), one sorted on orderkey
    val zt = build("zorder") { (t, v, ts) =>
      TableWriter.compact(spark, t, v, ts,
        zorderBy = Seq("l_orderkey", "l_suppkey"), targetFiles = 16)
    }
    val st = build("sorted1d") { (t, v, ts) =>
      TableWriter.compact(spark, t, v, ts,
        clusterBy = Some("l_orderkey"), targetFiles = 16)
    }
    def kept(t: String, preds: Seq[(String, Any, Any)]): Int = {
      val log = new TxnLog(t, spark.sessionState.newHadoopConf())
      DataSkipping.pruneFilesAll(log.snapshotLatest().files, schema, preds).size
    }
    val ok = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_suppkey"), max("l_suppkey")).collect()(0)
    val okMid = (ok.getLong(0) + ok.getLong(1)) / 2
    val skMid = (ok.getLong(2) + ok.getLong(3)) / 2
    val okBox = ("l_orderkey", okMid, okMid + (ok.getLong(1) - ok.getLong(0)) / 16)
    val skBox = ("l_suppkey", skMid, skMid + (ok.getLong(3) - ok.getLong(2)) / 16)
    // a suppkey-only box: the orderkey-sorted layout cannot prune it,
    // the z-ordered one can
    val zSupp = kept(zt, Seq(skBox))
    val sSupp = kept(st, Seq(skBox))
    assert(sSupp == 16, "1-D orderkey sort spans all suppkeys in every file")
    assert(zSupp < sSupp, s"zorder must prune the second dim (kept $zSupp)")
    // and the z layout still prunes the first dim too
    assert(kept(zt, Seq(okBox)) < 16)
    // both layouts return identical query results
    val pred = col("l_suppkey").between(skBox._2, skBox._3)
    assert(DataSkipping.readWhere(spark, zt, pred).count() ==
      li.filter(pred).count())
    // N-dimensional generalization: 3-column Morton codes compute fine
    val z3 = ZOrder.withZ(li,
      Seq("l_orderkey", "l_suppkey", "l_partkey"), bits = 10)
    assert(z3.select(min(col("_z")), max(col("_z"))).collect()(0)
      .getLong(1) >= 0)
  }

  test("history lists commits newest-first with op and file counts") {
    val table = freshTable("history")
    val li = Tables.load(spark, sf, "lineitem").limit(100)
    TableWriter.write(spark, li, table,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    TableWriter.removeWhere(spark, table,
      pv => pv.get("l_returnflag").contains("R"), version = 1L, commitTs = 2000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val h = log.history()
    assert(h.map(_._1) == Seq(1L, 0L))
    assert(h.head._2 == "DELETE" && h.head._3 == 2000L && h.head._5 > 0)
    assert(h(1)._2 == "WRITE" && h(1)._4 > 0 && h(1)._5 == 0)
  }

  test("restore returns the table to an old version as a new commit") {
    val table = freshTable("restore")
    val li = Tables.load(spark, sf, "lineitem").limit(200)
    TableWriter.write(spark, li, table,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    val n0 = SnapshotReader.read(spark, table).count()
    TableWriter.removeWhere(spark, table,
      pv => pv.get("l_returnflag").contains("R"), version = 1L, commitTs = 2000L)
    assert(SnapshotReader.read(spark, table).count() < n0)
    TableWriter.restore(spark, table, toVersion = 0L,
      version = 2L, commitTs = 3000L)
    // latest snapshot is back to v0's content; history is preserved
    assert(SnapshotReader.read(spark, table).count() == n0)
    assert(SnapshotReader.read(spark, table, versionAsOf = Some(1L)).count() < n0)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    assert(log.history().head._2 == "RESTORE")
    // the restore churn is visible to CDC (dataChange=true re-adds)
    val v2 = CdcReader.cdc(spark, table, startingVersion = 1L,
      includeHistory = false)
    assert(v2.filter(col("op") === "c").count() > 0)
  }

  test("restore TO TIMESTAMP resolves the at-or-before version") {
    val table = freshTable("restore_ts")
    val li = Tables.load(spark, sf, "lineitem").limit(100)
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    val n0 = SnapshotReader.read(spark, table).count()
    TableWriter.deleteWhere(spark, table, col("l_linenumber") === 1,
      version = 1L, commitTs = 2000L)
    // ts between the two commits resolves to v0
    val v = TableWriter.restoreToTimestamp(spark, table, tsMillis = 1500L,
      version = 2L, commitTs = 3000L)
    assert(v == 0L)
    assert(SnapshotReader.read(spark, table).count() == n0)
    // before the first commit: strict error, no silent fallback
    intercept[IllegalArgumentException] {
      TableWriter.restoreToTimestamp(spark, table, tsMillis = 10L,
        version = 3L, commitTs = 4000L)
    }
  }

  test("streaming sink appends each batch exactly once (txn marker)") {
    val table = freshTable("stream_sink")
    val li = Tables.load(spark, sf, "lineitem")
    val b0 = li.limit(100)
    val b1 = li.limit(150).except(li.limit(100))
    assert(graft.streaming.GraftTableSink.commitBatch(b0, table, 0L, commitTs = 1000L))
    assert(graft.streaming.GraftTableSink.commitBatch(b1, table, 1L, commitTs = 2000L))
    // re-delivery after a simulated restart: both batches no-op
    assert(!graft.streaming.GraftTableSink.commitBatch(b0, table, 0L, commitTs = 3000L))
    assert(!graft.streaming.GraftTableSink.commitBatch(b1, table, 1L, commitTs = 3000L))
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    assert(log.versions() == Seq(0L, 1L))
    assert(SnapshotReader.read(spark, table).count() == 150)
    // and the table's CDC stream tails the appends back out
    val ops = CdcReader.cdc(spark, table).groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops == Map("c" -> 150L))
  }

  test("the end-to-end pipe: MemoryStream -> graft table -> CDC read") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val table = freshTable("pipe")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val q = graft.streaming.GraftTableSink.append(
      mem.toDF().toDF("id", "k", "v"), table,
      java.nio.file.Files.createTempDirectory("ck").toString)
    try {
      mem.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      mem.addData((3L, "a", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(SnapshotReader.read(spark, table).count() == 3)
    val cdc = CdcReader.cdc(spark, table)
    assert(cdc.filter(col("op") === "c").count() == 3)
    assert(cdc.select("commit_version").distinct().count() == 2)
  }

  test("streaming materialized view: update-mode agg merges into the table") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val table = freshTable("mview")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val agg = mem.toDF().toDF("k", "v")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
    val q = graft.streaming.GraftTableSink.upsertAggregate(agg, table,
      keyCols = Seq("k"),
      java.nio.file.Files.createTempDirectory("ck").toString)
    try {
      mem.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
      q.processAllAvailable()
      val s1 = graft.txn.SnapshotReader.read(spark, table)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(s1 == Map("a" -> (2L, 3.0), "b" -> (1L, 5.0)))
      // second batch touches only 'a' — 'b' must survive the merge
      mem.addData(("a", 4.0))
      q.processAllAvailable()
      val s2 = graft.txn.SnapshotReader.read(spark, table)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(s2 == Map("a" -> (3L, 7.0), "b" -> (1L, 5.0)))
      // refresh history is time-travelable
      assert(graft.txn.SnapshotReader.read(spark, table,
        versionAsOf = Some(0L)).count() == 2)
    } finally q.stop()
  }

  test("partition-pruned CDC replay touches only matching partitions") {
    val table = freshTable("cdc_pruned")
    val li = Tables.load(spark, sf, "lineitem").limit(300)
    TableWriter.write(spark, li, table,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    TableWriter.removeWhere(spark, table,
      pv => pv.get("l_returnflag").contains("N"), version = 1L, commitTs = 2000L)
    val pruned = CdcReader.cdc(spark, table,
      partitionPred = Some(pv => pv.get("l_returnflag").contains("R")))
    val full = CdcReader.cdc(spark, table)
    assert(pruned.count() ==
      full.filter(col("partition_value") === "l_returnflag=R").count())
    assert(pruned.filter(col("op") === "r").count() == 0) // only N removed
    // a pruned read matching nothing is empty, not an error
    assert(CdcReader.cdc(spark, table,
      partitionPred = Some(_ => false)).count() == 0)
  }

  test("file stats prune a range read to the overlapping files only") {
    val table = freshTable("skipping")
    // range-partition by key so files carry disjoint [min,max] key ranges
    val li = Tables.load(spark, sf, "lineitem")
      .repartitionByRange(6, col("l_orderkey"))
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val files = log.snapshotLatest().files
    assert(files.size == 6)
    assert(files.forall(_.stats.exists(_.minValues.contains("l_orderkey"))))
    val totalRows = files.map(_.stats.get.numRecords).sum
    assert(totalRows == li.count())

    val keys = li.select(min("l_orderkey"), max("l_orderkey")).collect()(0)
    val (lo, hi) = (keys.getLong(0), keys.getLong(0) + 5)
    val kept = DataSkipping.pruneFiles(files,
      org.apache.spark.sql.types.LongType, "l_orderkey", lo, hi)
    assert(kept.size < files.size,
      s"narrow range must prune some of ${files.size} files")
    // pruned read == full-scan filter
    val got = DataSkipping.readRange(spark, table, "l_orderkey", lo, hi)
    val want = SnapshotReader.read(spark, table)
      .filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // string-typed pruning is also exercised
    val keptS = DataSkipping.pruneFiles(files,
      org.apache.spark.sql.types.StringType, "l_returnflag", "A", "A")
    assert(keptS.nonEmpty)
  }

  test("readWhere derives pruning ranges from the predicate itself") {
    val table = freshTable("readwhere")
    val li = Tables.load(spark, sf, "lineitem")
      .repartitionByRange(6, col("l_orderkey"))
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val schema = org.apache.spark.sql.types.DataType.fromJson(
      log.snapshotLatest().metadata.get.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val _ = schema
    val lo = li.agg(min("l_orderkey")).collect()(0).getLong(0)
    val pred = col("l_orderkey") <= lo + 5 &&
      col("l_quantity") >= 1.0 && col("l_returnflag") === "A"
    // the derived key range prunes the 6-file range layout
    val (kept, _, _) = DataSkipping.filesFor(spark, table, pred)
    assert(kept.size < 6, s"kept ${kept.size} of 6")
    // end-to-end: pruned result == plain filter result
    val got = DataSkipping.readWhere(spark, table, pred)
    val want = SnapshotReader.read(spark, table).filter(pred)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // unknown-shape predicates prune nothing but stay correct
    val odd = DataSkipping.readWhere(spark, table, col("l_orderkey") % 2 === 0)
    assert(odd.count() == li.filter(col("l_orderkey") % 2 === 0).count())
  }

  test("temporal and conjunctive stats pruning") {
    val table = freshTable("skipts")
    val li = Tables.load(spark, sf, "lineitem")
      .repartitionByRange(6, col("l_shipdate"))
    TableWriter.write(spark, li, table, version = 0L, commitTs = 1000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val files = log.snapshotLatest().files
    assert(files.forall(_.stats.exists(_.minValues.contains("l_shipdate"))))
    val schema = org.apache.spark.sql.types.DataType.fromJson(
      log.snapshotLatest().metadata.get.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // timestamp stats are INT64 micros (TableWriter pins TIMESTAMP_MICROS)
    val bounds = li.select(
      unix_micros(min(col("l_shipdate")).cast("timestamp")),
      unix_micros(max(col("l_shipdate")).cast("timestamp")))
      .collect()(0)
    val (tLo, tHi) = (bounds.getLong(0), bounds.getLong(0) + 86400000000L)
    val keptT = DataSkipping.pruneFiles(files,
      org.apache.spark.sql.types.TimestampType, "l_shipdate", tLo, tHi)
    assert(keptT.size < files.size, s"one-day range kept ${keptT.size}/6")
    // conjunction prunes at least as hard as either predicate alone
    val keptBoth = DataSkipping.pruneFilesAll(files, schema, Seq(
      ("l_shipdate", tLo, tHi),
      ("l_quantity", 1.0, 50.0)))
    assert(keptBoth.size <= keptT.size && keptBoth.nonEmpty)
  }

  test("OPTIMIZE WHERE compacts only the scoped partitions") {
    val table = freshTable("optwhere")
    val li = Tables.load(spark, sf, "lineitem").limit(600)
    TableWriter.write(spark, li.limit(300), table,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    TableWriter.write(spark, li.limit(600).except(li.limit(300)), table,
      partitionBy = Seq("l_returnflag"), version = 1L, commitTs = 2000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val before = log.snapshotLatest().files
    val beforeOther = before
      .filterNot(_.partitionValues.get("l_returnflag").contains("R"))
      .map(_.path).toSet
    assert(before.count(_.partitionValues.get("l_returnflag").contains("R")) > 1)
    TableWriter.compact(spark, table, version = 2L, commitTs = 3000L,
      partitionPred = Some(pv => pv.get("l_returnflag").contains("R")))
    val after = log.snapshotLatest().files
    // R: compacted to one file; others: byte-identical paths
    assert(after.count(_.partitionValues.get("l_returnflag").contains("R")) == 1)
    assert(after.filterNot(_.partitionValues.get("l_returnflag").contains("R"))
      .map(_.path).toSet == beforeOther,
      "out-of-scope partitions' files must keep their paths")
  }

  test("maxFileBytes bin-packs a skewed partition into multiple files") {
    val table = freshTable("binpack")
    import spark.implicits._
    // partition a: ~4000 rows across two commits; partition b: 40 rows
    val big = (0L until 4000L).map(i => (i, "a")).toDF("id", "p")
    val small = (0L until 40L).map(i => (i + 10000L, "b")).toDF("id", "p")
    TableWriter.write(spark, big.filter(col("id") < 2000).union(small),
      table, partitionBy = Seq("p"), version = 0L, commitTs = 1000L)
    TableWriter.write(spark, big.filter(col("id") >= 2000), table,
      partitionBy = Seq("p"), version = 1L, commitTs = 2000L)
    val log = new TxnLog(table, spark.sessionState.newHadoopConf())
    val aBytes = log.snapshotLatest().files
      .filter(_.partitionValues.get("p").contains("a")).map(_.size).sum
    // a target under half of partition a's bytes -> >=2 files for a
    TableWriter.compact(spark, table, version = 2L, commitTs = 3000L,
      maxFileBytes = aBytes / 2)
    val after = log.snapshotLatest().files
    val aFiles = after.filter(_.partitionValues.get("p").contains("a"))
    val bFiles = after.filter(_.partitionValues.get("p").contains("b"))
    assert(aFiles.size >= 2,
      s"skewed partition should fan out, got ${aFiles.size} file(s)")
    assert(bFiles.size == 1,
      s"small partition should stay single-file, got ${bFiles.size}")
    // no file wildly over target (salt collisions allow bounded overshoot)
    assert(aFiles.forall(_.size <= aBytes),
      "a bin-packed file exceeds the whole partition's bytes")
    // content unchanged
    val got = SnapshotReader.read(spark, table)
      .agg(count(lit(1)), sum(col("id"))).head()
    assert(got.getLong(0) == 4040L)
    assert(got.getLong(1) == (0L until 4000L).sum + (0L until 40L).map(_ + 10000L).sum)
    // row ids preserved through the bin-packed rewrite
    val ids = spark.read.format("graft").option("tablePath", table).load()
      .select(col("id"), col(TxnLog.RowIdColumn).as("rid")).collect()
    assert(ids.forall(!_.isNullAt(1)))
    assert(ids.map(_.getLong(1)).distinct.length == 4040)
  }
}
