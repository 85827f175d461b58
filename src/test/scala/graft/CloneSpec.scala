package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn._

/** Shallow clone: zero-copy CLONE commit, copy-on-write divergence,
  * vacuum containment (a clone must never reclaim source-owned files),
  * time travel across the divergence, and the documented refusals.
  */
class CloneSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val li = Tables.load(spark, sf, "lineitem")
  private lazy val conf = spark.sessionState.newHadoopConf()
  // the shared q96 fixture: src v0 = %7 rows; clone then diverges
  // (v1 appends %11 rows, v2 rewrite-deletes l_suppkey%4)
  private lazy val (src, dst) = queries.Maintenance.cloneFixture(spark, sf)

  private def fsOf(p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(conf)

  private def parquetCountUnder(dir: String): Int = {
    val fs = fsOf(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    def walk(d: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(d).map { st =>
        if (st.isDirectory) {
          if (st.getPath.getName == "_txn_log") 0 else walk(st.getPath)
        } else if (st.getPath.getName.endsWith(".parquet")) 1
        else 0
      }.sum
    if (fs.exists(root)) walk(root) else 0
  }

  test("CLONE is one metadata commit: v0 of the clone stages no data file") {
    val l = new TxnLog(dst, conf)
    val v0 = l.snapshot(0L)
    assert(v0.files.nonEmpty)
    assert(v0.files.forall(f => TxnLog.isExternal(f.path)),
      "clone v0 must reference source files by absolute path")
    // divergence staged clone-local files later, but none belong to v0
    val localNow = parquetCountUnder(dst)
    assert(localNow > 0, "diverged clone should own its new files")
    assert(v0.files.forall(f => !f.path.contains(dst)))
  }

  test("clone v0 reads exactly the source snapshot (zero copy)") {
    val expected = li.filter(col("l_orderkey") % 7 === 0).count()
    assert(SnapshotReader.read(spark, dst, versionAsOf = Some(0L)).count()
      == expected)
    assert(SnapshotReader.read(spark, src).count() == expected)
  }

  test("copy-on-write: the diverged clone never mutated the source") {
    // clone is at v2 (append + rewrite-delete); source must still be the
    // untouched v0 row set
    val srcRows = SnapshotReader.read(spark, src)
    assert(new TxnLog(src, conf).latestVersion().contains(0L))
    assert(srcRows.count() == li.filter(col("l_orderkey") % 7 === 0).count())
    val expectClone =
      li.filter(col("l_orderkey") % 7 === 0 && col("l_suppkey") % 4 =!= 0)
        .count() +
      li.filter(col("l_orderkey") % 11 === 0 && col("l_suppkey") % 4 =!= 0)
        .count()
    assert(SnapshotReader.read(spark, dst).count() == expectClone)
  }

  test("CDC replays the clone's own history (clone commit = 'c' events)") {
    val cdc = CdcReader.cdc(spark, dst, startingVersion = 0L,
      includeHistory = true).cache()
    try {
      val c0 = cdc.filter(col("op") === "c" && col("commit_version") === 0)
      assert(c0.count() == li.filter(col("l_orderkey") % 7 === 0).count())
      val c1 = cdc.filter(col("op") === "c" && col("commit_version") === 1)
      assert(c1.count() == li.filter(col("l_orderkey") % 11 === 0).count())
      // v2 rewrite: removed rows = rewritten survivors + deleted rows
      val r2 = cdc.filter(col("op") === "r" && col("commit_version") === 2).count()
      val c2 = cdc.filter(col("op") === "c" && col("commit_version") === 2).count()
      val killed = cdc.filter(col("op") === "c" && col("commit_version") <= 1 &&
        col("l_suppkey") % 4 === 0).count()
      assert(r2 == c2 + killed)
    } finally cdc.unpersist()
  }

  test("clone vacuum deletes clone-superseded files, NEVER source files") {
    // own diverged clone — vacuum permanently reclaims replay history,
    // so it must not touch the shared q96 fixture
    val dir = s"target/fixtures/clone_vac_${sf.replaceAll("[^a-zA-Z0-9]", "_")}"
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(dir), true)
    TableWriter.cloneShallow(spark, src, dir, commitTs = 2000L)
    TableWriter.write(spark, li.filter(col("l_orderkey") % 11 === 0), dir,
      version = 1L, commitTs = 3000L)
    TableWriter.deleteWhere(spark, dir, col("l_suppkey") % 4 === 0,
      version = 2L, commitTs = 4000L)
    val srcFiles = new TxnLog(src, conf).snapshot(0L).files.map(_.path)
    assert(srcFiles.nonEmpty)
    // far-future vacuum with zero retention: everything unprotected goes
    val reclaimed = TableWriter.vacuum(spark, dir, retainMillis = 0L,
      nowMillis = System.currentTimeMillis() + 1000L * 86400)
    assert(reclaimed.nonEmpty, "v1 originals should be reclaimable")
    val fs = fsOf(src)
    srcFiles.foreach { p =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(src, p)),
        s"clone vacuum reclaimed source file $p")
    }
    // the source still reads in full, and the vacuumed clone's LATEST
    // snapshot stays intact
    assert(SnapshotReader.read(spark, src).count() ==
      li.filter(col("l_orderkey") % 7 === 0).count())
    assert(SnapshotReader.read(spark, dir).count() ==
      SnapshotReader.read(spark, dst).count())
  }

  test("deletion vectors compose ON a clone (local sidecar, external data)") {
    val dir = s"target/fixtures/clone_dv_${sf.replaceAll("[^a-zA-Z0-9]", "_")}"
    val fs = fsOf(dir)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    TableWriter.cloneShallow(spark, src, dir, commitTs = 2000L)
    DeletionVectors.deleteWhere(spark, dir, col("l_suppkey") % 5 === 0,
      version = 1L, commitTs = 3000L)
    val expected = li.filter(col("l_orderkey") % 7 === 0 &&
      col("l_suppkey") % 5 =!= 0).count()
    assert(SnapshotReader.read(spark, dir).count() == expected)
    // the sidecar is clone-local; the source is untouched
    val dvs = new TxnLog(dir, conf).snapshotLatest().files
      .flatMap(_.dv).distinct
    assert(dvs.nonEmpty && dvs.forall(d =>
      fs.exists(new org.apache.hadoop.fs.Path(dir, d))))
    assert(SnapshotReader.read(spark, src).count() ==
      li.filter(col("l_orderkey") % 7 === 0).count())
  }

  test("a PARTITIONED source clones zero-copy; appends land clone-local") {
    val tag = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val psrc = s"target/fixtures/clone_psrc_$tag"
    val pdst = psrc + "_c"
    fsOf(psrc).delete(new org.apache.hadoop.fs.Path(psrc), true)
    fsOf(pdst).delete(new org.apache.hadoop.fs.Path(pdst), true)
    TableWriter.write(spark, li.filter(col("l_orderkey") % 31 === 0), psrc,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    TableWriter.cloneShallow(spark, psrc, pdst, commitTs = 2000L)
    assert(parquetCountUnder(pdst) == 0, "clone v0 must stage no data file")
    // partition values ride the log, so partition reads work unchanged
    val want = li.filter(col("l_orderkey") % 31 === 0 &&
      col("l_returnflag") === "A").count()
    assert(SnapshotReader.read(spark, pdst)
      .filter(col("l_returnflag") === "A").count() == want)
    // a clone-local append follows the source's partition spec and a
    // partition-granular delete applies across external + local files
    TableWriter.append(spark, li.filter(col("l_orderkey") % 37 === 0),
      pdst, commitTs = 3000L)
    TableWriter.removeWhere(spark, pdst,
      pv => pv.get("l_returnflag").contains("R"), version = 2L,
      commitTs = 4000L)
    // %31 and %37 rows both land (the overlap is stored twice: v0 + append)
    val expect =
      li.filter(col("l_orderkey") % 31 === 0 &&
        col("l_returnflag") =!= "R").count() +
      li.filter(col("l_orderkey") % 37 === 0 &&
        col("l_returnflag") =!= "R").count()
    assert(SnapshotReader.read(spark, pdst).count() == expect)
    assert(SnapshotReader.read(spark, psrc).count() ==
      li.filter(col("l_orderkey") % 31 === 0).count(),
      "the diverged clone must never mutate the source")
  }

  test("a DV-CARRYING source clones: pointers absolutize, deletes hold") {
    val tag = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val dvsrc = s"target/fixtures/clone_dvsrc_$tag"
    val dvdst = dvsrc + "_c"
    fsOf(dvsrc).delete(new org.apache.hadoop.fs.Path(dvsrc), true)
    fsOf(dvdst).delete(new org.apache.hadoop.fs.Path(dvdst), true)
    TableWriter.write(spark, li.filter(col("l_orderkey") % 31 === 0), dvsrc,
      version = 0L, commitTs = 1000L)
    DeletionVectors.deleteWhere(spark, dvsrc, col("l_suppkey") % 2 === 0,
      version = 1L, commitTs = 2000L)
    TableWriter.cloneShallow(spark, dvsrc, dvdst, commitTs = 3000L)
    assert(new TxnLog(dvdst, conf).snapshot(0L).files
      .forall(f => f.dv.forall(TxnLog.isExternal)),
      "cloned DV pointers must be absolute (source-owned)")
    val afterSrcDelete = li.filter(col("l_orderkey") % 31 === 0 &&
      col("l_suppkey") % 2 =!= 0)
    assert(SnapshotReader.read(spark, dvdst).count() ==
      afterSrcDelete.count(),
      "source deletions must hold through the clone")
    // a clone-local delete STACKS a clone-local vector over the external
    // one; the source's state and sidecars stay untouched
    DeletionVectors.deleteWhere(spark, dvdst, col("l_partkey") % 3 === 0,
      version = 1L, commitTs = 4000L)
    assert(SnapshotReader.read(spark, dvdst).count() ==
      afterSrcDelete.filter(col("l_partkey") % 3 =!= 0).count())
    assert(SnapshotReader.read(spark, dvsrc).count() ==
      afterSrcDelete.count())
    // metadata-only counts agree with the scan through mixed vectors
    assert(SnapshotReader.statsCount(spark, dvdst).head().getLong(0) ==
      afterSrcDelete.filter(col("l_partkey") % 3 =!= 0).count())
  }

  test("refusal: non-empty destination") {
    intercept[IllegalStateException] {
      TableWriter.cloneShallow(spark, src, dst, commitTs = 9000L)
    }
  }

  test("a CHAINED clone (A -> B -> C) keeps original absolute pointers") {
    val tag = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val a = s"target/fixtures/clone_chain_a_$tag"
    val b = s"target/fixtures/clone_chain_b_$tag"
    val c = s"target/fixtures/clone_chain_c_$tag"
    Seq(a, b, c).foreach(p =>
      fsOf(p).delete(new org.apache.hadoop.fs.Path(p), true))
    TableWriter.write(spark, li.filter(col("l_orderkey") % 29 === 0), a,
      version = 0L, commitTs = 1000L)
    DeletionVectors.deleteWhere(spark, a, col("l_suppkey") % 2 === 0,
      version = 1L, commitTs = 2000L)
    TableWriter.cloneShallow(spark, a, b, commitTs = 3000L)
    // B's files are already absolute — C must reference A directly,
    // never a '/B//A/…' double prefix
    TableWriter.cloneShallow(spark, b, c, commitTs = 4000L)
    val want = li.filter(col("l_orderkey") % 29 === 0 &&
      col("l_suppkey") % 2 =!= 0).count()
    assert(SnapshotReader.read(spark, c).count() == want)
    val cFiles = new TxnLog(c, conf).snapshot(0L).files
    assert(cFiles.forall(f => !f.path.contains(b)),
      "chained clone must point at the ORIGINAL files")
    assert(cFiles.forall(f => f.dv.forall(d => !d.contains(b))))
    // and the chained clone still diverges copy-on-write
    DeletionVectors.deleteWhere(spark, c, col("l_partkey") % 3 === 0,
      version = 1L, commitTs = 5000L)
    assert(SnapshotReader.read(spark, c).count() ==
      li.filter(col("l_orderkey") % 29 === 0 &&
        col("l_suppkey") % 2 =!= 0 && col("l_partkey") % 3 =!= 0).count())
    assert(SnapshotReader.read(spark, a).count() == want)
  }

  // ---- deep clone ----

  test("deep clone is INDEPENDENT: local paths, vectors copied, source " +
      "mutations and vacuum can't touch it") {
    val a = java.nio.file.Files.createTempDirectory("deep_src").toString
    val d = java.nio.file.Files.createTempDirectory("deep_dst") + "/t"
    val rows = li.filter(col("l_orderkey") % 29 === 0)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"))
    TableWriter.write(spark, rows, a, version = 0L, commitTs = 1000L)
    DeletionVectors.deleteWhere(spark, a, col("l_suppkey") % 2 === 0,
      version = 1L, commitTs = 2000L)
    val want = rows.filter(col("l_suppkey") % 2 =!= 0).count()
    val srcV = TableWriter.cloneDeep(spark, a, d, commitTs = 3000L)
    assert(srcV == 1L)
    assert(SnapshotReader.read(spark, d).count() == want)
    val dFiles = new TxnLog(d, conf).snapshot(0L).files
    assert(dFiles.forall(f => !TxnLog.isExternal(f.path)),
      "deep clone must own every data file")
    assert(dFiles.forall(_.dv.forall(v => !TxnLog.isExternal(v))),
      "deep clone must own every vector")
    // independence: mutate AND vacuum the source — the clone is unmoved
    DeletionVectors.deleteWhere(spark, a, col("l_partkey") % 3 === 0,
      version = 2L, commitTs = 4000L)
    TableWriter.vacuum(spark, a, retainMillis = 0L,
      nowMillis = System.currentTimeMillis())
    assert(SnapshotReader.read(spark, d).count() == want)
  }

  test("deep clone of a SHALLOW clone materializes the external files") {
    val a = java.nio.file.Files.createTempDirectory("deep_sc_src").toString
    val b = java.nio.file.Files.createTempDirectory("deep_sc_mid") + "/t"
    val d = java.nio.file.Files.createTempDirectory("deep_sc_dst") + "/t"
    val rows = li.filter(col("l_orderkey") % 31 === 0)
      .select(col("l_orderkey"), col("l_suppkey"))
    TableWriter.write(spark, rows, a, version = 0L, commitTs = 1000L)
    TableWriter.cloneShallow(spark, a, b, commitTs = 2000L)
    TableWriter.cloneDeep(spark, b, d, commitTs = 3000L)
    val dFiles = new TxnLog(d, conf).snapshot(0L).files
    assert(dFiles.forall(f => !TxnLog.isExternal(f.path)),
      "materialization must localize every imported pointer")
    assert(SnapshotReader.read(spark, d).count() == rows.count())
    // the original can vanish entirely; the deep clone still reads
    fsOf(a).delete(new org.apache.hadoop.fs.Path(a), true)
    assert(SnapshotReader.read(spark, d).count() == rows.count())
  }

  test("deep clone of a shallow clone carries imported DELETION VECTORS: " +
      "renamed externals must not resurrect their dead rows") {
    val a = java.nio.file.Files.createTempDirectory("deep_dv_src").toString
    val b = java.nio.file.Files.createTempDirectory("deep_dv_mid") + "/t"
    val d = java.nio.file.Files.createTempDirectory("deep_dv_dst") + "/t"
    val rows = li.filter(col("l_orderkey") % 41 === 0)
      .select(col("l_orderkey"), col("l_suppkey"))
    TableWriter.write(spark, rows, a, version = 0L, commitTs = 1000L)
    // source-side DV delete BEFORE the shallow clone: the import carries
    // both the external data files and their external vector pointers
    DeletionVectors.deleteWhere(spark, a, col("l_suppkey") % 2 === 0,
      version = 1L, commitTs = 1500L)
    val want = rows.filter(col("l_suppkey") % 2 =!= 0).count()
    TableWriter.cloneShallow(spark, a, b, commitTs = 2000L)
    // clone-local DV delete on top: a LOCAL vector dir whose rows are
    // keyed by the EXTERNAL files' basenames — the other rewrite case
    DeletionVectors.deleteWhere(spark, b, col("l_suppkey") % 3 === 0,
      version = 1L, commitTs = 2500L)
    val want2 = rows.filter(col("l_suppkey") % 2 =!= 0 &&
      col("l_suppkey") % 3 =!= 0).count()
    assert(SnapshotReader.read(spark, b).count() == want2)
    TableWriter.cloneDeep(spark, b, d, commitTs = 3000L)
    val dFiles = new TxnLog(d, conf).snapshot(0L).files
    assert(dFiles.forall(f => !TxnLog.isExternal(f.path)))
    assert(dFiles.forall(_.dv.forall(v => !TxnLog.isExternal(v))))
    assert(SnapshotReader.read(spark, d).count() == want2,
      "deep clone of a DV-carrying shallow clone must keep deleted rows dead")
    assert(want2 < want && want < rows.count()) // the assertions had teeth
    // the source can vanish; vectors were materialized, not pointed to
    fsOf(a).delete(new org.apache.hadoop.fs.Path(a), true)
    assert(SnapshotReader.read(spark, d).count() == want2)
  }

  test("deep clone refuses a non-empty destination") {
    val d = java.nio.file.Files.createTempDirectory("deep_ne") + "/t"
    TableWriter.write(spark,
      li.filter(col("l_orderkey") % 37 === 0).select(col("l_orderkey")),
      d, version = 0L, commitTs = 1000L)
    val e = intercept[IllegalStateException] {
      TableWriter.cloneDeep(spark, src, d, commitTs = 2000L)
    }
    assert(e.getMessage.contains("not empty"))
  }
}
