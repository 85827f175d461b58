package graft.queries

import graft.{QueryDef, Tables}
import graft.txn._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-maintenance operator inventory: OPTIMIZE-style compaction (CDC-
  * invisible reorganization), and stats-based file skipping. Fixtures
  * derive deterministically from lineitem, so the invariants are DuckDB-
  * expressible.
  */
object Maintenance {

  /** v0: lineitem %7 rows; v1: %11 rows (more files per partition);
    * v2: compaction (dataChange=false).
    */
  def compactionFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/opt_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    TableWriter.write(spark, li.filter(col("l_orderkey") % 11 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 1L, commitTs = 2000L)
    TableWriter.compact(spark, dir, version = 2L, commitTs = 3000L)
    dir
  }

  /** v0: lineitem range-partitioned into 6 files on l_orderkey, so each
    * file's footer stats carry a disjoint key range.
    */
  def skippingFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/skip_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    TableWriter.write(spark,
      Tables.load(spark, sfDir, "lineitem")
        .repartitionByRange(6, col("l_orderkey")),
      dir, version = 0L, commitTs = 1000L)
    dir
  }

  /** Overlapping-file-range fixture for the clustering-depth audit:
    * v0 lays lineitem out in 6 disjoint l_orderkey ranges (depth 1);
    * v1 appends an UNSORTED slice in 2 full-range files, so every key
    * range now has depth ≥ 1 with spans reaching 3 — the layout decay
    * OPTIMIZE exists to repair.
    */
  def overlapFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/ovl_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.repartitionByRange(6, col("l_orderkey")),
      dir, version = 0L, commitTs = 1000L)
    TableWriter.write(spark,
      li.filter(col("l_orderkey") % 3 === 0).coalesce(2),
      dir, version = 1L, commitTs = 2000L)
    dir
  }

  /** v0: lineitem %7 partitioned by l_returnflag; v1: full-sync of the
    * 'R' partition — kept rows (%5≠0) arrive with qty+100, %5=0 rows
    * are absent from the source (deleted), %11-not-%7 rows are new
    * inserts. Non-R partitions are out of scope and must be untouched.
    */
  def fullSyncFixture(spark: SparkSession, sfDir: String): String = {
    val dir =
      s"target/fixtures/fullsync_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    val scope = col("l_returnflag") === "R"
    val keeps = li.filter(scope && col("l_orderkey") % 7 === 0 &&
        col("l_orderkey") % 5 =!= 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
    val inserts = li.filter(scope && col("l_orderkey") % 11 === 0 &&
      col("l_orderkey") % 7 =!= 0)
    TableWriter.mergeFullSync(spark, dir, keeps.unionByName(inserts), scope,
      version = 1L, commitTs = 2000L)
    dir
  }

  /** v0: lineitem %7; v1: MERGE of (%14 rows with qty+100) updates +
    * (%9 ∧ ¬%7 rows) inserts, keyed by the lineitem PK.
    */
  def mergeFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/merge_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    val updates = li.filter(col("l_orderkey") % 14 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
    val inserts = li.filter(col("l_orderkey") % 9 === 0 &&
      col("l_orderkey") % 7 =!= 0)
    TableWriter.mergeUpsert(spark, dir, updates.unionByName(inserts),
      keyCols = Seq("l_orderkey", "l_linenumber"),
      version = 1L, commitTs = 2000L)
    dir
  }

  /** v0: lineitem %7; v1: row-level DELETE WHERE l_suppkey % 5 = 0. */
  def deleteFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/del_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    TableWriter.deleteWhere(spark, dir, col("l_suppkey") % 5 === 0,
      version = 1L, commitTs = 2000L)
    dir
  }

  /** v0: lineitem %7 partitioned by l_returnflag; v1: DV-delete
    * l_suppkey%5=0 (no file rewritten — sidecar only); v2: DV-delete
    * l_partkey%3=0, unioning into the affected files' vectors.
    */
  def dvFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/dv_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
    DeletionVectors.deleteWhere(spark, dir, col("l_suppkey") % 5 === 0,
      version = 1L, commitTs = 2000L)
    DeletionVectors.deleteWhere(spark, dir, col("l_partkey") % 3 === 0,
      version = 2L, commitTs = 3000L)
    dir
  }

  /** src: unpartitioned lineitem %7 rows at v0. dst: zero-copy shallow
    * clone of src, then DIVERGES — v1 appends the %11 rows, v2
    * rewrite-deletes l_suppkey%4 rows. The source must still read its
    * original v0 state afterwards (copy-on-write).
    */
  def cloneFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val src = s"target/fixtures/clone_src_$tag"
    val dst = s"target/fixtures/clone_dst_$tag"
    val conf = spark.sessionState.newHadoopConf()
    if (new TxnLog(src, conf).versions() == Seq(0L) &&
        new TxnLog(dst, conf).versions() == Seq(0L, 1L, 2L)) return (src, dst)
    val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(src), true)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), src,
      version = 0L, commitTs = 1000L)
    TableWriter.cloneShallow(spark, src, dst, commitTs = 2000L)
    TableWriter.write(spark, li.filter(col("l_orderkey") % 11 === 0), dst,
      version = 1L, commitTs = 3000L)
    TableWriter.deleteWhere(spark, dst, col("l_suppkey") % 4 === 0,
      version = 2L, commitTs = 4000L)
    (src, dst)
  }

  /** v0: %7 rows; v1: append %11; v2: rewrite-delete l_suppkey%4;
    * v3: RESTORE to v0 (new commit, history preserved).
    */
  /** v0: nation; v2: rebased append of keys+100 (its writer read v0 and
    * rebased over the interleaved v1); v1: interleaved append of keys+200
    * landed via the onStaged seam mid-flight.
    */
  def rebaseFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/rebase_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val n = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    TableWriter.write(spark, n, dir, version = 0L, commitTs = 1000L)
    val a = n.select((col("n_nationkey") + 100).as("n_nationkey"),
      col("n_regionkey"))
    val b = n.select((col("n_nationkey") + 200).as("n_nationkey"),
      col("n_regionkey"))
    TableWriter.appendRebasing(spark, a, dir, commitTs = 3000L,
      onStaged = () =>
        TableWriter.write(spark, b, dir, version = 1L, commitTs = 2000L))
    dir
  }

  /** v0: supplier base; v1: the racer's rows (won the version race);
    * v2: the retried writer's rows (lost once, re-executed, committed).
    */
  def optimisticRetryFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/optretry_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val sup = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    TableWriter.write(spark, sup, dir, version = 0L, commitTs = 1000L)
    val racer = sup.select((col("s_suppkey") + 10000).as("s_suppkey"),
      col("s_nationkey"))
    val mine = sup.filter(col("s_suppkey") % 2 === 0)
      .select((col("s_suppkey") + 20000).as("s_suppkey"), col("s_nationkey"))
    var planted = false
    OptimisticTxn.retrying(log) { v =>
      if (!planted) {
        planted = true
        // the racer takes exactly the version this attempt wants
        TableWriter.write(spark, racer, dir, version = v, commitTs = 2000L)
      }
      TableWriter.write(spark, mine, dir, version = v, commitTs = 3000L)
    }
    dir
  }

  /** v0: nation snapshot; v1: append keys+100; v2: append keys+200 for
    * even keys — three commits so the streaming read drains a snapshot
    * batch plus per-commit tail batches.
    */
  def streamTailFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/streamtail_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val n = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    TableWriter.write(spark, n, dir, version = 0L, commitTs = 1000L)
    TableWriter.write(spark,
      n.select((col("n_nationkey") + 100).as("n_nationkey"),
        col("n_regionkey")),
      dir, version = 1L, commitTs = 2000L)
    TableWriter.write(spark,
      n.filter(col("n_nationkey") % 2 === 0)
        .select((col("n_nationkey") + 200).as("n_nationkey"),
          col("n_regionkey")),
      dir, version = 2L, commitTs = 3000L)
    dir
  }

  def restoreFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/restore_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L, 3L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.write(spark, li.filter(col("l_orderkey") % 11 === 0), dir,
      version = 1L, commitTs = 2000L)
    TableWriter.deleteWhere(spark, dir, col("l_suppkey") % 4 === 0,
      version = 2L, commitTs = 3000L)
    TableWriter.restore(spark, dir, toVersion = 0L, version = 3L,
      commitTs = 4000L)
    dir
  }

  /** v0: %7 rows (4-column projection); v1: ADD CONSTRAINT qty ≥ 0;
    * v2: schema-evolution append of %11 rows carrying a new qty2 column
    * (constraint carried forward by the write path).
    */
  def evolutionFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/evo_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(cols.map(col): _*)
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.addConstraint(spark, dir, "l_quantity >= 0",
      version = 1L, commitTs = 2000L)
    val evolved = li.filter(col("l_orderkey") % 11 === 0)
      .withColumn("qty2", col("l_quantity") * 2)
    TableWriter.write(spark, evolved, dir, version = 2L, commitTs = 3000L,
      extraActions = Seq(Metadata(evolved.schema.json, Seq.empty)))
    dir
  }

  /** v0: 8 hash-distributed files; v1: Z-order compaction on
    * (l_orderkey, l_suppkey) so BOTH columns' footer stats become
    * prunable ranges.
    */
  def zorderFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/zord_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    TableWriter.write(spark,
      Tables.load(spark, sfDir, "lineitem").repartition(8), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.compact(spark, dir, version = 1L, commitTs = 2000L,
      targetFiles = 8, zorderBy = Seq("l_orderkey", "l_suppkey"))
    dir
  }

  /** v0: lineitem %7 (4 columns); v1: metadata-only RENAME
    * l_quantity → qty (zero files touched); v2: append of the %11∧¬%7
    * rows under the NEW logical name; v3: DELETE WHERE qty > 40.
    */
  def renameFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/ren_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L, 3L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.renameColumn(spark, dir, "l_quantity", "qty",
      version = 1L, commitTs = 2000L)
    TableWriter.write(spark,
      li.filter(col("l_orderkey") % 11 === 0 && col("l_orderkey") % 7 =!= 0)
        .withColumnRenamed("l_quantity", "qty"),
      dir, version = 2L, commitTs = 3000L)
    TableWriter.deleteWhere(spark, dir, col("qty") > 40,
      version = 3L, commitTs = 4000L)
    dir
  }

  /** v0: orders %5 with GENERATED o_month = date_format(o_orderdate,
    * 'yyyy-MM') as the partition column (writer omits it — the engine
    * computes); v1: append of the %7∧¬%5 rows, also omitting it.
    */
  def generatedFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/gen_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val orders = Tables.load(spark, sfDir, "orders")
    TableWriter.write(spark, orders.filter(col("o_orderkey") % 5 === 0), dir,
      partitionBy = Seq("o_month"), version = 0L, commitTs = 1000L,
      generated = Map("o_month" -> "date_format(o_orderdate, 'yyyy-MM')"))
    TableWriter.write(spark,
      orders.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 5 =!= 0),
      dir, partitionBy = Seq("o_month"), version = 1L, commitTs = 2000L)
    dir
  }

  /** v0: even orders (+ o_year), UNPARTITIONED; v1: SET PARTITIONING
    * (o_year) — metadata-only; v2: plain append of odd orders, which the
    * engine routes into the evolved hive layout. Final table = all
    * orders with o_year, spread across two physical layouts.
    */
  def partitionEvoFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/pevo_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    TableWriter.write(spark, orders.filter(col("o_orderkey") % 2 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.setPartitioning(spark, dir, Seq("o_year"),
      version = 1L, commitTs = 2000L)
    TableWriter.append(spark, orders.filter(col("o_orderkey") % 2 === 1), dir,
      commitTs = 3000L)
    dir
  }

  /** orders spread over 8 files keyed by o_orderkey, plus a per-file
    * bloom index build on the key.
    */
  def bloomIndexFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/blix_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L) &&
      BloomIndex.latestBuild(spark, dir).isDefined) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    TableWriter.write(spark,
      Tables.load(spark, sfDir, "orders").repartition(8, col("o_orderkey")),
      dir, version = 0L, commitTs = 1000L)
    BloomIndex.build(spark, dir, Seq("o_orderkey"), version = 0L)
    dir
  }

  /** v0: lineitem %6 rows; v1: UPDATE WHERE l_quantity < 15 SET
    * quantity += 100, extendedprice += OLD quantity (the old-row read is
    * the point — SQL UPDATE semantics).
    */
  def updateFixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/upd_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 6 === 0), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.updateWhere(spark, dir, col("l_quantity") < 15,
      Map("l_quantity" -> (col("l_quantity") + lit(100.0)),
        "l_extendedprice" -> (col("l_extendedprice") + col("l_quantity"))),
      version = 1L, commitTs = 2000L)
    dir
  }

  /** Main table: constraints (discount ≤ 0.08, quantity ≤ 45) declared
    * over a clean %4 seed; then appendWithQuarantine routes a mixed %4≠0
    * batch — clean rows into main, violators into the sidecar with
    * their failed expectations tagged.
    */
  def quarantineFixture(spark: SparkSession, sfDir: String): (String, String) = {
    val base = s"target/fixtures/quar_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val (main, quar) = (s"$base/main", s"$base/quarantine")
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(main, conf)
    if (log.versions() == Seq(0L, 1L, 2L, 3L)) return (main, quar)
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark,
      li.filter(col("l_orderkey") % 4 === 0 &&
        col("l_discount") <= 0.08 && col("l_quantity") <= 45),
      main, version = 0L, commitTs = 1000L)
    TableWriter.addConstraint(spark, main, "l_discount <= 0.08", 1L, 2000L)
    TableWriter.addConstraint(spark, main, "l_quantity <= 45", 2L, 3000L)
    TableWriter.appendWithQuarantine(spark,
      li.filter(col("l_orderkey") % 4 =!= 0), main, quar, commitTs = 4000L)
    (main, quar)
  }

  /** v0: lineitem %7; v1: MERGE (update %14 qty+100, insert %9∧¬%7);
    * v2: DELETE WHERE l_orderkey %3 = 0 (whole keys vanish). Three
    * versions of per-key history: unchanged, updated, inserted, deleted.
    */
  def scd2Fixture(spark: SparkSession, sfDir: String): String = {
    val dir = s"target/fixtures/scd2_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    if (log.versions() == Seq(0L, 1L, 2L)) return dir
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      version = 0L, commitTs = 1000L)
    val updates = li.filter(col("l_orderkey") % 14 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
    val inserts = li.filter(col("l_orderkey") % 9 === 0 &&
      col("l_orderkey") % 7 =!= 0)
    TableWriter.mergeUpsert(spark, dir, updates.unionByName(inserts),
      keyCols = Seq("l_orderkey", "l_linenumber"),
      version = 1L, commitTs = 2000L)
    TableWriter.deleteWhere(spark, dir, col("l_orderkey") % 3 === 0,
      version = 2L, commitTs = 3000L)
    dir
  }

  /** Same base history as [[scd2Fixture]], but the intervals table is
    * MAINTAINED: seeded after v0, refreshed after each of v1 (MERGE) and
    * v2 (DELETE) — each refresh touches only that version's changed
    * keys.
    */
  def scd2IncFixture(spark: SparkSession, sfDir: String): String = {
    val base = s"target/fixtures/scd2i_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val (dir, hist) = (s"$base/t", s"$base/h")
    val conf = spark.sessionState.newHadoopConf()
    val done =
      try new TxnLog(hist, conf).latestVersion().isDefined &&
        graft.operators.Scd2.refreshedThrough(spark, hist) == 2L
      catch { case _: Exception => false }
    if (done) return hist
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val li = Tables.load(spark, sfDir, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber")
    val cents = floor(col("l_quantity") * 100)
    TableWriter.write(spark, li.filter(col("l_orderkey") % 7 === 0), dir,
      version = 0L, commitTs = 1000L)
    graft.operators.Scd2.create(spark, dir, hist, keys, cents)
    val updates = li.filter(col("l_orderkey") % 14 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
    val inserts = li.filter(col("l_orderkey") % 9 === 0 &&
      col("l_orderkey") % 7 =!= 0)
    TableWriter.mergeUpsert(spark, dir, updates.unionByName(inserts),
      keyCols = keys, version = 1L, commitTs = 2000L)
    graft.operators.Scd2.refresh(spark, dir, hist, keys, cents)
    TableWriter.deleteWhere(spark, dir, col("l_orderkey") % 3 === 0,
      version = 2L, commitTs = 3000L)
    graft.operators.Scd2.refresh(spark, dir, hist, keys, cents)
    hist
  }

  def defs: Seq[QueryDef] = Seq(
    // Partition evolution, final state: v0 wrote unpartitioned, a
    // metadata-only SET PARTITIONING switched the spec, and a plain
    // append landed hive-partitioned by o_year — repartitioning a 100 TB
    // table costs one JSON commit, never a rewrite. The year filter
    // file-prunes the NEW generation via hive partition values and falls
    // back to footer stats on the old one; the mixed-layout snapshot
    // read must still reconstruct exactly the full orders table.
    QueryDef.sqlBacked(
      "q137_partition_evolution",
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM orders
        |WHERE YEAR(o_orderdate) = 1995
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val table = partitionEvoFixture(s, dir)
      DataSkipping.readWhere(s, table, col("o_year") === 1995)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy(col("o_orderstatus"))
    },

    // Metadata-only COUNT: per-partition exact live row counts computed
    // from the log's per-file stats minus deletion-vector dead rows —
    // no data file is opened (the DV sidecars are KBs). The fixture
    // stacks TWO DV deletes on a partitioned table, so the counts are
    // only right if the stats math honors each file's CURRENT vector.
    // The oracle recomputes from the base table.
    QueryDef.sqlBacked(
      "q145_metadata_count",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_orderkey % 7 = 0 AND l_suppkey % 5 <> 0
        |  AND l_partkey % 3 <> 0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val table = dvFixture(s, dir)
      SnapshotReader.statsCount(s, table)
        .orderBy(col("l_returnflag"))
    },

    // Metadata-only MIN/MAX: the global bounds come from per-file stats
    // for clean files; the two DV-delete commits make the naive stats
    // answer UNSOUND (a vector may have killed the extreme row), so the
    // engine scans just the DV-carrying files and combines — the scan
    // cost tracks the deleted sliver. Oracle recomputes from base.
    QueryDef.sqlBacked(
      "q146_metadata_minmax",
      """SELECT MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price
        |FROM lineitem
        |WHERE l_orderkey % 7 = 0 AND l_suppkey % 5 <> 0
        |  AND l_partkey % 3 <> 0""".stripMargin) { (s, dir) =>
      val table = dvFixture(s, dir)
      val (mn, mx) = SnapshotReader.statsMinMax(s, table, "l_extendedprice")
      import s.implicits._
      Seq((mn.asInstanceOf[Double], mx.asInstanceOf[Double]))
        .toDF("min_price", "max_price")
    },

    // Point lookups through the per-file bloom index: three key probes
    // (min, max, and the first key past the midpoint — derived from the
    // data so both engines pick identical keys at any SF), each pruning
    // the 8-file table down to the file(s) that may hold the key before
    // any row is read. Results are exact — the index is advisory, the
    // residual filter decides.
    QueryDef.sqlBacked(
      "q140_bloom_index_lookup",
      """WITH keys AS (
        |  SELECT MIN(o_orderkey) AS k FROM orders
        |  UNION ALL SELECT MAX(o_orderkey) FROM orders
        |  UNION ALL SELECT MIN(o_orderkey) FROM orders
        |    WHERE o_orderkey > (SELECT (MIN(o_orderkey) + MAX(o_orderkey)) / 2
        |                        FROM orders))
        |SELECT o_orderkey, o_orderstatus,
        |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey IN (SELECT k FROM keys)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val table = bloomIndexFixture(s, dir)
      val o = Tables.load(s, dir, "orders")
      val Seq(lo, hi) = o.agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .head().toSeq.map(_.asInstanceOf[Long]).toSeq
      val mid = o.filter(col("o_orderkey") > (lo + hi) / 2)
        .agg(min(col("o_orderkey"))).head().getLong(0)
      Seq(lo, hi, mid).distinct.map(k =>
          DataSkipping.readWhere(s, table, col("o_orderkey") === k))
        .reduce(_ unionByName _)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .orderBy(col("o_orderkey"))
    },

    // Row-level UPDATE WHERE, final state: matching rows carry the SET
    // expressions evaluated against the OLD row (l_extendedprice grew by
    // the PRE-update quantity), non-matching rows and untouched files
    // are byte-identical. The oracle recomputes the whole final state
    // with a CASE over the base table.
    QueryDef.sqlBacked(
      "q138_update_where",
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(CASE WHEN l_quantity < 15
        |      THEN l_quantity + 100.0 ELSE l_quantity END * 100) AS BIGINT))
        |    AS BIGINT) AS qty_cents,
        |  CAST(SUM(CAST(FLOOR(CASE WHEN l_quantity < 15
        |      THEN l_extendedprice + l_quantity ELSE l_extendedprice END
        |      * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem
        |WHERE l_orderkey % 6 = 0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val table = updateFixture(s, dir)
      SnapshotReader.read(s, table)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_quantity") * 100).cast("long")).as("qty_cents"),
          sum(floor(col("l_extendedprice") * 100).cast("long"))
            .as("price_cents"))
        .orderBy(col("l_returnflag"))
    },

    // Expectation quarantine, final state of BOTH tables: accepted rows
    // land in main (tag ''), violators in the sidecar tagged with
    // exactly the expectations they failed, in declaration order. The
    // oracle recomputes the routing with CASE logic over the base table.
    QueryDef.sqlBacked(
      "q139_quarantine",
      """WITH routed AS (
        |  SELECT CASE WHEN l_orderkey % 4 = 0 THEN ''
        |    ELSE CONCAT_WS(';',
        |      CASE WHEN l_discount > 0.08 THEN 'l_discount <= 0.08' END,
        |      CASE WHEN l_quantity > 45 THEN 'l_quantity <= 45' END)
        |    END AS tag,
        |    l_quantity
        |  FROM lineitem
        |  WHERE l_orderkey % 4 <> 0
        |     OR (l_discount <= 0.08 AND l_quantity <= 45))
        |SELECT tag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents
        |FROM routed GROUP BY tag
        |ORDER BY tag""".stripMargin) { (s, dir) =>
      val (main, quar) = quarantineFixture(s, dir)
      SnapshotReader.read(s, main)
        .withColumn("tag", lit(""))
        .unionByName(SnapshotReader.read(s, quar)
          .withColumnRenamed("_violated", "tag"))
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_quantity") * 100).cast("long")).as("qty_cents"))
        .orderBy(col("tag"))
    },

    // SCD Type-2 history build (operators.Scd2): the table's version
    // history becomes per-key validity intervals — updates close and
    // reopen, deletions close (tombstone anti-joins make absence
    // explicit), inserts open mid-history. The output aggregates
    // intervals by (valid_from, valid_to); every class count and
    // cents total is derivable straight from lineitem's modular
    // arithmetic.
    QueryDef.sqlBacked(
      "q133_scd2_history",
      """WITH k AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
        |             COUNT(*) AS m,
        |             SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS c
        |           FROM lineitem GROUP BY 1, 2),
        |iv AS (
        |  SELECT 0 AS vf, NULL AS vt, c FROM k
        |    WHERE ok % 7 = 0 AND ok % 14 <> 0 AND ok % 3 <> 0
        |  UNION ALL SELECT 0, 2, c FROM k
        |    WHERE ok % 7 = 0 AND ok % 14 <> 0 AND ok % 3 = 0
        |  UNION ALL SELECT 0, 1, c FROM k WHERE ok % 14 = 0
        |  UNION ALL SELECT 1, NULL, c + 10000 * m FROM k
        |    WHERE ok % 14 = 0 AND ok % 3 <> 0
        |  UNION ALL SELECT 1, NULL, c FROM k
        |    WHERE ok % 9 = 0 AND ok % 7 <> 0 AND ok % 3 <> 0
        |  UNION ALL SELECT 1, 2, c + 10000 * m FROM k
        |    WHERE ok % 14 = 0 AND ok % 3 = 0
        |  UNION ALL SELECT 1, 2, c FROM k
        |    WHERE ok % 9 = 0 AND ok % 7 <> 0 AND ok % 3 = 0)
        |SELECT CAST(vf AS BIGINT) AS valid_from,
        |  CAST(vt AS BIGINT) AS valid_to,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(c) AS BIGINT) AS cents_total
        |FROM iv GROUP BY vf, vt
        |ORDER BY valid_from, valid_to""".stripMargin) { (s, dir) =>
      val table = scd2Fixture(s, dir)
      graft.operators.Scd2.intervals(s, table,
          Seq("l_orderkey", "l_linenumber"),
          floor(col("l_quantity") * 100))
        .groupBy(col("valid_from"), col("valid_to"))
        .agg(count(lit(1)).as("n_keys"), sum(col("cents")).as("cents_total"))
        .orderBy(col("valid_from"), col("valid_to"))
    },

    // INCREMENTALLY-maintained SCD2 history: the intervals table was
    // seeded after v0 and refreshed per version (each refresh costing
    // only that version's changed keys) — and its final state must hash-
    // match the same modular enumeration q133's from-scratch build does.
    // Same oracle, different machinery: this is the maintained-dimension
    // twin.
    QueryDef.sqlBacked(
      "q142_scd2_incremental",
      """WITH k AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
        |             COUNT(*) AS m,
        |             SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS c
        |           FROM lineitem GROUP BY 1, 2),
        |iv AS (
        |  SELECT 0 AS vf, NULL AS vt, c FROM k
        |    WHERE ok % 7 = 0 AND ok % 14 <> 0 AND ok % 3 <> 0
        |  UNION ALL SELECT 0, 2, c FROM k
        |    WHERE ok % 7 = 0 AND ok % 14 <> 0 AND ok % 3 = 0
        |  UNION ALL SELECT 0, 1, c FROM k WHERE ok % 14 = 0
        |  UNION ALL SELECT 1, NULL, c + 10000 * m FROM k
        |    WHERE ok % 14 = 0 AND ok % 3 <> 0
        |  UNION ALL SELECT 1, NULL, c FROM k
        |    WHERE ok % 9 = 0 AND ok % 7 <> 0 AND ok % 3 <> 0
        |  UNION ALL SELECT 1, 2, c + 10000 * m FROM k
        |    WHERE ok % 14 = 0 AND ok % 3 = 0
        |  UNION ALL SELECT 1, 2, c FROM k
        |    WHERE ok % 9 = 0 AND ok % 7 <> 0 AND ok % 3 = 0)
        |SELECT CAST(vf AS BIGINT) AS valid_from,
        |  CAST(vt AS BIGINT) AS valid_to,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(c) AS BIGINT) AS cents_total
        |FROM iv GROUP BY vf, vt
        |ORDER BY valid_from, valid_to""".stripMargin) { (s, dir) =>
      val hist = scd2IncFixture(s, dir)
      SnapshotReader.read(s, hist)
        .groupBy(col("valid_from"), col("valid_to"))
        .agg(count(lit(1)).as("n_keys"), sum(col("cents")).as("cents_total"))
        .orderBy(col("valid_from"), col("valid_to"))
    },

    // Generated partition column, final state: both writes OMIT o_month
    // (the engine computes it from the declared expression), the range
    // filter lands on the generated column (file-level partition
    // pruning), and the result must equal a recompute straight from
    // orders. Cents-exact sums keep the cross-engine hash stable.
    QueryDef.sqlBacked(
      "q127_generated_partition",
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM orders
        |WHERE (o_orderkey % 5 = 0
        |    OR (o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0))
        |  AND strftime(o_orderdate, '%Y-%m') BETWEEN '1996-01' AND '1997-06'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val table = generatedFixture(s, dir)
      SnapshotReader.read(s, table)
        .filter(col("o_month").between("1996-01", "1997-06"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy(col("o_orderstatus"))
    },

    // Version diff — the semantic "what changed between two snapshots"
    // operator (audit/debug companion to CDC's event stream): time-travel
    // both states, reduce each to per-KEY aggregates (count + cents sum —
    // the multiset-diff granularity; a row-level outer join would explode
    // on repeated keys), ONE full outer join, classify added/removed/
    // updated/unchanged, and report integer-exact class counts plus the
    // updated keys' cents-exact quantity drift. Works on any two versions
    // regardless of how many commits or rewrites lie between;
    // file-granular CDC would re-emit rewritten-but-unchanged rows, which
    // is exactly what a state diff ignores.
    QueryDef.sqlBacked(
      "q129_version_diff",
      """WITH k AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)
        |SELECT 'added' AS change,
        |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 9 = 0
        |    AND l_orderkey % 7 <> 0) AS BIGINT) AS n,
        |  CAST(0 AS BIGINT) AS qty_drift_cents
        |FROM k
        |UNION ALL
        |SELECT 'removed', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |UNION ALL
        |SELECT 'unchanged',
        |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 7 = 0
        |    AND l_orderkey % 14 <> 0) AS BIGINT),
        |  CAST(0 AS BIGINT)
        |FROM k
        |UNION ALL
        |SELECT 'updated',
        |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 14 = 0) AS BIGINT),
        |  (SELECT CAST(10000 * COUNT(*) FILTER (WHERE l_orderkey % 14 = 0)
        |     AS BIGINT) FROM lineitem)
        |FROM k
        |ORDER BY change""".stripMargin) { (s, dir) =>
      val table = mergeFixture(s, dir)
      val keys = Seq("l_orderkey", "l_linenumber")
      def state(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as(s"${tag}_n"),
            sum(floor(col("l_quantity") * 100).cast("long"))
              .as(s"${tag}_cents"))
      val before = state(
        SnapshotReader.read(s, table, versionAsOf = Some(0L)), "old")
      val after = state(SnapshotReader.read(s, table), "new")
      val agg = before.join(after, keys, "full_outer")
        .select(
          when(col("old_n").isNull, "added")
            .when(col("new_n").isNull, "removed")
            .when(col("old_n") =!= col("new_n") ||
              col("old_cents") =!= col("new_cents"), "updated")
            .otherwise("unchanged").as("change"),
          coalesce(col("new_cents"), lit(0L))
            .minus(coalesce(col("old_cents"), lit(0L))).as("drift"))
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("change") === "updated", col("drift")).otherwise(0L))
            .as("qty_drift_cents"))
      // classes absent from the diff still report (n=0) so the output
      // shape is stable — mirrors the oracle's static UNION
      import s.implicits._
      Seq("added", "removed", "unchanged", "updated").toDF("change")
        .join(agg, Seq("change"), "left")
        .select(col("change"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("qty_drift_cents"), lit(0L)).as("qty_drift_cents"))
        .orderBy(col("change"))
    },

    // Metadata-only RENAME COLUMN (column mapping), final state: the
    // rename touches zero data files, the post-rename append writes
    // under the creation-time PHYSICAL name, and the delete filters on
    // the LOGICAL name — all derivable straight from lineitem. A
    // mapping-blind reader would aggregate nulls here (ColumnMappingSpec
    // pins the file-level invariants; this pins the answer).
    QueryDef.sqlBacked(
      "q126_column_rename",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE (l_orderkey % 7 = 0
        |    OR (l_orderkey % 11 = 0 AND l_orderkey % 7 <> 0))
        |  AND l_quantity <= 40
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val table = renameFixture(s, dir)
      SnapshotReader.read(s, table)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    },
    // Shallow clone + copy-on-write divergence: the clone (append + a
    // rewrite-delete after the zero-copy CLONE commit) and its UNTOUCHED
    // source both read correct states — each derivable from lineitem.
    QueryDef.sqlBacked(
      "q96_shallow_clone",
      """SELECT side, l_returnflag, n, sum_qty FROM (
        |  SELECT 'src' AS side, l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(l_quantity) AS sum_qty
        |  FROM lineitem WHERE l_orderkey % 7 = 0
        |  GROUP BY l_returnflag
        |  UNION ALL
        |  SELECT 'clone' AS side, l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(l_quantity) AS sum_qty
        |  FROM (SELECT l_returnflag, l_quantity, l_suppkey FROM lineitem
        |        WHERE l_orderkey % 7 = 0
        |        UNION ALL
        |        SELECT l_returnflag, l_quantity, l_suppkey FROM lineitem
        |        WHERE l_orderkey % 11 = 0)
        |  WHERE l_suppkey % 4 <> 0
        |  GROUP BY l_returnflag)
        |ORDER BY side, l_returnflag""".stripMargin) { (s, dir) =>
      val (src, dst) = cloneFixture(s, dir)
      val srcAgg = SnapshotReader.read(s, src)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(lit("src").as("side"), col("l_returnflag"), col("n"),
          col("sum_qty"))
      val cloneAgg = SnapshotReader.read(s, dst)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(lit("clone").as("side"), col("l_returnflag"), col("n"),
          col("sum_qty"))
      srcAgg.unionAll(cloneAgg).orderBy(col("side"), col("l_returnflag"))
    },
    // Compaction invariance: replaying CDC across a compaction commit
    // yields exactly the logical appends (a leaked reorganization event
    // would inflate cdc_c), and the compacted snapshot holds the same
    // rows. Both derivable straight from lineitem.
    QueryDef.sqlBacked(
      "q65_compaction_invariance",
      """SELECT 'cdc_c' AS metric,
        |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 7 = 0)
        |    + COUNT(*) FILTER (WHERE l_orderkey % 11 = 0) AS BIGINT) AS n
        |FROM lineitem
        |UNION ALL
        |SELECT 'snapshot_rows' AS metric,
        |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 7 = 0)
        |    + COUNT(*) FILTER (WHERE l_orderkey % 11 = 0) AS BIGINT) AS n
        |FROM lineitem
        |ORDER BY metric""".stripMargin) { (s, dir) =>
      val table = compactionFixture(s, dir)
      val cdcC = CdcReader.cdc(s, table, startingVersion = 0L,
        includeHistory = true)
        .filter(col("op") === "c")
        .agg(count(lit(1)).as("n"))
        .select(lit("cdc_c").as("metric"), col("n"))
      val snapRows = SnapshotReader.read(s, table)
        .agg(count(lit(1)).as("n"))
        .select(lit("snapshot_rows").as("metric"), col("n"))
      cdcC.unionAll(snapRows).orderBy(col("metric"))
    },

    // MERGE / upsert: post-merge snapshot aggregate is derivable from
    // lineitem (updates add 100 to every %14 row's quantity; inserts are
    // the %9-not-%7 rows).
    QueryDef.sqlBacked(
      "q67_merge_upsert",
      """SELECT
        |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 7 = 0)
        |    + COUNT(*) FILTER (WHERE l_orderkey % 9 = 0 AND l_orderkey % 7 <> 0)
        |    AS BIGINT) AS n,
        |  COALESCE(SUM(l_quantity) FILTER (WHERE l_orderkey % 7 = 0), 0)
        |    + 100 * COUNT(*) FILTER (WHERE l_orderkey % 14 = 0)
        |    + COALESCE(SUM(l_quantity) FILTER (WHERE l_orderkey % 9 = 0
        |        AND l_orderkey % 7 <> 0), 0) AS qty
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val table = mergeFixture(s, dir)
      SnapshotReader.read(s, table)
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    },

    // Row-level DELETE: the snapshot holds exactly the non-matching rows.
    QueryDef.sqlBacked(
      "q68_row_delete",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(l_quantity) AS qty
        |FROM lineitem
        |WHERE l_orderkey % 7 = 0 AND l_suppkey % 5 <> 0""".stripMargin) { (s, dir) =>
      val table = deleteFixture(s, dir)
      SnapshotReader.read(s, table)
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    },

    // Deletion-vector DELETE: neither delete rewrites a data file, yet
    // every read — current AND time-traveled — subtracts the dead rows,
    // and the second delete unions into the first file's vector. The
    // per-version states are derivable straight from lineitem.
    QueryDef.sqlBacked(
      "q85_dv_delete",
      """SELECT 'v1' AS metric,
        |  CAST(COUNT(*) FILTER (WHERE l_suppkey % 5 <> 0) AS BIGINT) AS n,
        |  COALESCE(SUM(l_quantity) FILTER (WHERE l_suppkey % 5 <> 0), 0) AS qty
        |FROM lineitem WHERE l_orderkey % 7 = 0
        |UNION ALL
        |SELECT 'v2' AS metric,
        |  CAST(COUNT(*) FILTER (WHERE l_suppkey % 5 <> 0
        |    AND l_partkey % 3 <> 0) AS BIGINT) AS n,
        |  COALESCE(SUM(l_quantity) FILTER (WHERE l_suppkey % 5 <> 0
        |    AND l_partkey % 3 <> 0), 0) AS qty
        |FROM lineitem WHERE l_orderkey % 7 = 0
        |ORDER BY metric""".stripMargin) { (s, dir) =>
      val table = dvFixture(s, dir)
      val v1 = SnapshotReader.read(s, table, versionAsOf = Some(1L))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("l_quantity")), lit(0.0)).as("qty"))
        .select(lit("v1").as("metric"), col("n"), col("qty"))
      val v2 = SnapshotReader.read(s, table)
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("l_quantity")), lit(0.0)).as("qty"))
        .select(lit("v2").as("metric"), col("n"), col("qty"))
      v1.unionAll(v2).orderBy(col("metric"))
    },

    // Stats-based file skipping: the range read prunes the file list by
    // AddFile footer stats before the scan; result must equal the plain
    // predicate (CompactionSpec asserts the pruning itself).
    QueryDef.sqlBacked(
      "q66_data_skipping",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(l_quantity) AS qty
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 100 AND 2000""".stripMargin) { (s, dir) =>
      val table = skippingFixture(s, dir)
      DataSkipping.readRange(s, table, "l_orderkey", 100L, 2000L)
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    },

    // RESTORE: roll the table back to v0 as a NEW commit — history stays
    // (pre-restore v2 is still time-travelable), the latest read sees
    // exactly the v0 rows again, and the append + rewrite-delete between
    // are undone. Both states are derivable straight from lineitem.
    QueryDef.sqlBacked(
      "q111_restore",
      """SELECT 'post_restore' AS state, CAST(COUNT(*) AS BIGINT) AS n,
        |  SUM(l_quantity) AS qty
        |FROM lineitem WHERE l_orderkey % 7 = 0
        |UNION ALL
        |SELECT 'pre_restore' AS state,
        |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 7 = 0 AND l_suppkey % 4 <> 0)
        |    + COUNT(*) FILTER (WHERE l_orderkey % 11 = 0 AND l_suppkey % 4 <> 0)
        |    AS BIGINT) AS n,
        |  COALESCE(SUM(l_quantity) FILTER (WHERE l_orderkey % 7 = 0
        |      AND l_suppkey % 4 <> 0), 0)
        |    + COALESCE(SUM(l_quantity) FILTER (WHERE l_orderkey % 11 = 0
        |      AND l_suppkey % 4 <> 0), 0) AS qty
        |FROM lineitem
        |ORDER BY state""".stripMargin) { (s, dir) =>
      val table = restoreFixture(s, dir)
      val post = SnapshotReader.read(s, table)
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .select(lit("post_restore").as("state"), col("n"), col("qty"))
      val pre = SnapshotReader.read(s, table, versionAsOf = Some(2L))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .select(lit("pre_restore").as("state"), col("n"), col("qty"))
      post.unionAll(pre).orderBy(col("state"))
    },

    // Schema evolution + CHECK constraints, final state: the evolved
    // append carries a new column, files written BEFORE the evolution
    // surface it as NULL (declared-schema read), and the constraint added
    // at v1 still guards the v2 write (ConstraintSpec pins the rejection
    // path; here the accepted state hash-matches the oracle).
    QueryDef.sqlBacked(
      "q112_schema_evolution",
      """SELECT
        |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 7 = 0)
        |    + COUNT(*) FILTER (WHERE l_orderkey % 11 = 0) AS BIGINT) AS n,
        |  COALESCE(SUM(l_quantity) FILTER (WHERE l_orderkey % 7 = 0), 0)
        |    + COALESCE(SUM(l_quantity) FILTER (WHERE l_orderkey % 11 = 0), 0)
        |    AS qty,
        |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 7 = 0) AS BIGINT)
        |    AS n_null_qty2,
        |  COALESCE(SUM(l_quantity * 2) FILTER (WHERE l_orderkey % 11 = 0), 0)
        |    AS sum_qty2
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val table = evolutionFixture(s, dir)
      SnapshotReader.read(s, table)
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).as("qty"),
          count(when(col("qty2").isNull, lit(1))).as("n_null_qty2"),
          coalesce(sum(col("qty2")), lit(0.0)).as("sum_qty2"))
    },

    // Z-order + predicate-DERIVED skipping, final state: the 2-D
    // clustered layout is read back through readWhere, which derives
    // (l_orderkey, l_suppkey) ranges from the predicate itself, prunes
    // the file list by footer stats, and applies the full residual
    // filter — the result must equal the plain predicate over lineitem
    // regardless of how much was pruned (CompactionSpec pins the pruning
    // counts; this pins the answer).
    QueryDef.sqlBacked(
      "q113_zorder_skipping",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(l_quantity) AS qty
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 500 AND 5000 AND l_suppkey <= 50""".stripMargin) { (s, dir) =>
      val table = zorderFixture(s, dir)
      DataSkipping.readWhere(s, table,
          col("l_orderkey").between(500L, 5000L) && col("l_suppkey") <= 50L)
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    },

    // MERGE full-sync final state (the partition re-load shape): after
    // syncing the 'R' slice to a source that updates, omits, and adds
    // rows, the per-flag totals must equal the SQL recompute — non-R
    // groups show the untouched v0 state, R shows exactly the source.
    QueryDef.sqlBacked(
      "q152_merge_full_sync",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, SUM(q) AS qty
        |FROM (
        |  SELECT l_returnflag, l_quantity + CASE
        |      WHEN l_returnflag = 'R' AND l_orderkey % 7 = 0 THEN 100
        |      ELSE 0 END AS q
        |  FROM lineitem
        |  WHERE (l_returnflag <> 'R' AND l_orderkey % 7 = 0)
        |     OR (l_returnflag = 'R' AND l_orderkey % 7 = 0
        |         AND l_orderkey % 5 <> 0)
        |     OR (l_returnflag = 'R' AND l_orderkey % 11 = 0
        |         AND l_orderkey % 7 <> 0))
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val table = fullSyncFixture(s, dir)
      SnapshotReader.read(s, table)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag"))
    },

    // Symlink-manifest export: the table is read back THROUGH the
    // exported manifest — a bare parquet file list, no log, the view an
    // external engine (Trino-style external table, DuckDB read_parquet)
    // gets — and must land exactly on the SQL recompute of the fixture.
    // DV-carrying snapshots refuse to export (a manifest reader would
    // resurrect deleted rows); ManifestSpec pins that and staleness.
    QueryDef.sqlBacked(
      "q155_manifest_export",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  SUM(l_quantity) AS qty
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val table = skippingFixture(s, dir)
      Manifest.generate(s, table)
      Manifest.read(s, table)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag"))
    },

    // Batch DataSource V2 (`spark.read.format("graft")`): the filter is
    // pushed into the scan — file-level stats pruning happens inside
    // Catalyst's pushdown negotiation (GraftBatchSpec pins the pruned
    // partition count; the 6 range-partitioned files make the prune
    // real) — and the residual still applies, so the answer must equal
    // the plain SQL regardless of pruning.
    QueryDef.sqlBacked(
      "q173_dsv2_scan",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  SUM(l_quantity) AS qty
        |FROM lineitem WHERE l_orderkey BETWEEN 100 AND 2000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val table = skippingFixture(s, dir)
      s.read.format("graft").option("tablePath", table).load()
        .filter(col("l_orderkey").between(100L, 2000L))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag"))
    },

    // Batch DSv2 over a deletion-vector table: the scan must apply both
    // generations of vectors (suppkey%5 at v1, partkey%3 unioned at v2)
    // without any file having been rewritten — the DV-aware read is the
    // source's default path, not a special API.
    QueryDef.sqlBacked(
      "q174_dsv2_dv_read",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  SUM(l_quantity) AS qty
        |FROM lineitem
        |WHERE l_orderkey % 7 = 0 AND l_suppkey % 5 <> 0
        |  AND l_partkey % 3 <> 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val table = dvFixture(s, dir)
      s.read.format("graft").option("tablePath", table).load()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag"))
    },

    // The SQL catalog surface end-to-end: CREATE TABLE AS SELECT into
    // the graft TableCatalog, then the analytic query runs as plain SQL
    // against `gcat.default.events_copy` — DDL, the V1Write bridge
    // (txn-log commit, footer stats), and the pushdown-negotiating read
    // all under one hash-checked result. Cents via FLOOR on both sides
    // (DuckDB CAST rounds, Spark truncates — FLOOR pins them equal).
    QueryDef.sqlBacked(
      "q181_sql_catalog",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      s.sql("DROP TABLE IF EXISTS gcat.default.events_copy")
      s.sql(
        """CREATE TABLE gcat.default.events_copy AS
          |SELECT event_id, event_type, value FROM events_src""".stripMargin)
      s.sql(
        """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          |  SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS cents
          |FROM gcat.default.events_copy
          |GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // Temporal (point-in-time) join against the SCD2 dimension: each
    // fact key queries the interval that was valid at ITS version
    // (vf <= qv < vt) — the warehouse-correctness join that prevents
    // joining today's dimension state to yesterday's facts. The oracle
    // rebuilds the same interval set from lineitem arithmetic.
    QueryDef.sqlBacked(
      "q186_scd2_asof_join",
      """WITH k AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
        |             COUNT(*) AS m,
        |             SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS c
        |           FROM lineitem GROUP BY 1, 2),
        |iv AS (
        |  SELECT ok, ln, 0 AS vf, NULL AS vt, c FROM k
        |    WHERE ok % 7 = 0 AND ok % 14 <> 0 AND ok % 3 <> 0
        |  UNION ALL SELECT ok, ln, 0, 2, c FROM k
        |    WHERE ok % 7 = 0 AND ok % 14 <> 0 AND ok % 3 = 0
        |  UNION ALL SELECT ok, ln, 0, 1, c FROM k WHERE ok % 14 = 0
        |  UNION ALL SELECT ok, ln, 1, NULL, c + 10000 * m FROM k
        |    WHERE ok % 14 = 0 AND ok % 3 <> 0
        |  UNION ALL SELECT ok, ln, 1, NULL, c FROM k
        |    WHERE ok % 9 = 0 AND ok % 7 <> 0 AND ok % 3 <> 0
        |  UNION ALL SELECT ok, ln, 1, 2, c + 10000 * m FROM k
        |    WHERE ok % 14 = 0 AND ok % 3 = 0
        |  UNION ALL SELECT ok, ln, 1, 2, c FROM k
        |    WHERE ok % 9 = 0 AND ok % 7 <> 0 AND ok % 3 = 0),
        |fq AS (SELECT ok, ln, ok % 3 AS qv
        |       FROM (SELECT DISTINCT ok, ln FROM iv))
        |SELECT CAST(qv AS BIGINT) AS qv,
        |  CAST(COUNT(*) AS BIGINT) AS n_matched,
        |  CAST(SUM(c) AS BIGINT) AS cents_total
        |FROM fq JOIN iv USING (ok, ln)
        |WHERE iv.vf <= fq.qv AND (iv.vt IS NULL OR fq.qv < iv.vt)
        |GROUP BY qv ORDER BY qv""".stripMargin) { (s, dir) =>
      val table = scd2Fixture(s, dir)
      val iv = graft.operators.Scd2.intervals(s, table,
        Seq("l_orderkey", "l_linenumber"), floor(col("l_quantity") * 100))
      val facts = iv.select(col("l_orderkey"), col("l_linenumber")).distinct()
        .withColumn("qv", pmod(col("l_orderkey"), lit(3)).cast("long"))
      facts.join(iv, Seq("l_orderkey", "l_linenumber"))
        .filter(col("valid_from") <= col("qv") &&
          (col("valid_to").isNull || col("qv") < col("valid_to")))
        .groupBy(col("qv"))
        .agg(count(lit(1)).as("n_matched"),
          sum(col("cents")).as("cents_total"))
        .orderBy(col("qv"))
    },

    // SQL catalog DML lifecycle under one hash: CTAS, INSERT INTO (the
    // rebase append path), then INSERT OVERWRITE (atomic truncate+load),
    // with the pre-overwrite state read back via SQL time travel
    // (VERSION AS OF) — so one row set certifies CTAS + INSERT +
    // OVERWRITE + time travel through the TableCatalog together.
    QueryDef.sqlBacked(
      "q188_sql_insert_overwrite",
      """WITH pre AS (
        |  SELECT event_id, event_type, value FROM events WHERE event_id % 5 = 0
        |  UNION ALL
        |  SELECT event_id, event_type, value FROM events WHERE event_id % 5 = 1),
        |fin AS (SELECT event_id, event_type, value * 2 AS value
        |        FROM events WHERE event_id % 3 = 0)
        |SELECT 'a_pre_overwrite' AS phase, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM pre
        |UNION ALL
        |SELECT 'b_final', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
        |FROM fin
        |ORDER BY phase""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      s.sql("DROP TABLE IF EXISTS gcat.default.events_iow")
      s.sql(
        """CREATE TABLE gcat.default.events_iow AS
          |SELECT event_id, event_type, value FROM events_src
          |WHERE event_id % 5 = 0""".stripMargin)
      s.sql(
        """INSERT INTO gcat.default.events_iow
          |SELECT event_id, event_type, value FROM events_src
          |WHERE event_id % 5 = 1""".stripMargin)
      val vPre = new TxnLog(s"$wh/default/events_iow",
        s.sessionState.newHadoopConf()).latestVersion().get
      s.sql(
        """INSERT OVERWRITE gcat.default.events_iow
          |SELECT event_id, event_type, value * 2 AS value FROM events_src
          |WHERE event_id % 3 = 0""".stripMargin)
      s.sql(
        s"""SELECT 'a_pre_overwrite' AS phase, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
           |FROM gcat.default.events_iow VERSION AS OF $vPre
           |UNION ALL
           |SELECT 'b_final', CAST(COUNT(*) AS BIGINT),
           |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
           |FROM gcat.default.events_iow
           |ORDER BY phase""".stripMargin)
    },

    // SQL DELETE + TRUNCATE through the catalog, certified via time
    // travel: the post-DELETE state is read back with VERSION AS OF
    // after a TRUNCATE emptied the current snapshot — one row set pins
    // the versioned rewrite, the metadata-only truncate, and history
    // retention together.
    QueryDef.sqlBacked(
      "q189_sql_delete_truncate",
      """SELECT 'a_after_delete' AS phase, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COALESCE(SUM(CAST(FLOOR(value * 100) AS BIGINT)), 0) AS BIGINT)
        |    AS cents
        |FROM events WHERE event_id % 4 = 0 AND event_type <> 'click'
        |UNION ALL
        |SELECT 'b_after_truncate', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |ORDER BY phase""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      s.sql("DROP TABLE IF EXISTS gcat.default.events_del")
      s.sql(
        """CREATE TABLE gcat.default.events_del AS
          |SELECT event_id, event_type, value FROM events_src
          |WHERE event_id % 4 = 0""".stripMargin)
      s.sql("DELETE FROM gcat.default.events_del WHERE event_type = 'click'")
      val vDel = new TxnLog(s"$wh/default/events_del",
        s.sessionState.newHadoopConf()).latestVersion().get
      s.sql("TRUNCATE TABLE gcat.default.events_del")
      s.sql(
        s"""SELECT 'a_after_delete' AS phase, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(COALESCE(SUM(CAST(FLOOR(value * 100) AS BIGINT)), 0)
           |    AS BIGINT) AS cents
           |FROM gcat.default.events_del VERSION AS OF $vDel
           |UNION ALL
           |SELECT 'b_after_truncate', CAST(COUNT(*) AS BIGINT),
           |  CAST(COALESCE(SUM(CAST(FLOOR(value * 100) AS BIGINT)), 0)
           |    AS BIGINT)
           |FROM gcat.default.events_del
           |ORDER BY phase""".stripMargin)
    },

    // Commit rebase, fixture-final-state: writer A stages its append,
    // an interleaved commit B lands BETWEEN A's snapshot read and A's
    // commit (the onStaged seam), and appendRebasing verifies
    // commutativity and rebases A onto B's version instead of failing —
    // the final table must equal base ∪ B ∪ A exactly.
    QueryDef.sqlBacked(
      "q190_commit_rebase",
      """WITH t AS (
        |  SELECT n_nationkey, n_regionkey FROM nation
        |  UNION ALL SELECT n_nationkey + 100, n_regionkey FROM nation
        |  UNION ALL SELECT n_nationkey + 200, n_regionkey FROM nation)
        |SELECT CAST(n_nationkey // 100 AS BIGINT) AS gen,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_regionkey) AS BIGINT) AS rk_sum
        |FROM t GROUP BY 1 ORDER BY gen""".stripMargin) { (s, dir) =>
      val table = rebaseFixture(s, dir)
      s.read.format("graft").option("tablePath", table).load()
        .groupBy((col("n_nationkey") / 100).cast("long").as("gen"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_regionkey")).cast("long").as("rk_sum"))
        .orderBy(col("gen"))
    },

    // Optimistic-concurrency retry, fixture-final-state: the writer's
    // first attempt loses the version race to a planted racer commit and
    // retries against the fresh snapshot (full re-execution — the
    // serializable end of the protocol); the final table must hold base
    // ∪ racer ∪ writer exactly, proving the loser neither dropped its
    // rows nor double-committed.
    QueryDef.sqlBacked(
      "q191_optimistic_retry",
      """WITH t AS (
        |  SELECT s_suppkey, s_nationkey FROM supplier
        |  UNION ALL SELECT s_suppkey + 10000, s_nationkey FROM supplier
        |  UNION ALL SELECT s_suppkey + 20000, s_nationkey FROM supplier
        |  WHERE s_suppkey % 2 = 0)
        |SELECT CAST(s_suppkey // 10000 AS BIGINT) AS gen,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(s_nationkey) AS BIGINT) AS nk_sum
        |FROM t GROUP BY 1 ORDER BY gen""".stripMargin) { (s, dir) =>
      val table = optimisticRetryFixture(s, dir)
      s.read.format("graft").option("tablePath", table).load()
        .groupBy((col("s_suppkey") / 10000).cast("long").as("gen"))
        .agg(count(lit(1)).as("n"),
          sum(col("s_nationkey")).cast("long").as("nk_sum"))
        .orderBy(col("gen"))
    },

    // Streaming table read drain: readStream over the DSv2 table surface
    // (snapshot batch + one batch per appended commit), aggregated
    // map-side per micro-batch; totals are batch-boundary-invariant, so
    // the oracle recomputes them from the fixture's source arithmetic.
    QueryDef.sqlBacked(
      "q192_stream_table_read",
      """WITH t AS (
        |  SELECT n_nationkey, n_regionkey FROM nation
        |  UNION ALL SELECT n_nationkey + 100, n_regionkey FROM nation
        |  UNION ALL SELECT n_nationkey + 200, n_regionkey FROM nation
        |  WHERE n_nationkey % 2 = 0)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(n_regionkey) AS BIGINT) AS rk_sum
        |FROM t""".stripMargin) { (s, dir) =>
      val table = streamTailFixture(s, dir)
      val totals = new java.util.concurrent.atomic.AtomicReference(
        (0L, 0L, 0L))
      val q = s.readStream.format("graft").option("tablePath", table).load()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val r = batch.agg(count(lit(1)), sum(col("n_nationkey")),
            sum(col("n_regionkey"))).head()
          if (r.getLong(0) > 0) {
            val add = (r.getLong(0), r.getLong(1), r.getLong(2))
            totals.updateAndGet(t =>
              (t._1 + add._1, t._2 + add._2, t._3 + add._3))
          }
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("gtbl_stream_ck").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      import s.implicits._
      val (n, ks, rs) = totals.get()
      Seq((n, ks, rs)).toDF("n_rows", "key_sum", "rk_sum")
    },

    // SQL ALTER TABLE lifecycle through the catalog: CTAS, ADD COLUMNS
    // (schema-evolution commit — the pre-evolution file surfaces the
    // column as null), INSERT with the evolved shape, then RENAME
    // COLUMN (metadata-only column mapping) — and the final SELECT uses
    // the NEW name over files written under the OLD physical name. One
    // hash-checked row certifies the whole DDL chain.
    QueryDef.sqlBacked(
      "q205_sql_alter_lifecycle",
      """WITH a AS (SELECT event_id, value, NULL::BIGINT AS cents
        |  FROM events WHERE event_id % 6 = 0),
        |b AS (SELECT event_id + 1000000 AS event_id, value,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_id % 6 = 1),
        |t AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS cents_sum,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
        |    AS amount_cents
        |FROM t""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      s.sql("DROP TABLE IF EXISTS gcat.default.events_alter")
      s.sql(
        """CREATE TABLE gcat.default.events_alter AS
          |SELECT event_id, value FROM events_src
          |WHERE event_id % 6 = 0""".stripMargin)
      s.sql("ALTER TABLE gcat.default.events_alter ADD COLUMNS (cents BIGINT)")
      s.sql(
        """INSERT INTO gcat.default.events_alter
          |SELECT event_id + 1000000 AS event_id, value,
          |  CAST(FLOOR(value * 100) AS BIGINT) AS cents
          |FROM events_src WHERE event_id % 6 = 1""".stripMargin)
      s.sql("ALTER TABLE gcat.default.events_alter RENAME COLUMN value TO amount")
      s.sql(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS cents_sum,
          |  CAST(SUM(CAST(FLOOR(amount * 100) AS BIGINT)) AS BIGINT)
          |    AS amount_cents
          |FROM gcat.default.events_alter""".stripMargin)
    },

    // Atomic REPLACE TABLE AS SELECT (StagingTableCatalog): the staged
    // write + removes of the old snapshot + the NEW schema land in ONE
    // commit, and the pre-REPLACE state stays time-travelable — both
    // phases certified under one hash against recomputed anchors.
    QueryDef.sqlBacked(
      "q206_sql_replace_table",
      """SELECT 'a_replaced' AS phase, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 200) AS BIGINT)) AS BIGINT) AS cents
        |FROM events WHERE event_id % 9 = 0
        |UNION ALL
        |SELECT 'b_original', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
        |FROM events WHERE event_id % 7 = 0
        |ORDER BY phase""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      s.sql("DROP TABLE IF EXISTS gcat.default.events_rt")
      s.sql(
        """CREATE TABLE gcat.default.events_rt AS
          |SELECT event_id, value FROM events_src
          |WHERE event_id % 7 = 0""".stripMargin)
      val vOld = new TxnLog(s"$wh/default/events_rt",
        s.sessionState.newHadoopConf()).latestVersion().get
      s.sql(
        """REPLACE TABLE gcat.default.events_rt AS
          |SELECT event_id, event_type,
          |  CAST(FLOOR(value * 200) AS BIGINT) AS double_cents
          |FROM events_src WHERE event_id % 9 = 0""".stripMargin)
      s.sql(
        s"""SELECT 'a_replaced' AS phase, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(double_cents) AS BIGINT) AS cents
           |FROM gcat.default.events_rt
           |UNION ALL
           |SELECT 'b_original', CAST(COUNT(*) AS BIGINT),
           |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
           |FROM gcat.default.events_rt VERSION AS OF $vOld
           |ORDER BY phase""".stripMargin)
    },

    // SQL MERGE INTO + UPDATE through the group-based copy-on-write
    // row-level operation (RowLevelSpec pins atomicity and the
    // untouched-group contract; this row certifies VALUES end-to-end):
    // matched keys take the source's cents, unmatched keys insert, then
    // an UPDATE bumps a slice — the final state recomputed by DuckDB
    // from the same arithmetic. COW is now the OPT-OUT (merge-on-read
    // is the engine default since round 13), so this row pins the
    // opt-out explicitly; q332 is the default-path twin.
    QueryDef.sqlBacked(
      "q208_sql_merge_update",
      """WITH t AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_id % 8 = 0 AND event_id % 16 <> 0
        |  UNION ALL
        |  SELECT event_id, CAST(FLOOR(value * 200) AS BIGINT)
        |  FROM events WHERE event_id % 16 = 0
        |  UNION ALL
        |  SELECT event_id, CAST(FLOOR(value * 200) AS BIGINT)
        |  FROM events WHERE event_id % 8 = 3),
        |u AS (SELECT event_id,
        |    cents + CASE WHEN event_id % 5 = 0 THEN 7 ELSE 0 END AS cents
        |  FROM t)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM u""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      s.sql("DROP TABLE IF EXISTS gcat.default.events_merge")
      s.sql(
        """CREATE TABLE gcat.default.events_merge AS
          |SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
          |FROM events_src WHERE event_id % 8 = 0""".stripMargin)
      s.sql(
        """SELECT event_id, CAST(FLOOR(value * 200) AS BIGINT) AS cents
          |FROM events_src
          |WHERE event_id % 16 = 0 OR event_id % 8 = 3""".stripMargin)
        .createOrReplaceTempView("merge_src")
      s.conf.set("spark.graft.update.mode", "cow")
      try {
        s.sql(
          """MERGE INTO gcat.default.events_merge t USING merge_src s
            |ON t.event_id = s.event_id
            |WHEN MATCHED THEN UPDATE SET t.cents = s.cents
            |WHEN NOT MATCHED THEN INSERT (event_id, cents)
            |  VALUES (s.event_id, s.cents)""".stripMargin)
        s.sql(
          """UPDATE gcat.default.events_merge SET cents = cents + 7
            |WHERE event_id % 5 = 0""".stripMargin)
      } finally s.conf.unset("spark.graft.update.mode")
      s.sql(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
          |  CAST(SUM(event_id) AS BIGINT) AS id_sum
          |FROM gcat.default.events_merge""".stripMargin)
    },

    // DESCRIBE HISTORY as SQL: the graft_history table function over
    // the restore fixture, whose commit sequence (and deterministic
    // commitTs values) IS the oracle — write, append, delete-rewrite,
    // restore, newest first.
    QueryDef.sqlBacked(
      "q209_sql_history",
      """SELECT * FROM (VALUES
        |  (CAST(3 AS BIGINT), 'RESTORE', CAST(4000 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'DELETE',  CAST(3000 AS BIGINT)),
        |  (CAST(1 AS BIGINT), 'WRITE',   CAST(2000 AS BIGINT)),
        |  (CAST(0 AS BIGINT), 'WRITE',   CAST(1000 AS BIGINT)))
        |  t(version, operation, commit_ts)
        |ORDER BY version DESC""".stripMargin) { (s, dir) =>
      val table = restoreFixture(s, dir)
      graft.functions.GraftExtensions.install(s)
      s.sql(
        s"""SELECT version, operation, commit_ts
           |FROM graft_history('$table')
           |ORDER BY version DESC""".stripMargin)
    },

    // MERGE/UPDATE into a table with BOTH a CHECK constraint and a
    // generated partition column: the row-level write validates the
    // replacement rows (one-pass constraint + generated-column
    // agreement, same rules as the append path) before committing —
    // the combination the r7 surface refused. The merge UPDATE leaves
    // the generated band untouched (agreement preserved); the INSERT
    // branch supplies it explicitly and validation certifies it; the
    // final per-band rollup recomputes the same arithmetic in DuckDB.
    QueryDef.sqlBacked(
      "q211_sql_merge_constrained",
      """WITH t AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_id % 8 = 0 AND event_id % 16 <> 0
        |  UNION ALL
        |  SELECT event_id, CAST(FLOOR(value * 200) AS BIGINT)
        |  FROM events WHERE event_id % 16 = 0
        |  UNION ALL
        |  SELECT event_id, CAST(FLOOR(value * 200) AS BIGINT)
        |  FROM events WHERE event_id % 8 = 3),
        |u AS (SELECT event_id,
        |    cents + CASE WHEN event_id % 5 = 0 THEN 7 ELSE 0 END AS cents
        |  FROM t)
        |SELECT CAST(event_id % 4 AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum
        |FROM u GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val path = s"$wh/default/events_cmerge"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val seed = Tables.load(s, dir, "events")
        .filter(col("event_id") % 8 === 0)
        .select(col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          (col("event_id") % 4).as("band"))
      TableWriter.write(s, seed, path, partitionBy = Seq("band"),
        version = 0L, commitTs = 1000L,
        generated = Map("band" -> "event_id % 4"))
      TableWriter.addConstraint(s, path, "cents >= 0",
        version = 1L, commitTs = 2000L)
      Tables.load(s, dir, "events")
        .filter(col("event_id") % 16 === 0 || col("event_id") % 8 === 3)
        .select(col("event_id"),
          floor(col("value") * 200).cast("long").as("cents"))
        .createOrReplaceTempView("cmerge_src")
      s.sql(
        """MERGE INTO gcat.default.events_cmerge t USING cmerge_src s
          |ON t.event_id = s.event_id
          |WHEN MATCHED THEN UPDATE SET t.cents = s.cents
          |WHEN NOT MATCHED THEN INSERT (event_id, cents, band)
          |  VALUES (s.event_id, s.cents, s.event_id % 4)""".stripMargin)
      s.sql(
        """UPDATE gcat.default.events_cmerge SET cents = cents + 7
          |WHERE event_id % 5 = 0""".stripMargin)
      s.sql(
        """SELECT CAST(band AS BIGINT) AS band,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS cents_sum
          |FROM gcat.default.events_cmerge
          |GROUP BY band ORDER BY band""".stripMargin)
    },

    // Path-table snapshot + time travel through the graft_snapshot TVF:
    // SQL users read any graft table directly — no catalog registration
    // — and pin a version. Counts replay q61's fixture arithmetic.
    QueryDef.sqlBacked(
      "q218_sql_snapshot_tvf",
      """SELECT 1 AS version,
        |  CAST(COUNT(*) FILTER (WHERE l_returnflag <> 'R')
        |    + COUNT(*) FILTER (WHERE l_orderkey % 97 = 0) AS BIGINT) AS n_rows
        |FROM lineitem
        |UNION ALL
        |SELECT 2 AS version,
        |  CAST(COUNT(*) FILTER (WHERE l_returnflag <> 'R')
        |    + COUNT(*) FILTER (WHERE l_orderkey % 97 = 0)
        |    + COUNT(*) FILTER (WHERE l_orderkey % 89 = 0) AS BIGINT) AS n_rows
        |FROM lineitem
        |ORDER BY version""".stripMargin) { (s, dir) =>
      val table = Cdc.buildFixture(s, dir)
      graft.functions.GraftExtensions.install(s)
      s.sql(
        s"""SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows
           |FROM graft_snapshot('$table', 1)
           |UNION ALL
           |SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows
           |FROM graft_snapshot('$table')
           |ORDER BY version""".stripMargin)
    },

    // SQL maintenance lifecycle via procedure-style TVFs: two small-file
    // append versions, `graft_optimize` compacts them (CDC-invisible
    // reorganization commit), `graft_vacuum` at retention 0 reclaims the
    // superseded pre-compaction files, and the content — read back
    // through graft_snapshot — is byte-identical to the bag union the
    // oracle recomputes. The metric booleans flip on a regression in
    // either direction (no compaction, or nothing reclaimed).
    QueryDef.sqlBacked(
      "q219_sql_optimize_vacuum",
      """WITH t AS (
        |  SELECT * FROM lineitem WHERE l_orderkey % 7 = 0
        |  UNION ALL SELECT * FROM lineitem WHERE l_orderkey % 11 = 0)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  TRUE AS compacted, TRUE AS reclaimed
        |FROM t""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/sqlopt_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(path), true) // vacuum mutates
      val li = Tables.load(s, dir, "lineitem")
      TableWriter.write(s, li.filter(col("l_orderkey") % 7 === 0), path,
        partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
      TableWriter.write(s, li.filter(col("l_orderkey") % 11 === 0), path,
        partitionBy = Seq("l_returnflag"), version = 1L, commitTs = 2000L)
      graft.functions.GraftExtensions.install(s)
      val opt = s.sql(s"SELECT * FROM graft_optimize('$path')").head()
      // retention 0 sits under the SQL surface's 7-day safety floor —
      // this fixture intends exactly that, so it says force
      val reclaimed = s.sql(
        s"SELECT COUNT(*) AS n FROM graft_vacuum('$path', 0, false, true)")
        .head().getLong(0)
      s.sql(
        s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
           |    AS BIGINT) AS cents,
           |  ${opt.getLong(2) < opt.getLong(1)} AS compacted,
           |  ${reclaimed > 0} AS reclaimed
           |FROM graft_snapshot('$path')""".stripMargin)
    },

    // ANSI constraint + generated-column DDL end-to-end: CREATE TABLE
    // with a named CHECK and a GENERATED ALWAYS AS partition column
    // (TableCatalogCapability SUPPORT_TABLE_CONSTRAINT +
    // SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS), INSERT that OMITS
    // the generated column (computed by the write path), a violating
    // INSERT refused — by Spark's own enforcement of the constraints the
    // table reports, with the engine's one-pass check behind it — then
    // ALTER ADD CONSTRAINT (validates existing rows), DROP CONSTRAINT,
    // and an insert the dropped rule would have refused. The final
    // per-band state and the refusal boolean are the oracle.
    QueryDef.sqlBacked(
      "q220_sql_constraints_ddl",
      """WITH t AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_id % 8 = 0
        |  UNION ALL SELECT 1000001, -7),
        |f AS (SELECT event_id, cents, event_id % 4 AS band FROM t)
        |SELECT CAST(band AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
        |  TRUE AS violating_refused
        |FROM f GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      s.sql("DROP TABLE IF EXISTS gcat.default.cons_ddl")
      s.sql(
        """CREATE TABLE gcat.default.cons_ddl (
          |  event_id BIGINT, cents BIGINT,
          |  band BIGINT GENERATED ALWAYS AS (event_id % 4),
          |  CONSTRAINT cents_nonneg CHECK (cents >= 0)
          |) PARTITIONED BY (band)""".stripMargin)
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      // generated band OMITTED — the write path computes it
      s.sql(
        """INSERT INTO gcat.default.cons_ddl (event_id, cents)
          |SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT)
          |FROM events_src WHERE event_id % 8 = 0""".stripMargin)
      val refused =
        try {
          s.sql("INSERT INTO gcat.default.cons_ddl VALUES (3, -5, 3)")
          false
        } catch { case _: Throwable => true }
      s.sql(
        """ALTER TABLE gcat.default.cons_ddl
          |ADD CONSTRAINT small CHECK (cents < 100000)""".stripMargin)
      s.sql("ALTER TABLE gcat.default.cons_ddl DROP CONSTRAINT cents_nonneg")
      s.sql(
        "INSERT INTO gcat.default.cons_ddl VALUES (1000001, -7, 1000001 % 4)")
      s.sql(
        s"""SELECT CAST(band AS BIGINT) AS band,
           |  CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
           |  $refused AS violating_refused
           |FROM gcat.default.cons_ddl
           |GROUP BY band ORDER BY band""".stripMargin)
    },

    // Metadata-only DROP COLUMN + the resurrection guard end-to-end:
    // drop a populated column (no file rewrite), re-ADD the same name
    // (mapped to a fresh physical name), append rows that fill it — the
    // old bytes must stay dead (NULL under the re-added name) while the
    // pre-drop version still time-travels with every value intact.
    QueryDef.sqlBacked(
      "q221_sql_drop_column",
      """WITH a AS (SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT)
        |             AS cents FROM events WHERE event_id % 8 = 0),
        |b AS (SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |      FROM events WHERE event_id % 8 = 3)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM a) + (SELECT COUNT(*) FROM b)
        |    AS BIGINT) AS n_rows,
        |  CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_scratch,
        |  CAST((SELECT SUM(cents) FROM a) + (SELECT SUM(cents) FROM b)
        |    AS BIGINT) AS cents_sum,
        |  CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS old_n_scratch""".stripMargin) {
      (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      s.sql("DROP TABLE IF EXISTS gcat.default.dropcol")
      s.sql(
        """CREATE TABLE gcat.default.dropcol (
          |  event_id BIGINT, scratch STRING, cents BIGINT)""".stripMargin)
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      s.sql(
        """INSERT INTO gcat.default.dropcol
          |SELECT event_id, event_type, CAST(FLOOR(value * 100) AS BIGINT)
          |FROM events_src WHERE event_id % 8 = 0""".stripMargin)
      s.sql("ALTER TABLE gcat.default.dropcol DROP COLUMN scratch")
      s.sql("ALTER TABLE gcat.default.dropcol ADD COLUMNS (scratch STRING)")
      s.sql(
        """INSERT INTO gcat.default.dropcol (event_id, cents, scratch)
          |SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT), event_type
          |FROM events_src WHERE event_id % 8 = 3""".stripMargin)
      s.sql(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(COUNT(scratch) AS BIGINT) AS n_scratch,
          |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
          |  (SELECT CAST(COUNT(scratch) AS BIGINT)
          |   FROM gcat.default.dropcol VERSION AS OF 1) AS old_n_scratch
          |FROM gcat.default.dropcol""".stripMargin)
    },

    // Column DEFAULT values (SUPPORT_COLUMN_DEFAULT_VALUE): defaults
    // declared in CREATE TABLE ride the schema's field metadata under
    // Spark's own keys, so `INSERT INTO t (a)` and the DEFAULT keyword
    // fill omitted columns in the analyzer — no engine-side work, and
    // the filled values flow through the same constraint/stats write
    // path as explicit ones.
    QueryDef.sqlBacked(
      "q222_sql_default_columns",
      """WITH t AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
        |    'ingest' AS src
        |  FROM events WHERE event_id % 8 = 0
        |  UNION ALL SELECT 1000001, 42, 'manual')
        |SELECT src, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum
        |FROM t GROUP BY src ORDER BY src""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      s.sql("DROP TABLE IF EXISTS gcat.default.defcol")
      s.sql(
        """CREATE TABLE gcat.default.defcol (
          |  event_id BIGINT, cents BIGINT,
          |  src STRING DEFAULT 'ingest')""".stripMargin)
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      s.sql(
        """INSERT INTO gcat.default.defcol (event_id, cents)
          |SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT)
          |FROM events_src WHERE event_id % 8 = 0""".stripMargin)
      s.sql("INSERT INTO gcat.default.defcol VALUES (1000001, 42, 'manual')")
      s.sql(
        """SELECT src, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS cents_sum
          |FROM gcat.default.defcol
          |GROUP BY src ORDER BY src""".stripMargin)
    },

    // SHOW PARTITIONS + DESCRIBE DETAIL from metadata alone: two
    // partitioned appends then a deletion-vector DELETE, and
    // `graft_partitions` / `graft_detail` answer exact per-partition and
    // table-level row counts WITHOUT scanning a data file — per-file log
    // stats minus the KB-scale DV sidecars. The oracle recomputes the
    // same counts from the raw rows; a stats or DV bookkeeping drift
    // anywhere in the write path breaks the hash.
    QueryDef.sqlBacked(
      "q223_sql_partitions_tvf",
      """WITH t AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
        |    event_id % 4 AS band
        |  FROM events WHERE event_id % 8 = 0 OR event_id % 8 = 5),
        |live AS (SELECT * FROM t WHERE cents % 3 <> 0)
        |SELECT CAST(band AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  TRUE AS has_files,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM live) AS total_rows
        |FROM live GROUP BY band ORDER BY band""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/ptvf_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          (col("event_id") % 4).as("band"))
      TableWriter.write(s, ev.filter(col("event_id") % 8 === 0), path,
        partitionBy = Seq("band"), version = 0L, commitTs = 1000L)
      TableWriter.write(s, ev.filter(col("event_id") % 8 === 5), path,
        partitionBy = Seq("band"), version = 1L, commitTs = 2000L)
      graft.txn.DeletionVectors.deleteWhere(s, path,
        col("cents") % 3 === 0, version = 2L, commitTs = 3000L)
      graft.functions.GraftExtensions.install(s)
      s.sql(
        s"""SELECT CAST(p.band AS BIGINT) AS band, p.n_rows,
           |  p.n_files >= 1 AS has_files, d.n_rows AS total_rows
           |FROM graft_partitions('$path') p
           |CROSS JOIN graft_detail('$path') d
           |ORDER BY band""".stripMargin)
    },

    // Stable row ids (Delta row tracking): two single-file sorted
    // appends pin the id of every row to its insertion rank, a DV
    // DELETE must not renumber survivors, and the oracle REPLAYS the
    // allocation arithmetic (row_number per commit, offset by the
    // earlier commit's count) — so the per-band SUM/MAX of `_graft_row_id`
    // is an exact value-level check of allocation order, stability, and
    // DV non-renumbering, not a boolean.
    QueryDef.sqlBacked(
      "q227_row_tracking",
      """WITH e AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |a AS (SELECT event_id, cents,
        |        ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS rid
        |      FROM e WHERE event_id % 2 = 0),
        |b AS (SELECT event_id, cents,
        |        (SELECT COUNT(*) FROM a)
        |          + ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS rid
        |      FROM e WHERE event_id % 2 = 1),
        |live AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT CAST(event_id % 4 AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(rid) AS BIGINT) AS rid_sum,
        |  CAST(MAX(rid) AS BIGINT) AS rid_max
        |FROM live WHERE cents % 7 <> 0
        |GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/rowid_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val log = new TxnLog(path, s.sessionState.newHadoopConf())
      if (log.versions() != Seq(0L, 1L, 2L)) {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"),
            floor(col("value") * 100).cast("long").as("cents"))
        def one(df: org.apache.spark.sql.DataFrame) =
          df.coalesce(1).sortWithinPartitions("event_id")
        TableWriter.write(s, one(ev.filter(col("event_id") % 2 === 0)),
          path, version = 0L, commitTs = 1000L)
        TableWriter.write(s, one(ev.filter(col("event_id") % 2 === 1)),
          path, version = 1L, commitTs = 2000L)
        graft.txn.DeletionVectors.deleteWhere(s, path,
          col("cents") % 7 === 0, version = 2L, commitTs = 3000L)
      }
      s.read.format("graft").option("tablePath", path).load()
        .select(col("event_id"),
          col(graft.txn.TxnLog.RowIdColumn).as("rid"))
        .groupBy((col("event_id") % 4).as("band"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("rid")).cast("long").as("rid_sum"),
          max(col("rid")).cast("long").as("rid_max"))
        .orderBy(col("band"))
    },

    // Dynamic partition pruning on the DSv2 scan: a star join whose dim
    // side survives a selective filter hands the scan a runtime IN list
    // of partition values, and the fact side opens ONLY the matching
    // partitions' files (DppSpec pins the pruning + plan; here the
    // driver hash certifies results are identical to the unpruned
    // semantics DuckDB computes). At 100 TB this is the difference
    // between scanning every partition of the fact table and scanning
    // the two the dim filter selects.
    QueryDef.sqlBacked(
      "q229_dpp_star_join",
      """WITH f AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
        |    event_id % 8 AS band
        |  FROM events),
        |d AS (SELECT band FROM (VALUES (2), (5)) AS v(band))
        |SELECT CAST(f.band AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum
        |FROM f JOIN d ON d.band = f.band
        |GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/dpp_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val log = new TxnLog(path, s.sessionState.newHadoopConf())
      if (log.versions() != Seq(0L)) {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        TableWriter.write(s,
          Tables.load(s, dir, "events").select(col("event_id"),
            floor(col("value") * 100).cast("long").as("cents"),
            (col("event_id") % 8).as("band")),
          path, partitionBy = Seq("band"), version = 0L, commitTs = 1000L)
      }
      import s.implicits._
      val dim = Seq(2L, 5L).toDF("band")
      s.read.format("graft").option("tablePath", path).load()
        .join(dim, Seq("band"))
        .groupBy(col("band"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("cents")).cast("long").as("cents_sum"))
        .orderBy(col("band"))
    },

    // SQL RESTORE via the procedure-style TVF: append twice, restore to
    // v0 (a NEW commit — history preserved), append again. The final
    // state is v0's rows plus the post-restore append, and the
    // pre-restore state stays time-travelable — both read back through
    // graft_snapshot and hash-checked against the fixture arithmetic.
    QueryDef.sqlBacked(
      "q231_sql_restore_tvf",
      """WITH t AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
        |    event_id % 4 AS grp
        |  FROM events)
        |SELECT 'final' AS state,
        |  CAST((SELECT COUNT(*) FROM t WHERE grp IN (0, 3)) AS BIGINT) AS n,
        |  CAST((SELECT SUM(cents) FROM t WHERE grp IN (0, 3)) AS BIGINT)
        |    AS cents_sum
        |UNION ALL
        |SELECT 'pre_restore' AS state,
        |  CAST((SELECT COUNT(*) FROM t WHERE grp IN (0, 1)) AS BIGINT) AS n,
        |  CAST((SELECT SUM(cents) FROM t WHERE grp IN (0, 1)) AS BIGINT)
        |    AS cents_sum
        |ORDER BY state""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/resttvf_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(path), true) // restore mutates
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          (col("event_id") % 4).as("grp"))
      TableWriter.write(s, ev.filter(col("grp") === 0), path,
        version = 0L, commitTs = 1000L)
      TableWriter.write(s, ev.filter(col("grp") === 1), path,
        version = 1L, commitTs = 2000L)
      graft.functions.GraftExtensions.install(s)
      s.sql(s"SELECT * FROM graft_restore('$path', 0)").collect()
      TableWriter.write(s, ev.filter(col("grp") === 3), path,
        version = 3L, commitTs = 4000L)
      s.sql(
        s"""SELECT 'final' AS state, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS cents_sum
           |FROM graft_snapshot('$path')
           |UNION ALL
           |SELECT 'pre_restore' AS state, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS cents_sum
           |FROM graft_snapshot('$path', 1)
           |ORDER BY state""".stripMargin)
    },

    // GENERATED ALWAYS AS IDENTITY end-to-end: CREATE with the SQL
    // identity syntax, two ordered INSERTs that OMIT the column (the
    // write path allocates from the persisted cursor), and the oracle
    // REPLAYS the allocation as row_number arithmetic — per-band
    // SUM/MAX of the identity values is a value-level check of start,
    // step, allocation order, and cross-commit cursor continuation.
    QueryDef.sqlBacked(
      "q232_identity_columns",
      """WITH e AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |a AS (SELECT event_id, cents,
        |        100 + 2 * (ROW_NUMBER() OVER (ORDER BY event_id) - 1) AS id
        |      FROM e WHERE event_id % 2 = 0),
        |b AS (SELECT event_id, cents,
        |        100 + 2 * ((SELECT COUNT(*) FROM a)
        |          + ROW_NUMBER() OVER (ORDER BY event_id) - 1) AS id
        |      FROM e WHERE event_id % 2 = 1),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT CAST(event_id % 4 AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(id) AS BIGINT) AS id_sum,
        |  CAST(MAX(id) AS BIGINT) AS id_max
        |FROM u GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      s.sql("DROP TABLE IF EXISTS gcat.default.idents")
      s.sql(
        """CREATE TABLE gcat.default.idents (
          |  id BIGINT GENERATED ALWAYS AS IDENTITY
          |    (START WITH 100 INCREMENT BY 2),
          |  event_id BIGINT, cents BIGINT)""".stripMargin)
      Tables.load(s, dir, "events").createOrReplaceTempView("events_idsrc")
      // a global ORDER BY makes the distributed zipWithIndex allocation
      // deterministic: range partitions are themselves ordered
      s.sql(
        """INSERT INTO gcat.default.idents (event_id, cents)
          |SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT)
          |FROM events_idsrc WHERE event_id % 2 = 0
          |ORDER BY event_id""".stripMargin)
      s.sql(
        """INSERT INTO gcat.default.idents (event_id, cents)
          |SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT)
          |FROM events_idsrc WHERE event_id % 2 = 1
          |ORDER BY event_id""".stripMargin)
      s.sql(
        """SELECT CAST(event_id % 4 AS BIGINT) AS band,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(id) AS BIGINT) AS id_sum,
          |  CAST(MAX(id) AS BIGINT) AS id_max
          |FROM gcat.default.idents
          |GROUP BY 1 ORDER BY band""".stripMargin)
    },

    // Dynamic FILE pruning (the Delta DFP idea): the fact table is
    // range-clustered on a NON-partition key, so per-file min/max
    // stats are tight, and the selective dim join's runtime IN list
    // prunes whole files through the stats machinery before any file
    // opens (DppSpec pins the pruning; here the driver hash certifies
    // the results equal DuckDB's unpruned join).
    QueryDef.sqlBacked(
      "q236_dfp_clustered_join",
      """WITH d AS (
        |  SELECT DISTINCT l_orderkey FROM lineitem
        |  WHERE l_orderkey % 997 = 0)
        |SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem l JOIN d ON d.l_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY l.l_returnflag""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/dfp_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val log = new TxnLog(path, s.sessionState.newHadoopConf())
      if (log.versions() != Seq(0L)) {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        TableWriter.write(s,
          Tables.load(s, dir, "lineitem")
            .repartitionByRange(8, col("l_orderkey"))
            .sortWithinPartitions(col("l_orderkey")),
          path, version = 0L, commitTs = 1000L)
      }
      val dim = Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") % 997 === 0)
        .select(col("l_orderkey")).distinct()
      s.read.format("graft").option("tablePath", path).load()
        .join(dim, Seq("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).cast("long").as("qty"))
        .orderBy(col("l_returnflag"))
    },

    // Storage-partitioned join (Iceberg/Delta SPJ, SpjSpec pins the
    // zero-shuffle plan): orders and customer land in graft tables
    // hive-partitioned on the same bucket key, the DSv2 scans report
    // KeyGroupedPartitioning, and the bucket-key + custkey equi-join
    // runs with NO exchange on either side — the shape that removes a
    // fact-fact shuffle entirely at 100 TB. The bucket column is
    // redundant under custkey equality, so the oracle is the plain
    // custkey join.
    QueryDef.sqlBacked(
      "q237_storage_partitioned_join",
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, dir) =>
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val conf = s.sessionState.newHadoopConf()
        def side(name: String, df: org.apache.spark.sql.DataFrame): String = {
          val path = s"target/fixtures/spj_${name}_$tag"
          val log = new TxnLog(path, conf)
          if (log.versions() != Seq(0L)) {
            val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
            fs.delete(new org.apache.hadoop.fs.Path(path), true)
            TableWriter.write(s, df.repartition(col("bk")), path,
              partitionBy = Seq("bk"), version = 0L, commitTs = 1000L)
          }
          path
        }
        val op = side("orders", Tables.load(s, dir, "orders")
          .withColumn("bk", col("o_custkey") % 8))
        val cp = side("customer", Tables.load(s, dir, "customer")
          .withColumn("bk", col("c_custkey") % 8))
        val keys = Seq(
          "spark.sql.sources.v2.bucketing.enabled",
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
        val prev = keys.map(k => k -> s.conf.getOption(k))
        keys.foreach(k => s.conf.set(k, "true"))
        try {
          val o = s.read.format("graft").option("tablePath", op).load()
          val c = s.read.format("graft").option("tablePath", cp).load()
          o.join(c, o("bk") === c("bk") && o("o_custkey") === c("c_custkey"))
            .groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n_orders"),
              sum(floor(col("o_totalprice") * 100).cast("long"))
                .cast("long").as("cents"))
            .orderBy(col("c_mktsegment"))
        } finally prev.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None)    => s.conf.unset(k)
        }
    },

    // The full three-clause replication MERGE ("source is the truth"):
    // matched rows take the source's values, new source keys insert,
    // and target rows ABSENT from the source are deleted by WHEN NOT
    // MATCHED BY SOURCE — one atomic commit through the group-based
    // copy-on-write operation (RowLevelSpec pins the clause semantics
    // on a fixed fixture; this row certifies the end state at sf). The
    // final table must equal the source exactly, which is what the
    // oracle recomputes.
    QueryDef.sqlBacked(
      "q240_merge_replicate",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 555) AS BIGINT)
        |    AS cents_sum,
        |  CAST(SUM(c_custkey) AS BIGINT) AS id_sum
        |FROM customer WHERE c_custkey % 3 = 0""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      Tables.load(s, dir, "customer").createOrReplaceTempView("cust_src")
      s.sql("DROP TABLE IF EXISTS gcat.default.cust_replica")
      s.sql(
        """CREATE TABLE gcat.default.cust_replica AS
          |SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
          |FROM cust_src WHERE c_custkey % 2 = 0""".stripMargin)
      s.sql(
        """SELECT c_custkey,
          |  CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 555 AS cents
          |FROM cust_src WHERE c_custkey % 3 = 0""".stripMargin)
        .createOrReplaceTempView("replica_truth")
      s.sql(
        """MERGE INTO gcat.default.cust_replica t USING replica_truth s
          |ON t.c_custkey = s.c_custkey
          |WHEN MATCHED THEN UPDATE SET t.cents = s.cents
          |WHEN NOT MATCHED THEN INSERT (c_custkey, cents)
          |  VALUES (s.c_custkey, s.cents)
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      s.sql(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
          |  CAST(SUM(c_custkey) AS BIGINT) AS id_sum
          |FROM gcat.default.cust_replica""".stripMargin)
    },

    // REORG ... APPLY (PURGE) via SQL: two stacked DV generations fold
    // back into plain files as a dataChange=false rewrite — the logical
    // table is PROVABLY unchanged (the oracle recomputes the post-DV
    // state from raw lineitem), no DV pointer survives, and plain
    // parquet readers regain full speed. The purge-is-invisible booleans
    // ride the hash like the other maintenance rows.
    QueryDef.sqlBacked(
      "q245_sql_reorg_purge",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  TRUE AS dvs_cleared
        |FROM lineitem
        |WHERE l_orderkey % 9 = 0 AND l_suppkey % 5 <> 0
        |  AND l_partkey % 3 <> 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        val path = s"target/fixtures/reorg_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val conf = s.sessionState.newHadoopConf()
        val log = new TxnLog(path, conf)
        // the reorg itself commits v3 on the first run — the guard must
        // accept the post-reorg state or every run rebuilds from scratch
        if (log.versions().take(3) != Seq(0L, 1L, 2L)) {
          val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
          fs.delete(new org.apache.hadoop.fs.Path(path), true)
          TableWriter.write(s,
            Tables.load(s, dir, "lineitem")
              .filter(col("l_orderkey") % 9 === 0),
            path, partitionBy = Seq("l_returnflag"),
            version = 0L, commitTs = 1000L)
          DeletionVectors.deleteWhere(s, path, col("l_suppkey") % 5 === 0,
            version = 1L, commitTs = 2000L)
          DeletionVectors.deleteWhere(s, path, col("l_partkey") % 3 === 0,
            version = 2L, commitTs = 3000L)
        }
        graft.functions.GraftExtensions.install(s)
        val cleared = s.sql(s"SELECT dvs_remaining FROM graft_reorg('$path')")
          .head().getLong(0) == 0L
        s.read.format("graft").option("tablePath", path).load()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).cast("long").as("qty"))
          .withColumn("dvs_cleared", lit(cleared))
          .orderBy(col("l_returnflag"))
    },

    // SQL COPY INTO (graft_copy_into TVF): raw parquet files ingest
    // EXACTLY ONCE — per-file SetTxn markers commit atomically with the
    // data, so the second invocation here must skip every file without
    // committing (the boolean rides the hash). CopyIntoSpec pins the
    // retry/late-file/checkpoint semantics; this row certifies the
    // ingested state at sf against the raw-table recompute.
    QueryDef.sqlBacked(
      "q247_sql_copy_into",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  TRUE AS retry_skipped_all
        |FROM lineitem WHERE l_orderkey % 11 < 2""".stripMargin) { (s, dir) =>
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val conf = s.sessionState.newHadoopConf()
      val src = s"target/fixtures/copysrc_$tag"
      val srcPath = new org.apache.hadoop.fs.Path(src)
      val fs = srcPath.getFileSystem(conf)
      if (!fs.exists(new org.apache.hadoop.fs.Path(src, "_built"))) {
        fs.delete(srcPath, true)
        Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") % 11 === 0)
          .repartition(3)
          .write.mode("overwrite").parquet(src)
        fs.create(new org.apache.hadoop.fs.Path(src, "_built")).close()
      }
      val table = s"target/fixtures/copydst_$tag"
      val log = new TxnLog(table, conf)
      if (log.versions().isEmpty) {
        TableWriter.write(s,
          Tables.load(s, dir, "lineitem")
            .filter(col("l_orderkey") % 11 === 1),
          table, version = 0L, commitTs = 1000L)
      }
      graft.functions.GraftExtensions.install(s)
      s.sql(s"SELECT * FROM graft_copy_into('$table', '$src')").collect()
      val retry = s.sql(s"SELECT * FROM graft_copy_into('$table', '$src')")
        .head()
      val skippedAll =
        retry.getLong(1) == 0L && retry.getLong(3) > 0L
      s.read.format("graft").option("tablePath", table).load()
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).cast("long").as("qty"))
        .withColumn("retry_skipped_all", lit(skippedAll))
    },

    // Log retention via SQL (graft_expire_log): a 25-commit table's log
    // expires down to its newest checkpoint (v20) + tail — the bound
    // that keeps a million-commit table's metadata readable — while the
    // DATA resolves bit-identically through the surviving checkpoint
    // (the oracle recomputes the full 25-slice union from lineitem).
    // LogRetentionSpec pins horizon choice, time-travel refusal, and
    // SetTxn survival.
    QueryDef.sqlBacked(
      "q249_sql_log_retention",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(20 AS BIGINT) AS earliest_version
        |FROM lineitem WHERE l_orderkey % 40 < 25""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/logret_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      val log = new TxnLog(path, conf)
      if (log.versions() != (20L to 24L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        // one scan feeds all 25 slice writes (the loop re-reads the
        // cached frame, not the parquet — 25 scans would dominate the
        // fixture build)
        val li = Tables.load(s, dir, "lineitem").cache()
        try for (v <- 0L until 25L)
          TableWriter.write(s, li.filter(col("l_orderkey") % 40 === v),
            path, version = v, commitTs = 1000L * (v + 1))
        finally li.unpersist()
        graft.functions.GraftExtensions.install(s)
        // commitTs are epoch-1970 millis, so ANY wall clock puts every
        // commit past the horizon; the base checkpoint (v20) anchors
        s.sql(s"SELECT COUNT(*) FROM graft_expire_log('$path', 0)").collect()
      }
      val earliest = new TxnLog(path, conf).versions().head
      s.read.format("graft").option("tablePath", path).load()
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).cast("long").as("qty"))
        .withColumn("earliest_version", lit(earliest))
    },

    // CONVERT TO DELTA via SQL (graft_convert): a hive-partitioned
    // parquet directory written by PLAIN Spark registers as a graft
    // table in place — one metadata commit, zero bytes rewritten — then
    // immediately accepts a graft append, time travel back to the
    // pre-conversion state, and partition-pruned reads. The oracle
    // recomputes both the final totals and the v0 row count straight
    // from orders. ConvertSpec pins the zero-rewrite/null-partition/
    // stats-skipping mechanics.
    QueryDef.sqlBacked(
      "q252_sql_convert",
      """WITH v0 AS (SELECT COUNT(*) AS n_v0 FROM orders
        |  WHERE o_orderkey % 2 = 0)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  CAST((SELECT n_v0 FROM v0) AS BIGINT) AS n_v0
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/convert_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      val log = new TxnLog(path, conf)
      if (log.versions() != Seq(0L, 1L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 2 === 0)
          .write.partitionBy("o_orderpriority").parquet(path)
        graft.functions.GraftExtensions.install(s)
        s.sql(s"SELECT * FROM graft_convert('$path')").collect()
        TableWriter.append(s,
          Tables.load(s, dir, "orders").filter(col("o_orderkey") % 2 === 1),
          path, commitTs = System.currentTimeMillis())
      }
      val nV0 = s.read.format("graft").option("tablePath", path)
        .option("versionAsOf", "0").load().count()
      s.read.format("graft").option("tablePath", path).load()
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long"))
            .cast("long").as("cents"))
        .withColumn("n_v0", lit(nV0))
        .orderBy(col("o_orderpriority"))
    },

    // SQL DELETE in deletion-vector mode (spark.graft.delete.mode=dv —
    // Delta's DV toggle): the statement marks doomed rows in KB-scale
    // sidecars and rewrites NOTHING — the zero-files-rewritten boolean
    // rides the hash beside the post-delete state the oracle recomputes.
    // On a 100 TB table this is the difference between a kilobyte
    // commit and rewriting every file a 1k-row predicate touches.
    QueryDef.sqlBacked(
      "q253_sql_delete_dv",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  TRUE AS zero_files_rewritten
        |FROM orders WHERE o_orderkey % 2 = 0 AND o_custkey > 100
        |""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders_dv_src")
      s.sql("DROP TABLE IF EXISTS gcat.default.orders_dv")
      s.sql(
        """CREATE TABLE gcat.default.orders_dv AS
          |SELECT o_orderkey, o_custkey,
          |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
          |FROM orders_dv_src WHERE o_orderkey % 2 = 0""".stripMargin)
      val log = new TxnLog(s"$wh/default/orders_dv",
        s.sessionState.newHadoopConf())
      val before = log.snapshotLatest().files.map(_.path).toSet
      s.conf.set("spark.graft.delete.mode", "dv")
      try s.sql("DELETE FROM gcat.default.orders_dv WHERE o_custkey <= 100")
      finally s.conf.unset("spark.graft.delete.mode")
      val after = log.snapshotLatest().files.map(_.path).toSet
      s.sql(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS cents
          |FROM gcat.default.orders_dv""".stripMargin)
        .withColumn("zero_files_rewritten", lit(after == before))
    },

    // GROUP BY partition-column aggregate pushdown: per-partition
    // COUNT/MIN/MAX answered from the LOG's per-file stats — the scan
    // opens zero data files (GroupedAggPushdownSpec pins the
    // GraftBatchAgg plan); at 100 TB `SELECT dt, count(*) GROUP BY dt`
    // is a metadata read. The boolean pins that the plan really was
    // the stats-only scan, and the values ride the driver hash.
    QueryDef.sqlBacked(
      "q257_grouped_agg_pushdown",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(l_orderkey) AS BIGINT) AS lo,
        |  CAST(MAX(l_orderkey) AS BIGINT) AS hi,
        |  TRUE AS stats_only
        |FROM lineitem WHERE l_orderkey % 9 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        val path = s"target/fixtures/gagg_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
        val log = new TxnLog(path, s.sessionState.newHadoopConf())
        if (log.versions() != Seq(0L)) {
          val fs = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(s.sessionState.newHadoopConf())
          fs.delete(new org.apache.hadoop.fs.Path(path), true)
          TableWriter.write(s,
            Tables.load(s, dir, "lineitem")
              .filter(col("l_orderkey") % 9 === 0),
            path, partitionBy = Seq("l_returnflag"),
            version = 0L, commitTs = 1000L)
        }
        val df = s.read.format("graft").option("tablePath", path).load()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            min(col("l_orderkey")).as("lo"),
            max(col("l_orderkey")).as("hi"))
        val statsOnly =
          df.queryExecution.executedPlan.toString.contains("GraftBatchAgg")
        df.withColumn("stats_only", lit(statsOnly))
          .orderBy(col("l_returnflag"))
    },

    // Declared clustering via SQL (graft_cluster_by + argument-less
    // graft_optimize — the liquid-clustering contract: set once, every
    // OPTIMIZE maintains the layout). The fixture starts with every
    // file spanning the whole key range; after the clustered OPTIMIZE
    // the per-file spans are DISJOINT (boolean rides the hash) and a
    // range query's totals — what file skipping now accelerates — are
    // recomputed by the oracle. ClusterBySpec pins override/refusal.
    QueryDef.sqlBacked(
      "q259_sql_cluster_by",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  TRUE AS spans_disjoint
        |FROM lineitem
        |WHERE l_orderkey % 6 = 0
        |  AND l_orderkey BETWEEN 1000 AND 9999""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/clby_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      val log = new TxnLog(path, conf)
      if (log.versions().take(3) != Seq(0L, 1L, 2L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        // 8 files, each spanning the full l_orderkey range (worst layout)
        TableWriter.write(s,
          Tables.load(s, dir, "lineitem")
            .filter(col("l_orderkey") % 6 === 0).repartition(8),
          path, version = 0L, commitTs = 1000L)
        graft.functions.GraftExtensions.install(s)
        s.sql(s"SELECT * FROM graft_cluster_by('$path', 'l_orderkey')")
          .collect()
        // layout comes from the DECLARATION, not an argument (the TVF
        // path is ClusterBySpec-covered; targetFiles=4 keeps the
        // disjointness assertion non-vacuous)
        TableWriter.compact(s, path, version = 2L, commitTs = 3000L,
          targetFiles = 4)
      }
      val spans = log.snapshotLatest().files
        .flatMap(_.stats.map(st => (st.minValues("l_orderkey").toLong,
          st.maxValues("l_orderkey").toLong)))
        .sortBy(_._1)
      val disjoint = spans.size > 1 &&
        spans.zip(spans.drop(1)).forall { case ((_, hi), (lo, _)) => hi <= lo }
      s.read.format("graft").option("tablePath", path).load()
        .filter(col("l_orderkey").between(1000L, 9999L))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).cast("long").as("qty"))
        .withColumn("spans_disjoint", lit(disjoint))
    },

    // Shallow clone of a PARTITIONED, DV-CARRYING source — the round-9
    // scope lift. The clone inherits external hive-partitioned files AND
    // an absolutized deletion-vector pointer with one metadata commit,
    // then diverges: a partitioned local append, a clone-local DV delete
    // that STACKS over the imported source vector, and a partition drop.
    // Every final count recomputes from lineitem in the oracle; the
    // source's untouched state rides along as its own row — a hash
    // mismatch there means the clone leaked a write into its source.
    QueryDef.sqlBacked(
      "q271_clone_partitioned",
      """WITH ext AS (
        |  SELECT * FROM lineitem
        |  WHERE l_orderkey % 13 = 0 AND l_suppkey % 6 <> 0),
        |cl AS (
        |  SELECT l_returnflag FROM ext
        |  WHERE l_partkey % 5 <> 0 AND l_returnflag <> 'R'
        |  UNION ALL
        |  SELECT l_returnflag FROM lineitem
        |  WHERE l_orderkey % 17 = 0 AND l_partkey % 5 <> 0
        |    AND l_returnflag <> 'R')
        |SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n
        |FROM cl GROUP BY 1
        |UNION ALL
        |SELECT 'SRC_TOTAL' AS grp, CAST(COUNT(*) AS BIGINT) AS n FROM ext
        |ORDER BY grp""".stripMargin) { (s, dir) =>
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val src = s"target/fixtures/clonep_src_$tag"
      val dst = s"target/fixtures/clonep_dst_$tag"
      val conf = s.sessionState.newHadoopConf()
      if (!(new TxnLog(src, conf).versions() == Seq(0L, 1L) &&
          new TxnLog(dst, conf).versions() == Seq(0L, 1L, 2L, 3L))) {
        val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(src), true)
        fs.delete(new org.apache.hadoop.fs.Path(dst), true)
        val li = Tables.load(s, dir, "lineitem")
        TableWriter.write(s, li.filter(col("l_orderkey") % 13 === 0), src,
          partitionBy = Seq("l_returnflag"), version = 0L, commitTs = 1000L)
        DeletionVectors.deleteWhere(s, src, col("l_suppkey") % 6 === 0,
          version = 1L, commitTs = 2000L)
        TableWriter.cloneShallow(s, src, dst, commitTs = 3000L)
        TableWriter.append(s, li.filter(col("l_orderkey") % 17 === 0), dst,
          commitTs = 4000L)
        DeletionVectors.deleteWhere(s, dst, col("l_partkey") % 5 === 0,
          version = 2L, commitTs = 5000L)
        TableWriter.removeWhere(s, dst,
          pv => pv.get("l_returnflag").contains("R"), version = 3L,
          commitTs = 6000L)
      }
      val clone = SnapshotReader.read(s, dst)
        .groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("n"))
      val srcTotal = SnapshotReader.read(s, src)
        .agg(count(lit(1)).as("n"))
        .select(lit("SRC_TOTAL").as("grp"), col("n"))
      clone.unionByName(srcTotal).orderBy(col("grp"))
    },

    // CONVERT of a DATE-partitioned foreign parquet lake (the round-9
    // DateType partition support): a month-partitioned plain layout
    // registers with one metadata commit, the inferred DateType
    // partition column reads back as real dates, and a month-range
    // predicate prunes at the partition level. The oracle recomputes
    // the month rollup from orders directly.
    QueryDef.sqlBacked(
      "q272_convert_date_partitions",
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS o_month,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders
        |WHERE CAST(date_trunc('month', o_orderdate) AS DATE)
        |  BETWEEN DATE '1995-01-01' AND DATE '1995-12-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val path =
        s"target/fixtures/convdate_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      if (new TxnLog(path, conf).versions().isEmpty) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        Tables.load(s, dir, "orders")
          .withColumn("o_month",
            date_trunc("month", col("o_orderdate")).cast("date"))
          .write.partitionBy("o_month").parquet(path)
        Convert.run(s, path)
      }
      s.read.format("graft").option("tablePath", path).load()
        .filter(col("o_month").between(
          lit("1995-01-01").cast("date"), lit("1995-12-01").cast("date")))
        .groupBy(col("o_month"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(15,2)"))
            .cast("double").as("revenue"))
        .orderBy(col("o_month"))
    },

    // Per-file NULL-COUNT statistics (round 9): the log records each
    // file's per-column null count from the parquet footer, so
    // IS NULL / IS NOT NULL prune at the file level and COUNT(col)
    // answers from stats with ZERO data files opened. Both behaviors
    // are driver-hash gates computed from the executed plans — the
    // values alone would pass even if the stats path silently died.
    QueryDef.sqlBacked(
      "q274_null_stats_scan",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
        |  CAST(COUNT(CASE WHEN l_linenumber <> 1 THEN 1 END) AS BIGINT)
        |    AS n_v,
        |  CAST(COUNT(CASE WHEN l_linenumber = 1 THEN 1 END) AS BIGINT)
        |    AS n_null,
        |  CAST(1 AS BIGINT) AS agg_from_stats,
        |  CAST(1 AS BIGINT) AS isnull_pruned
        |FROM lineitem WHERE l_orderkey % 19 = 0""".stripMargin) { (s, dir) =>
      val path =
        s"target/fixtures/nullstats_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      if (new TxnLog(path, conf).versions() != Seq(0L, 1L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") % 19 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            when(col("l_linenumber") =!= 1, col("l_quantity")).as("v"))
        // file 1: the all-null sliver; file 2: the null-free rest
        TableWriter.write(s, li.filter(col("l_linenumber") === 1)
          .coalesce(1), path, version = 0L, commitTs = 1000L)
        TableWriter.append(s, li.filter(col("l_linenumber") =!= 1)
          .coalesce(1), path, commitTs = 2000L)
      }
      val t = s.read.format("graft").option("tablePath", path).load()
      val agg = t.agg(count(lit(1)).as("n_total"), count(col("v")).as("n_v"))
      val aggFromStats =
        agg.queryExecution.executedPlan.toString.contains("GraftBatchAgg")
      val isNull = t.filter(col("v").isNull)
      val pruned =
        isNull.queryExecution.executedPlan.toString.contains("files=1/2")
      val r = agg.head()
      val nNull = isNull.count()
      import s.implicits._
      Seq((r.getLong(0), r.getLong(1), nNull,
          if (aggFromStats) 1L else 0L, if (pruned) 1L else 0L))
        .toDF("n_total", "n_v", "n_null", "agg_from_stats", "isnull_pruned")
    },

    // TYPE WIDENING lifecycle (ALTER COLUMN TYPE, round 9): an INT
    // column widens to BIGINT in one metadata commit — zero files
    // rewritten — then an append lands values past 2³¹ in the SAME
    // column, and one aggregate sums across both physical generations
    // (INT32 pages upcast at scan). The zero_rewrite gate counts live
    // data files: a widening that rewrote data would fail the hash.
    QueryDef.sqlBacked(
      "q277_type_widening",
      """SELECT
        |  CAST(SUM(CASE WHEN l_orderkey % 23 = 0
        |    THEN CAST(CAST(l_quantity AS INT) AS BIGINT) END) +
        |    SUM(CASE WHEN l_orderkey % 29 = 0
        |    THEN CAST(l_quantity AS BIGINT) * 1000000000 END)
        |    AS BIGINT) AS sum_v,
        |  CAST(COUNT(CASE WHEN l_orderkey % 23 = 0 THEN 1 END) +
        |    COUNT(CASE WHEN l_orderkey % 29 = 0 THEN 1 END) AS BIGINT)
        |    AS n,
        |  CAST(1 AS BIGINT) AS is_bigint,
        |  CAST(1 AS BIGINT) AS zero_rewrite
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val path =
        s"target/fixtures/widen_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      if (new TxnLog(path, conf).versions() != Seq(0L, 1L, 2L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val li = Tables.load(s, dir, "lineitem")
        TableWriter.write(s, li.filter(col("l_orderkey") % 23 === 0)
          .select(col("l_orderkey"),
            col("l_quantity").cast("int").as("v")).coalesce(1),
          path, version = 0L, commitTs = 1000L)
        TableWriter.widenColumnType(s, path, "v",
          org.apache.spark.sql.types.LongType, version = 1L,
          commitTs = 2000L)
        TableWriter.append(s, li.filter(col("l_orderkey") % 29 === 0)
          .select(col("l_orderkey"),
            (col("l_quantity").cast("long") * 1000000000L).as("v"))
          .coalesce(1), path, commitTs = 3000L)
      }
      val t = s.read.format("graft").option("tablePath", path).load()
      val isBigint =
        t.schema("v").dataType == org.apache.spark.sql.types.LongType
      val liveFiles = new TxnLog(path, conf).snapshotLatest().files.size
      val r = t.agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n")).head()
      import s.implicits._
      Seq((r.getLong(0), r.getLong(1), if (isBigint) 1L else 0L,
          if (liveFiles == 2) 1L else 0L))
        .toDF("sum_v", "n", "is_bigint", "zero_rewrite")
    },

    // MERGE SCHEMA EVOLUTION (round 9): the merge source carries a
    // column the table never declared — with autoMergeSchema the schema
    // evolves ATOMICALLY with the merged rows (one commit), unmatched
    // old rows surface the new column as null, and only key-matched
    // files rewrite. n_segment counts the evolved column's non-nulls:
    // exactly the merged source rows.
    QueryDef.sqlBacked(
      "q278_merge_schema_evolution",
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
        |    WHERE o_orderkey % 31 = 0),
        |src AS (SELECT o_orderkey, o_totalprice,
        |    o_orderpriority AS segment FROM orders
        |    WHERE o_orderkey % 37 = 0),
        |merged AS (
        |  SELECT b.o_orderkey, b.o_totalprice, NULL AS segment
        |  FROM base b
        |  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM src)
        |  UNION ALL SELECT o_orderkey, o_totalprice, segment FROM src)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE)
        |    AS sum_price,
        |  CAST(COUNT(segment) AS BIGINT) AS n_segment,
        |  CAST(1 AS BIGINT) AS evolved
        |FROM merged""".stripMargin) { (s, dir) =>
      val path =
        s"target/fixtures/mergevo_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      if (new TxnLog(path, conf).versions() != Seq(0L, 1L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val o = Tables.load(s, dir, "orders")
        TableWriter.write(s, o.filter(col("o_orderkey") % 31 === 0)
          .select(col("o_orderkey"), col("o_totalprice")),
          path, version = 0L, commitTs = 1000L)
        TableWriter.mergeUpsert(s, path,
          o.filter(col("o_orderkey") % 37 === 0)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority").as("segment")),
          Seq("o_orderkey"), version = 1L, commitTs = 2000L,
          autoMergeSchema = true)
      }
      val t = s.read.format("graft").option("tablePath", path).load()
      val evolved = t.schema.fieldNames.toSeq ==
        Seq("o_orderkey", "o_totalprice", "segment")
      val r = t.agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(15,2)")).cast("double")
          .as("sum_price"),
        count(col("segment")).as("n_segment")).head()
      import s.implicits._
      Seq((r.getLong(0), r.getDouble(1), r.getLong(2),
          if (evolved) 1L else 0L))
        .toDF("n", "sum_price", "n_segment", "evolved")
    },

    // TABLE PROPERTIES as live configuration (round 9): TBLPROPERTIES
    // persist in the Metadata (checkpoint-surviving, time-traveling),
    // and `graft.autoCompact.*` set ON THE TABLE drives auto-compaction
    // with no session conf at all — the table owner's declaration, not
    // the job's defaults. Gates: the property round-trip and the
    // property-triggered compaction commit (file count folds to 1).
    QueryDef.sqlBacked(
      "q279_table_properties",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(1 AS BIGINT) AS props_roundtrip,
        |  CAST(1 AS BIGINT) AS auto_compacted
        |FROM lineitem WHERE l_orderkey % 43 = 0""".stripMargin) { (s, dir) =>
      val path =
        s"target/fixtures/tblprops_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      if (new TxnLog(path, conf).versions() != Seq(0L, 1L, 2L, 3L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") % 43 === 0)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        TableWriter.write(s, li.filter(col("l_linenumber") <= 2)
          .repartition(4), path, version = 0L, commitTs = 1000L)
        TableWriter.setTableProperties(s, path,
          set = Map("graft.autoCompact.enabled" -> "true",
            "graft.autoCompact.minFiles" -> "4",
            "stage" -> "silver"), version = 1L, commitTs = 2000L)
        // this append trips the table-property threshold → v3 compaction
        TableWriter.append(s, li.filter(col("l_linenumber") > 2)
          .repartition(4), path, commitTs = 3000L)
      }
      val log = new TxnLog(path, conf)
      val snap = log.snapshotLatest()
      val propsOk = snap.metadata.exists(m =>
        m.properties.get("stage").contains("silver") &&
          m.properties.get("graft.autoCompact.enabled").contains("true"))
      val compacted =
        log.versions() == Seq(0L, 1L, 2L, 3L) && snap.files.size == 1
      val r = s.read.format("graft").option("tablePath", path).load()
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty")).head()
      import s.implicits._
      Seq((r.getLong(0), r.getLong(1), if (propsOk) 1L else 0L,
          if (compacted) 1L else 0L))
        .toDF("n", "qty", "props_roundtrip", "auto_compacted")
    },

    // IN-LIST file skipping (round 9): one file per l_linenumber value,
    // then `l_linenumber IN (1, 3)` must open exactly two of them — the
    // per-value DISJUNCTION of point probes a single conjunctive range
    // cannot express. The gate reads the executed plan's kept/total
    // file count; values are recomputed from lineitem by the oracle.
    QueryDef.sqlBacked(
      "q280_in_list_skipping",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(1 AS BIGINT) AS in_pruned
        |FROM lineitem
        |WHERE l_orderkey % 3 = 0 AND l_linenumber IN (1, 3)""".stripMargin) {
      (s, dir) =>
      val path =
        s"target/fixtures/inlist_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val lineNos = li.select(col("l_linenumber")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (new TxnLog(path, conf).versions().size != lineNos.length) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        lineNos.zipWithIndex.foreach { case (ln, i) =>
          TableWriter.write(s,
            li.filter(col("l_linenumber") === ln).coalesce(1), path,
            version = i.toLong, commitTs = 1000L + i)
        }
      }
      val q = s.read.format("graft").option("tablePath", path).load()
        .filter(col("l_linenumber").isin(1, 3))
      val pruned = q.queryExecution.executedPlan.toString
        .contains(s"files=2/${lineNos.length}")
      val r = q.agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("qty")).head()
      import s.implicits._
      Seq((r.getLong(0), r.getLong(1), if (pruned) 1L else 0L))
        .toDF("n", "qty", "in_pruned")
    },

    // GENERATED-COLUMN PARTITION PRUNING (round 9): the query ranges
    // over the BASE timestamp only; the scan derives the month-string
    // range on the GENERATED partition column and prunes directories.
    // The fixture strips the base column's min/max first, so the
    // derivation is the ONLY signal — exactly the converted-foreign-
    // files case where footer stats are absent but the layout declares
    // its generation expression.
    QueryDef.sqlBacked(
      "q285_generated_pruning",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  CAST(1 AS BIGINT) AS derived_pruned
        |FROM orders
        |WHERE o_orderkey % 11 = 0
        |  AND o_orderdate >= TIMESTAMP '1996-03-01'
        |  AND o_orderdate < TIMESTAMP '1996-06-01'""".stripMargin) {
      (s, dir) =>
      val path =
        s"target/fixtures/gpd_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      if (new TxnLog(path, conf).versions() != Seq(0L, 1L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        TableWriter.write(s,
          Tables.load(s, dir, "orders").filter(col("o_orderkey") % 11 === 0),
          path, partitionBy = Seq("o_month"), version = 0L,
          commitTs = 1000L,
          generated = Map("o_month" ->
            "date_format(o_orderdate, 'yyyy-MM')"))
        val log = new TxnLog(path, conf)
        val snap = log.snapshotLatest()
        val stripped = snap.files.map(f => f.copy(dataChange = false,
          stats = f.stats.map(st => st.copy(
            minValues = st.minValues - "o_orderdate",
            maxValues = st.maxValues - "o_orderdate"))))
        log.commit(1L, snap.files.map(f => RemoveFile(f.path, 2000L,
          f.partitionValues, dataChange = false)) ++ stripped :+
          CommitInfo("STRIP", 2000L))
      }
      val q = s.read.format("graft").option("tablePath", path).load()
        .filter(col("o_orderdate") >= lit("1996-03-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-06-01").cast("timestamp"))
      val total = new TxnLog(path, conf).snapshotLatest().files.size
      val keptRe = "files=(\\d+)/(\\d+)".r
      val m = keptRe.findFirstMatchIn(
        q.queryExecution.executedPlan.toString)
      val pruned = m.exists(mm => mm.group(2).toInt == total &&
        mm.group(1).toInt <= 4 && mm.group(1).toInt < total)
      val r = q.agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        .head()
      import s.implicits._
      Seq((r.getLong(0), r.getLong(1), if (pruned) 1L else 0L))
        .toDF("n", "cents", "derived_pruned")
    },

    // PARTITION-SCOPED OPTIMIZE (round 9 — `OPTIMIZE t WHERE part=v` as
    // the graft_optimize_where TVF): only the named partition's files
    // fold; every other partition's files keep their PATHS (the gate
    // asserts untouched modification times survive), which is what lets
    // a 100 TB maintenance job walk partitions incrementally without
    // churning the rest of the table or its CDC stream.
    QueryDef.sqlBacked(
      "q288_optimize_where",
      """SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(1 AS BIGINT) AS scoped_fold
        |FROM lineitem WHERE l_orderkey % 53 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val path =
        s"target/fixtures/optw_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      if (new TxnLog(path, conf).versions() != Seq(0L, 1L, 2L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") % 53 === 0)
        // two commits → ≥2 files per partition (fragmented layout)
        TableWriter.write(s, li.filter(col("l_linenumber") % 2 === 0),
          path, partitionBy = Seq("l_returnflag"), version = 0L,
          commitTs = 1000L)
        TableWriter.append(s, li.filter(col("l_linenumber") % 2 =!= 0),
          path, commitTs = 2000L)
        graft.functions.GraftExtensions.install(s)
        s.sql(s"SELECT * FROM graft_optimize_where('$path', " +
          "'l_returnflag', 'A')").collect()
      }
      val snap = new TxnLog(path, conf).snapshotLatest()
      val aFiles = snap.files
        .filter(_.partitionValues.get("l_returnflag").contains("A"))
      val others = snap.files
        .filterNot(_.partitionValues.get("l_returnflag").contains("A"))
      val scoped = aFiles.size == 1 &&
        others.nonEmpty && others.forall(_.modificationTime <= 2000L)
      val counts = s.read.format("graft").option("tablePath", path).load()
        .groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("n"))
      import s.implicits._
      counts.withColumn("scoped_fold", lit(if (scoped) 1L else 0L))
        .orderBy(col("grp"))
    },

    // PREDICATE-SCOPED OVERWRITE (Delta's replaceWhere, here the DSv2
    // `writeTo(...).overwrite(cond)` bridge + TableWriter.replaceWhere):
    // one atomic commit deletes every row matching the predicate and
    // inserts the replacement — the idempotent backfill primitive. The
    // gate pins the 100 TB property: partitions OUTSIDE the predicate
    // keep their physical files (modificationTime still v0's), so
    // re-loading one slice never churns the rest of the table or its
    // CDC stream. Oracle recomputes the final state from raw parquet.
    QueryDef.sqlBacked(
      "q294_replace_where",
      """SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(q * 100) AS BIGINT)) AS BIGINT) AS qcents,
        |  CAST(1 AS BIGINT) AS scoped
        |FROM (SELECT l_returnflag,
        |        CASE WHEN l_returnflag = 'A' THEN l_quantity + 100
        |             ELSE l_quantity END AS q
        |      FROM lineitem WHERE l_orderkey % 23 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val path =
        s"target/fixtures/rpw_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      if (new TxnLog(path, conf).versions() != Seq(0L, 1L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") % 23 === 0)
        TableWriter.write(s, li, path, partitionBy = Seq("l_returnflag"),
          version = 0L, commitTs = 1000L)
        TableWriter.replaceWhere(s, path,
          li.filter(col("l_returnflag") === "A")
            .withColumn("l_quantity", col("l_quantity") + 100.0),
          col("l_returnflag") === "A", version = 1L, commitTs = 2000L)
      }
      val snap = new TxnLog(path, conf).snapshotLatest()
      val others = snap.files
        .filterNot(_.partitionValues.get("l_returnflag").contains("A"))
      val scoped = others.nonEmpty &&
        others.forall(_.modificationTime <= 1000L) &&
        snap.files.exists(_.modificationTime >= 2000L)
      s.read.format("graft").option("tablePath", path).load()
        .groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_quantity") * 100).cast("long")).as("qcents"))
        .withColumn("scoped", lit(if (scoped) 1L else 0L))
        .orderBy(col("grp"))
    },

    // DYNAMIC PARTITION OVERWRITE: replace exactly the partitions
    // PRESENT in the incoming frame (the nightly re-materialization
    // shape where the job decides which slices it recomputed); doomed
    // files are discovered from the LOG's partition values — metadata
    // only, no data file opened. The gate pins that absent partitions
    // keep their v0 files.
    QueryDef.sqlBacked(
      "q295_dynamic_overwrite",
      """SELECT o_orderpriority AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(p * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(1 AS BIGINT) AS dyn_scoped
        |FROM (SELECT o_orderpriority,
        |        CASE WHEN o_orderpriority IN ('1-URGENT', '3-MEDIUM')
        |             THEN o_totalprice * 2 ELSE o_totalprice END AS p
        |      FROM orders WHERE o_orderkey % 19 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val path =
        s"target/fixtures/dyno_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val conf = s.sessionState.newHadoopConf()
      if (new TxnLog(path, conf).versions() != Seq(0L, 1L)) {
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val od = Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 19 === 0)
        TableWriter.write(s, od, path,
          partitionBy = Seq("o_orderpriority"), version = 0L,
          commitTs = 1000L)
        TableWriter.overwritePartitionsDynamic(s, path,
          od.filter(col("o_orderpriority")
              .isin("1-URGENT", "3-MEDIUM"))
            .withColumn("o_totalprice", col("o_totalprice") * 2),
          version = 1L, commitTs = 2000L)
      }
      val snap = new TxnLog(path, conf).snapshotLatest()
      val touched = Set("1-URGENT", "3-MEDIUM")
      val others = snap.files.filterNot(f =>
        f.partitionValues.get("o_orderpriority").exists(touched))
      val scoped = others.nonEmpty &&
        others.forall(_.modificationTime <= 1000L) &&
        snap.files.exists(_.modificationTime >= 2000L)
      s.read.format("graft").option("tablePath", path).load()
        .groupBy(col("o_orderpriority").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("dyn_scoped", lit(if (scoped) 1L else 0L))
        .orderBy(col("grp"))
    },

    // MERGE-ON-READ UPDATE and MERGE (spark.graft.update.mode=dv): the
    // exact q208 statement sequence, but matched old rows mark dead in
    // KB-scale deletion-vector sidecars and replacement/insert rows
    // APPEND — no pre-statement file is ever removed or rewritten (the
    // boolean rides the hash). On a 100 TB table this turns the most
    // common DML path from "rewrite every touched ~1 GB file" into
    // "kilobytes of sidecar + one small append"; graft_reorg folds the
    // vectors back off the hot path. RowLevelSpec pins the DV-pointer
    // mechanics, exact CDF images, constraint validation, and the
    // concurrent-DV-delete identity conflict.
    QueryDef.sqlBacked(
      "q332_merge_update_mor",
      """WITH t AS (
        |  SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_id % 8 = 0 AND event_id % 16 <> 0
        |  UNION ALL
        |  SELECT event_id, CAST(FLOOR(value * 200) AS BIGINT)
        |  FROM events WHERE event_id % 16 = 0
        |  UNION ALL
        |  SELECT event_id, CAST(FLOOR(value * 200) AS BIGINT)
        |  FROM events WHERE event_id % 8 = 3),
        |u AS (SELECT event_id,
        |    cents + CASE WHEN event_id % 5 = 0 THEN 7 ELSE 0 END AS cents
        |  FROM t)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
        |  TRUE AS zero_files_rewritten
        |FROM u""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      Tables.load(s, dir, "events").createOrReplaceTempView("events_src")
      s.sql("DROP TABLE IF EXISTS gcat.default.events_mor")
      s.sql(
        """CREATE TABLE gcat.default.events_mor AS
          |SELECT event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
          |FROM events_src WHERE event_id % 8 = 0""".stripMargin)
      s.sql(
        """SELECT event_id, CAST(FLOOR(value * 200) AS BIGINT) AS cents
          |FROM events_src
          |WHERE event_id % 16 = 0 OR event_id % 8 = 3""".stripMargin)
        .createOrReplaceTempView("mor_src")
      val log = new TxnLog(s"$wh/default/events_mor",
        s.sessionState.newHadoopConf())
      val before = log.snapshotLatest().files.map(_.path).toSet
      s.conf.set("spark.graft.update.mode", "dv")
      try {
        s.sql(
          """MERGE INTO gcat.default.events_mor t USING mor_src s
            |ON t.event_id = s.event_id
            |WHEN MATCHED THEN UPDATE SET t.cents = s.cents
            |WHEN NOT MATCHED THEN INSERT (event_id, cents)
            |  VALUES (s.event_id, s.cents)""".stripMargin)
        s.sql(
          """UPDATE gcat.default.events_mor SET cents = cents + 7
            |WHERE event_id % 5 = 0""".stripMargin)
      } finally s.conf.unset("spark.graft.update.mode")
      val after = log.snapshotLatest().files.map(_.path).toSet
      s.sql(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
          |  CAST(SUM(event_id) AS BIGINT) AS id_sum
          |FROM gcat.default.events_mor""".stripMargin)
        .withColumn("zero_files_rewritten", lit(before.subsetOf(after)))
    },

    // Maintenance at EXECUTION time: CALL gcat.system.optimize via
    // Spark 4's ProcedureCatalog. The TVF aliases run their side
    // effects at PLAN time (EXPLAIN would vacuum — the documented
    // caveat); Call implements ExecutableDuringAnalysis, so EXPLAIN
    // stages without invoking (ProcedureSpec pins that) and the body
    // runs exactly once per executed statement. The row certifies the
    // CALL path end-to-end: metrics row consumed, compaction landed
    // (files_after < files_before rides the hash as a boolean), state
    // byte-identical to the oracle's recompute.
    QueryDef.sqlBacked(
      "q333_call_optimize",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  TRUE AS compacted
        |FROM lineitem WHERE l_orderkey % 23 = 0""".stripMargin) { (s, dir) =>
      val wh = s"target/fixtures/wh_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val path = s"$wh/default/li_callopt"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      val conf = s.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      TableWriter.write(s,
        Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") % 23 === 0)
          .select(col("l_orderkey"), col("l_quantity")).repartition(8),
        path, version = 0L, commitTs = 1000L)
      val m = s.sql("CALL gcat.system.optimize(table => 'default.li_callopt')")
        .collect().head
      val compacted = m.getLong(1) == 8L && m.getLong(2) < 8L &&
        new TxnLog(path, conf).snapshotLatest().files.size == m.getLong(2)
      s.read.format("graft").option("tablePath", path).load()
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .withColumn("compacted", lit(compacted))
    },

    // DEEP CLONE via CALL: an independent physical copy of the
    // DV-carrying fixture — data files AND the referenced vectors copy
    // (distributed, one task per file) into the clone's own tree, the
    // clone reads the identical live state (the oracle recomputes it
    // from lineitem arithmetic), owns every path (`all_local`), and a
    // subsequent SOURCE delete provably cannot move it
    // (`independent`). CloneSpec pins shallow→deep materialization and
    // source-vacuum/-removal survival.
    QueryDef.sqlBacked(
      "q340_deep_clone",
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  TRUE AS all_local, TRUE AS independent
        |FROM lineitem
        |WHERE l_orderkey % 13 = 0 AND l_suppkey % 5 <> 0""".stripMargin) {
      (s, dir) =>
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      // OWN source fixture (the shared dvFixture's timings must not pay
      // for this row's post-clone mutation): v0 = %13 rows, v1 = a DV
      // delete — rebuilt whenever a prior run's mutation moved it past
      // its 2-version contract
      val src = s"target/fixtures/deepsrc_$tag"
      val conf = s.sessionState.newHadoopConf()
      val srcLog = new TxnLog(src, conf)
      if (srcLog.versions() != Seq(0L, 1L)) {
        val f = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
        f.delete(new org.apache.hadoop.fs.Path(src), true)
        TableWriter.write(s,
          Tables.load(s, dir, "lineitem")
            .filter(col("l_orderkey") % 13 === 0),
          src, partitionBy = Seq("l_returnflag"),
          version = 0L, commitTs = 1000L)
        DeletionVectors.deleteWhere(s, src, col("l_suppkey") % 5 === 0,
          version = 1L, commitTs = 2000L)
      }
      val wh = s"target/fixtures/wh_$tag"
      val dst = s"$wh/default/li_deep"
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gcat.default")
      val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(dst), true)
      s.sql(s"CALL gcat.system.clone_deep('$src', 'default.li_deep')")
        .collect()
      val log = new TxnLog(dst, conf)
      val allLocal = log.snapshot(0L).files.forall(f =>
        !TxnLog.isExternal(f.path) && f.dv.forall(d =>
          !TxnLog.isExternal(d)))
      val before = s.read.format("graft").option("tablePath", dst).load()
        .count()
      // source mutates AFTER the clone: an entangled clone would move
      DeletionVectors.deleteWhere(s, src,
        col("l_orderkey") % 26 === 0,
        version = srcLog.latestVersion().get + 1,
        commitTs = System.currentTimeMillis())
      val independent = s.read.format("graft")
        .option("tablePath", dst).load().count() == before
      s.read.format("graft").option("tablePath", dst).load()
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .withColumn("all_local", lit(allLocal))
        .withColumn("independent", lit(independent))
    },

    // ANALYZE through CALL, full then INCREMENTAL: the sidecar's exact
    // per-column counts (rows, nulls) are the oracle-checkable core of
    // the stats build (ndv is a sketch, so its value rides as a
    // BOOLEAN: the incremental union must EQUAL a from-scratch rebuild
    // — the register-wise-max property that makes incremental ANALYZE
    // sound). Half the orders load at v0 and analyze fully; the other
    // half appends and analyzes INCREMENTALLY (only the new files
    // scan).
    QueryDef.sqlBacked(
      "q347_call_analyze",
      """WITH t AS (SELECT o_orderkey,
        |    CASE WHEN o_custkey % 17 = 0 THEN NULL ELSE o_custkey END
        |      AS cust_n
        |  FROM orders)
        |SELECT c.col_name AS col_name,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM t) AS n,
        |  CASE c.col_name WHEN 'cust_n' THEN
        |    (SELECT CAST(COUNT(*) FILTER (cust_n IS NULL) AS BIGINT)
        |     FROM t)
        |  ELSE CAST(0 AS BIGINT) END AS n_null,
        |  TRUE AS incremental_used, TRUE AS ndv_matches_rebuild
        |FROM (SELECT 'cust_n' AS col_name UNION ALL
        |      SELECT 'o_orderkey') c
        |ORDER BY col_name""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/analyze_call_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_custkey") % 17 === 0, lit(null))
            .otherwise(col("o_custkey")).as("cust_n"))
      TableWriter.write(s, o.filter(col("o_orderkey") % 2 === 0), path,
        version = 0L, commitTs = 1000L)
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", "target/fixtures")
      s.sql(s"CALL gcat.system.analyze('$path', 'o_orderkey,cust_n')")
        .collect()
      TableWriter.append(s, o.filter(col("o_orderkey") % 2 =!= 0), path,
        commitTs = 2000L)
      val mode = s.sql(s"CALL gcat.system.analyze('$path', " +
          "'o_orderkey,cust_n', incremental => true)")
        .collect().head.getString(2)
      val inc = graft.txn.Analyze.columnStatsFor(s, path)
      graft.txn.Analyze.computeStats(s, path, Seq("o_orderkey", "cust_n"))
      val full = graft.txn.Analyze.columnStatsFor(s, path)
      val ndvMatches = Seq("o_orderkey", "cust_n").forall(c =>
        inc(c).ndv == full(c).ndv && inc(c).minS == full(c).minS &&
          inc(c).maxS == full(c).maxS)
      import s.implicits._
      Seq("cust_n", "o_orderkey").map(c =>
          (c, inc(c).n, inc(c).nNull, mode == "incremental", ndvMatches))
        .toDF("col_name", "n", "n_null", "incremental_used",
          "ndv_matches_rebuild")
        .orderBy(col("col_name"))
    },

    // FSCK through CALL: a partition's files vanish out-of-band (the
    // operator's rm / lifecycle-rule disaster), the dry run lists the
    // loss without touching the log, REPAIR commits the removes, and
    // scans work again with exactly the surviving partitions — DuckDB
    // recomputes the survivors from the same arithmetic.
    QueryDef.sqlBacked(
      "q348_call_fsck",
      """SELECT CAST(event_id % 4 AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  TRUE AS lost_listed_dry, TRUE AS repaired
        |FROM events WHERE event_id % 4 < 3
        |GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/fsck_call_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      TableWriter.write(s,
        Tables.load(s, dir, "events")
          .select(col("event_id"),
            floor(col("value") * 100).cast("long").as("cents"),
            (col("event_id") % 4).as("band")),
        path, partitionBy = Seq("band"), version = 0L, commitTs = 1000L)
      fs.delete(new org.apache.hadoop.fs.Path(path, "band=3"), true)
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", "target/fixtures")
      val dry = s.sql(s"CALL gcat.system.fsck('$path')").collect()
      val lostListed = dry.nonEmpty && dry.forall(r =>
        r.getString(0).startsWith("band=3/") && !r.getBoolean(1))
      val rep = s.sql(
        s"CALL gcat.system.fsck('$path', dry_run => false)").collect()
      val repaired = rep.map(_.getString(0)).toSeq ==
        dry.map(_.getString(0)).toSeq && rep.forall(_.getBoolean(1))
      s.read.format("graft").option("tablePath", path).load()
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .withColumn("lost_listed_dry", lit(lostListed))
        .withColumn("repaired", lit(repaired))
        .orderBy(col("band"))
    },

    // CHECKPOINT through CALL: an explicit checkpoint between the
    // automatic every-N writes — the op a team runs right before log
    // expiry or a burst of time-travel readers. The forced checkpoint
    // at v1 anchors expire_log (v0's commit file drops), a FRESH log
    // then resolves purely from checkpoint + tail (time travel to the
    // expired v0 refuses loudly), and the surviving state must equal
    // the SQL recompute — both booleans ride the hash.
    QueryDef.sqlBacked(
      "q356_call_checkpoint",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  SUM(l_quantity) AS qty,
        |  TRUE AS expired_below_anchor, TRUE AS resolves_from_checkpoint
        |FROM lineitem WHERE l_orderkey % 7 = 0 OR l_orderkey % 11 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
      val path = s"target/fixtures/ckpt_call_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val conf = s.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val li = Tables.load(s, dir, "lineitem")
      TableWriter.write(s, li.filter(col("l_orderkey") % 7 === 0), path,
        version = 0L, commitTs = 1000L)
      TableWriter.append(s,
        li.filter(col("l_orderkey") % 11 === 0 &&
          col("l_orderkey") % 7 =!= 0), path, commitTs = 2000L)
      s.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gcat.warehouse", "target/fixtures")
      val ck = s.sql(s"CALL gcat.system.checkpoint('$path')").collect()
      val expired = s.sql(
        s"CALL gcat.system.expire_log('$path', retain_millis => 0)")
        .collect()
      val expiredV0 = expired.map(_.getString(0))
        .contains(f"${0L}%020d.json")
      // a FRESH log must resolve purely from the forced checkpoint +
      // tail; the expired v0 must refuse, never silently misread
      val fresh = new TxnLog(path, conf)
      val resolves = ck.head.getLong(0) == 1L &&
        fresh.snapshotLatest().version == 1L &&
        (try { fresh.snapshot(0L); false }
         catch { case _: IllegalArgumentException => true })
      s.read.format("graft").option("tablePath", path).load()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .withColumn("expired_below_anchor", lit(expiredV0))
        .withColumn("resolves_from_checkpoint", lit(resolves))
        .orderBy(col("l_returnflag"))
    },

    // RIGHT-TO-BE-FORGOTTEN, end to end (the GDPR/CCPA erasure path):
    // DV delete of one user's rows (kilobyte sidecar, ZERO files
    // rewritten — `delete_was_dv_only` rides the hash), REORG folds the
    // vectors away, VACUUM removes the originals — and the proof is a
    // RAW parquet read of the table directory that BYPASSES the log:
    // after the pipeline, no byte on disk contains the user
    // (`raw_files_clean` — also pins that vacuum actually removed the
    // pre-purge files: the raw view must equal the logical view).
    QueryDef.sqlBacked(
      "q360_forget_user",
      """SELECT CAST(event_id % 8 AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  TRUE AS delete_was_dv_only, TRUE AS raw_files_clean
        |FROM events WHERE user_id % 37 <> 3
        |GROUP BY 1 ORDER BY band""".stripMargin) { (s, dir) =>
      val path = s"target/fixtures/forget_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val conf = s.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      TableWriter.write(s,
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            floor(col("value") * 100).cast("long").as("cents"),
            (col("event_id") % 8).as("band"))
          .repartition(4),
        path, version = 0L, commitTs = 1000L)
      val log = new TxnLog(path, conf)
      val before = log.snapshotLatest().files.map(_.path).toSet
      DeletionVectors.deleteWhere(s, path,
        pmod(col("user_id"), lit(37L)) === 3,
        version = 1L, commitTs = 2000L)
      val afterDel = log.snapshotLatest().files
      val dvOnly = afterDel.map(_.path).toSet == before &&
        afterDel.exists(_.dv.isDefined)
      DeletionVectors.purge(s, path, version = 2L, commitTs = 3000L)
      TableWriter.vacuum(s, path, retainMillis = 0L,
        nowMillis = System.currentTimeMillis() + 3600L * 1000)
      // raw-bytes proof: a plain parquet read of the table dir bypasses
      // the log entirely (underscore dirs are ignored by the reader) —
      // the user must be gone from DISK, not just from the logical view
      val logical = SnapshotReader.read(s, path)
      val raw = s.read.parquet(path)
      val rawClean =
        raw.filter(pmod(col("user_id"), lit(37L)) === 3).count() == 0 &&
          raw.count() == logical.count()
      logical.groupBy(col("band"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .withColumn("delete_was_dv_only", lit(dvOnly))
        .withColumn("raw_files_clean", lit(rawClean))
        .orderBy(col("band"))
    },

    // CLUSTERING-DEPTH audit (the OPTIMIZE advisor's headline number,
    // Delta/Iceberg's "overlap depth"): per key range, how many files a
    // point lookup on l_orderkey must open — computed by the classic
    // interval SWEEP over per-file [min, max] envelopes (+1 at min, -1
    // past max, running sum), NEVER a file-pair join. The per-file
    // envelopes come from grouping the scan by the _graft_file metadata
    // column; DuckDB re-derives them with read_parquet(filename=true)
    // over the same fixture (path SF-parameterized via {{SF_TAG}}), so
    // the metadata column, the envelope math and the sweep all ride the
    // driver hash. The fixture overlays 2 unsorted full-range files on
    // 6 disjoint ranges — depth spans 1..3, the decay OPTIMIZE repairs.
    // The event frame is 2·|files| rows, so the unpartitioned running-
    // sum window is CONSTANT-bounded by design (q315's rule).
    QueryDef.sqlBacked(
      "q368_clustering_depth",
      """WITH f AS (SELECT filename,
        |    MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx
        |  FROM read_parquet(
        |    '/root/repo/target/fixtures/ovl_{{SF_TAG}}/*.parquet',
        |    filename=true)
        |  GROUP BY 1),
        |ev AS (SELECT pos, SUM(d) AS d FROM (
        |    SELECT mn AS pos, 1 AS d FROM f
        |    UNION ALL SELECT mx + 1, -1 FROM f) GROUP BY pos),
        |sw AS (SELECT pos,
        |    SUM(d) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING) AS depth,
        |    LEAD(pos) OVER (ORDER BY pos) AS nxt
        |  FROM ev)
        |SELECT CAST(depth AS BIGINT) AS depth,
        |  CAST(SUM(nxt - pos) AS BIGINT) AS span_keys
        |FROM sw WHERE depth > 0 AND nxt IS NOT NULL
        |GROUP BY 1 ORDER BY depth""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val table = overlapFixture(s, dir)
      val t = s.read.format("graft").option("tablePath", table).load()
      val f = t.groupBy(col("_graft_file"))
        .agg(min(col("l_orderkey")).as("mn"), max(col("l_orderkey")).as("mx"))
      val ev = f.select(col("mn").as("pos"), lit(1L).as("d"))
        .unionAll(f.select((col("mx") + 1).as("pos"), lit(-1L).as("d")))
        .groupBy(col("pos")).agg(sum(col("d")).as("d"))
      val byPos = Window.orderBy(col("pos"))
      ev.withColumn("depth", sum(col("d")).over(
          byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nxt", lead(col("pos"), 1).over(byPos))
        .filter(col("depth") > 0 && col("nxt").isNotNull)
        .groupBy(col("depth").cast("long").as("depth"))
        .agg(sum(col("nxt") - col("pos")).cast("long").as("span_keys"))
        .orderBy(col("depth"))
    }
  )
}
