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

  def defs: Seq[QueryDef] = Seq(
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
    }
  )
}
