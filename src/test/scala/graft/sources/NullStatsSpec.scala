package graft.sources

import graft.SparkTestSession
import graft.txn.{DeletionVectors, TableWriter, TxnLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file null counts: recorded from the parquet footers, they prune
  * IS NULL / IS NOT NULL scans at the file level and answer COUNT(col)
  * from stats alone — with deletion vectors refusing the aggregate path
  * (deletion could have removed nulls or non-nulls alike).
  */
class NullStatsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** v0: 10 non-null rows; v1: 10 rows, half null; v2: 5 all-null rows. */
  private def build(): String = {
    val dir = java.nio.file.Files.createTempDirectory("ns").toString + "/t"
    TableWriter.write(spark,
      (1L to 10L).map(i => (i, Some(i * 2))).toDF("id", "v").coalesce(1),
      dir, version = 0L, commitTs = 1000L)
    TableWriter.append(spark,
      (11L to 20L).map(i => (i, if (i % 2 == 0) Some(i * 2) else None))
        .toDF("id", "v").coalesce(1), dir, commitTs = 2000L)
    TableWriter.append(spark,
      (21L to 25L).map(i => (i, None: Option[Long]))
        .toDF("id", "v").coalesce(1), dir, commitTs = 3000L)
    dir
  }

  private def read(dir: String): DataFrame =
    spark.read.format("graft").option("tablePath", dir).load()

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("footer stats record per-file null counts (all-null included)") {
    val dir = build()
    val stats = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.flatMap(_.stats)
      .map(st => (st.numRecords, st.nullCounts.get("v"))).sortBy(_._1)
    assert(stats == Seq((5L, Some(5L)), (10L, Some(0L)), (10L, Some(5L))))
  }

  test("IS NULL scans only null-bearing files; IS NOT NULL skips all-null") {
    val dir = build()
    val isNull = read(dir).filter(col("v").isNull)
    assert(planOf(isNull).contains("files=2/3"),
      s"IS NULL must skip the zero-null file: ${planOf(isNull)}")
    assert(isNull.count() == 10L)
    val notNull = read(dir).filter(col("v").isNotNull)
    assert(planOf(notNull).contains("files=2/3"),
      "IS NOT NULL must skip the all-null file")
    assert(notNull.count() == 15L)
    // combined with a range: both prunings compose
    val both = read(dir).filter(col("v").isNotNull && col("id") >= 21L)
    assert(both.count() == 0L)
  }

  test("COUNT(col) answers from stats alone; count(*) still does too") {
    val dir = build()
    val q = read(dir).agg(count(col("v")).as("n"), count(lit(1)).as("all"))
    assert(planOf(q).contains("GraftBatchAgg"),
      s"COUNT(col) must answer from null counts: ${planOf(q)}")
    assert(q.head() == org.apache.spark.sql.Row(15L, 25L))
  }

  test("deletion vectors refuse the COUNT(col) push; values stay right") {
    val dir = build()
    DeletionVectors.deleteWhere(spark, dir, col("id") <= 3L,
      version = 3L, commitTs = 4000L)
    val q = read(dir).agg(count(col("v")).as("n"))
    assert(!planOf(q).contains("GraftBatchAgg"),
      "a DV-carrying snapshot cannot answer COUNT(col) from stats")
    assert(q.head().getLong(0) == 12L)
  }

  test("partition columns prune IS NULL via the hive sentinel") {
    val dir = java.nio.file.Files.createTempDirectory("ns_p").toString + "/t"
    TableWriter.write(spark,
      Seq((1L, Some("x")), (2L, Some("y")), (3L, None), (4L, None))
        .toDF("id", "grp").coalesce(1), dir, partitionBy = Seq("grp"),
      version = 0L, commitTs = 1000L)
    val total = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.size
    val isNull = read(dir).filter(col("grp").isNull)
    assert(planOf(isNull).contains(s"files=1/$total"),
      s"only the sentinel partition may hold nulls: ${planOf(isNull)}")
    assert(isNull.count() == 2L)
    val notNull = read(dir).filter(col("grp").isNotNull)
    assert(planOf(notNull).contains(s"files=${total - 1}/$total"))
    assert(notNull.count() == 2L)
  }

  test("pre-feature stats (no null counts) refuse, never guess") {
    val dir = build()
    // simulate an old log: strip nullCounts from every AddFile
    val conf = spark.sessionState.newHadoopConf()
    val log = new TxnLog(dir, conf)
    val snap = log.snapshotLatest()
    val stripped = snap.files.map(f =>
      f.copy(stats = f.stats.map(_.copy(nullCounts = Map.empty))))
    log.commit(snap.version + 1,
      snap.files.map(f => graft.txn.RemoveFile(f.path, 5000L,
        f.partitionValues, dataChange = false)) ++
        stripped.map(_.copy(dataChange = false)) :+
        graft.txn.CommitInfo("STRIP", 5000L))
    val q = read(dir).agg(count(col("v")).as("n"))
    assert(!planOf(q).contains("GraftBatchAgg"))
    assert(q.head().getLong(0) == 15L)
    val isNull = read(dir).filter(col("v").isNull)
    assert(planOf(isNull).contains("files=3/3"),
      "unknown null counts must keep every file")
    assert(isNull.count() == 10L)
  }
}
