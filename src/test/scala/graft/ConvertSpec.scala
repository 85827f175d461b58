package graft

import graft.txn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CONVERT TO DELTA: in-place registration of a plain parquet
  * directory — zero data rewritten, hive partition dirs become typed
  * partition columns (null sentinel included), footer stats power data
  * skipping immediately, and the converted table accepts the full
  * engine surface (append, DV delete, time travel).
  */
class ConvertSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("cvt").toString + "/t"

  test("hive-partitioned dir converts in place, zero rewrite") {
    val dir = freshDir()
    val df = (1L to 100L).map(i => (i, i % 4, s"r$i"))
      .toDF("id", "band", "tag")
    df.write.partitionBy("band").parquet(dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    def dataFiles(): Set[String] = {
      val b = scala.collection.mutable.Set.empty[String]
      def walk(p: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(p).foreach { st =>
          if (st.isDirectory && st.getPath.getName != "_txn_log")
            walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet") &&
            !st.getPath.getParent.getName.equals("_txn_log"))
            b += st.getPath.toString
        }
      walk(new org.apache.hadoop.fs.Path(dir)); b.toSet
    }
    val before = dataFiles()
    val r = Convert.run(spark, dir)
    assert(r.version == 0L && r.rowsRegistered == 100L)
    assert(dataFiles() == before, "conversion must not touch data files")
    val snap = new TxnLog(dir, conf).snapshotLatest()
    assert(snap.metadata.get.partitionColumns == Seq("band"))
    assert(snap.files.forall(_.stats.isDefined), "footer stats required")
    val t = spark.read.format("graft").option("tablePath", dir).load()
    assert(t.count() == 100L)
    assert(t.filter(col("band") === 2L).count() == 25L)
  }

  test("null partition values round-trip through the hive sentinel") {
    val dir = freshDir()
    Seq((1L, Some("x")), (2L, None), (3L, Some("x")))
      .toDF("id", "grp")
      .write.partitionBy("grp").parquet(dir)
    Convert.run(spark, dir)
    val t = spark.read.format("graft").option("tablePath", dir).load()
    assert(t.filter(col("grp").isNull).select(col("id"))
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("the converted table accepts appends, deletes, and time travel") {
    val dir = freshDir()
    (1L to 10L).map(i => (i, i * 2)).toDF("id", "v").write.parquet(dir)
    Convert.run(spark, dir)
    TableWriter.append(spark, Seq((11L, 22L)).toDF("id", "v"), dir,
      commitTs = 5000L)
    DeletionVectors.deleteWhere(spark, dir, col("id") === 1L,
      version = 2L, commitTs = 6000L)
    val t = spark.read.format("graft").option("tablePath", dir).load()
    assert(t.count() == 10L)
    assert(spark.read.format("graft").option("tablePath", dir)
      .option("versionAsOf", "0").load().count() == 10L)
    assert(spark.read.format("graft").option("tablePath", dir)
      .option("versionAsOf", "1").load().count() == 11L)
  }

  test("an already-converted dir refuses re-registration") {
    val dir = freshDir()
    (1L to 3L).map(i => (i, i)).toDF("id", "v").write.parquet(dir)
    Convert.run(spark, dir)
    val e = intercept[IllegalArgumentException] { Convert.run(spark, dir) }
    assert(e.getMessage.contains("already has a transaction log"))
  }

  test("footer stats from conversion drive file skipping") {
    val dir = freshDir()
    // two non-overlapping id ranges in two files
    (1L to 50L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.parquet(dir)
    val stage = java.nio.file.Files.createTempDirectory("cvt2").toString + "/s"
    (100L to 150L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.parquet(stage)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(dir, "extra.parquet"))
    Convert.run(spark, dir)
    val pruned = DataSkipping.pruneFiles(
      new TxnLog(dir, conf).snapshotLatest().files,
      org.apache.spark.sql.types.LongType, "id", 120L, 130L)
    assert(pruned.size == 1, s"expected 1 surviving file, got $pruned")
  }

  test("escaped partition values surface as logical values") {
    val dir = freshDir()
    Seq((1L, "a b:c"), (2L, "plain")).toDF("id", "grp")
      .write.partitionBy("grp").parquet(dir)
    Convert.run(spark, dir)
    // the LOG records the logical value, not the %-escaped dir segment
    val snap = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest()
    assert(snap.files.flatMap(_.partitionValues.get("grp"))
      .contains("a b:c"))
    val t = spark.read.format("graft").option("tablePath", dir).load()
    assert(t.filter(col("grp") === "a b:c").select(col("id"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("date-inferred partition directories read back as dates") {
    val dir = freshDir()
    Seq((1L, java.sql.Date.valueOf("2024-01-01")),
        (2L, java.sql.Date.valueOf("2024-03-15")))
      .toDF("id", "dt").write.partitionBy("dt").parquet(dir)
    Convert.run(spark, dir)
    val t = spark.read.format("graft").option("tablePath", dir).load()
    assert(t.schema("dt").dataType ==
      org.apache.spark.sql.types.DateType)
    assert(t.filter(col("dt") === lit("2024-03-15").cast("date"))
      .select(col("id")).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("timestamp-inferred partition dirs refuse with a clear error") {
    val dir = freshDir()
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts").write.partitionBy("ts").parquet(dir)
    val e = intercept[IllegalArgumentException] { Convert.run(spark, dir) }
    assert(e.getMessage.contains("timestamp"))
  }

  test("converted string stats are skip-only: MIN/MAX falls back to a scan") {
    val dir = freshDir()
    (1L to 40L).map(i => (i, f"tag$i%03d")).toDF("id", "tag")
      .coalesce(1).write.parquet(dir)
    Convert.run(spark, dir)
    val snap = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest()
    assert(snap.files.forall(_.stats.exists(!_.tight)),
      "CONVERT must register foreign stats as non-tight")
    val t = spark.read.format("graft").option("tablePath", dir).load()
    // string MIN/MAX: foreign writers may truncate binary stats, so the
    // stats-only answer refuses and a real scan produces the result
    val sAgg = t.agg(min(col("tag")).as("mn"), max(col("tag")).as("mx"))
    assert(!sAgg.queryExecution.executedPlan.toString
      .contains("GraftBatchAgg"),
      "string MIN/MAX over non-tight stats must not answer from stats")
    assert(sAgg.head() == org.apache.spark.sql.Row("tag001", "tag040"))
    // numeric stats are exact either way — the push survives conversion
    val nAgg = t.agg(min(col("id")).as("mn"))
    assert(nAgg.queryExecution.executedPlan.toString
      .contains("GraftBatchAgg"))
    assert(nAgg.head().getLong(0) == 1L)
  }

  test("a skewed tree (everything under ONE top-level dir, nested deep) " +
      "discovers completely") {
    // the breadth-first frontier shape: root → a → b → {c0..c9} → files;
    // a one-task-per-top-level-dir walk would serialize this whole tree
    val dir = freshDir()
    (0 until 10).foreach { i =>
      (1L to 5L).map(k => (i * 100L + k, s"v$k")).toDF("id", "tag")
        .coalesce(1).write.mode("append").parquet(s"$dir/a/b/c$i")
    }
    val r = Convert.run(spark, dir)
    assert(r.filesRegistered >= 10L && r.rowsRegistered == 50L)
    assert(SnapshotReader.read(spark, dir).count() == 50L)
    // registered paths relativized correctly through the deep chain
    val snap = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest()
    assert(snap.files.forall(f =>
      f.path.startsWith("a/b/c") && !f.path.startsWith("/")))
  }
}
