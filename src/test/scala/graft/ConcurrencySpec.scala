package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{OptimisticTxn, SnapshotReader, TableWriter, TxnLog}

/** Optimistic concurrency: losers of the version race re-execute against
  * the fresh snapshot and land serializably.
  */
class ConcurrencySpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("racing appenders all commit, at distinct versions, losing nothing") {
    val dir = freshDir("conc1")
    val li = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 11 === 0)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    val conf = spark.sessionState.newHadoopConf()
    val slices = (0 until 4).map(i =>
      Tables.load(spark, sf, "lineitem")
        .filter(col("l_orderkey") % 7 === i + 1))
    val threads = slices.zipWithIndex.map { case (s, i) =>
      new Thread(() => {
        val log = new TxnLog(dir, conf) // one log handle per writer
        OptimisticTxn.retrying(log) { v =>
          TableWriter.write(spark, s, dir, version = v,
            commitTs = 2000L + i)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val log = new TxnLog(dir, conf)
    assert(log.versions() == Seq(0L, 1L, 2L, 3L, 4L),
      "four racers must land at four consecutive versions")
    val want = li.count() + slices.map(_.count()).sum
    assert(SnapshotReader.read(spark, dir).count() == want,
      "every racer's rows must survive the race")
  }

  test("racing rewriters serialize: both deletes apply, any order") {
    val dir = freshDir("conc2")
    val li = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 7 === 0)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    val conf = spark.sessionState.newHadoopConf()
    val preds = Seq(col("l_suppkey") % 5 === 0, col("l_partkey") % 3 === 0)
    val threads = preds.map { p =>
      new Thread(() => {
        val log = new TxnLog(dir, conf)
        OptimisticTxn.retrying(log) { v =>
          // deleteWhere re-reads snapshotLatest() on every attempt, so a
          // retry recomputes its affected files over the winner's state
          TableWriter.deleteWhere(spark, dir, p, version = v,
            commitTs = 2000L + v)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val want = li.filter(!(col("l_suppkey") % 5 === 0) &&
      !(col("l_partkey") % 3 === 0)).count()
    assert(SnapshotReader.read(spark, dir).count() == want,
      "serial application of both deletes, regardless of commit order")
  }

  test("without retry, the collision is loud; retries are bounded") {
    val dir = freshDir("conc3")
    val li = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 13 === 0)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    // direct commit at an occupied version: the raw protocol refuses
    val e = intercept[IllegalStateException] {
      TableWriter.write(spark, li, dir, version = 0L, commitTs = 2000L)
    }
    assert(e.getMessage.contains("concurrent commit"))
    // a hopeless op (always targets an occupied version) exhausts retries
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    val e2 = intercept[IllegalStateException] {
      OptimisticTxn.retrying(log, maxRetries = 2) { _ =>
        TableWriter.write(spark, li, dir, version = 0L, commitTs = 3000L)
      }
    }
    assert(e2.getMessage.contains("still colliding"))
  }

  test("rebasing appenders race without re-executing: all rows land") {
    val dir = freshDir("conc4")
    val li = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 11 === 0)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    val conf = spark.sessionState.newHadoopConf()
    val slices = (0 until 6).map(i =>
      Tables.load(spark, sf, "lineitem")
        .filter(col("l_orderkey") % 7 === i + 1))
    val versions = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = slices.zipWithIndex.map { case (s, i) =>
      new Thread(() => versions.add(
        TableWriter.appendRebasing(spark, s, dir, commitTs = 2000L + i)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(versions.asScala.toSeq.sorted == (1L to 6L),
      "six rebasing racers land at six consecutive versions")
    val want = li.count() + slices.map(_.count()).sum
    assert(SnapshotReader.read(spark, dir).count() == want)
    // no orphans: every data file in the tree is referenced by the log
    assert(orphanFree(dir),
      "a winner-take-all race must leave no unreferenced files behind")
  }

  private def orphanFree(dir: String): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val live = new TxnLog(dir, conf).snapshotLatest().files.map(_.path).toSet
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) {
          if (st.getPath.getName == "_txn_log") Seq.empty else walk(st.getPath)
        } else if (st.getPath.getName.endsWith(".parquet"))
          Seq(st.getPath.toString.stripPrefix(root.toString + "/"))
        else Seq.empty
      }
    walk(root).toSet == live
  }

  test("rebase commutes with an interleaved data-only commit: no re-run") {
    val dir = freshDir("conc5")
    val li = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 11 === 0)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    val mine = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 7 === 1)
    val other = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 7 === 2)
    // the interleaved append lands AFTER this rebase read version 0 and
    // staged its files, BEFORE its commit loop starts — the seam makes
    // the race deterministic
    val v = TableWriter.appendRebasing(spark, mine, dir, commitTs = 3000L,
      onStaged = () =>
        TableWriter.write(spark, other, dir, version = 1L, commitTs = 2000L))
    assert(v == 2L, "rebase lands one past the interleaved commit")
    assert(SnapshotReader.read(spark, dir).count() ==
      li.count() + mine.count() + other.count())
    assert(orphanFree(dir))
  }

  test("rebase refuses across an interleaved metadata change, cleanly") {
    val dir = freshDir("conc6")
    val li = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 11 === 0)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    val mine = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 7 === 1)
    // a RENAME COLUMN (metadata-only) interleaves: appends do NOT commute
    // with metadata changes, so the rebase must refuse and clean up
    val e = intercept[IllegalStateException] {
      TableWriter.appendRebasing(spark, mine, dir, commitTs = 3000L,
        onStaged = () => TableWriter.renameColumn(spark, dir,
          "l_linestatus", "l_status", version = 1L, commitTs = 2000L))
    }
    assert(e.getMessage.contains("concurrent metadata change"))
    // the staged-but-refused files are gone; the table is intact
    assert(orphanFree(dir))
    assert(SnapshotReader.read(spark, dir).count() == li.count())
    // and a fresh append against the renamed schema succeeds
    val v = TableWriter.appendRebasing(spark,
      mine.withColumnRenamed("l_linestatus", "l_status"), dir, commitTs = 4000L)
    assert(v == 2L)
  }

  test("racing idempotent appenders retry through collisions, each lands once") {
    import spark.implicits._
    val dir = freshDir("conc_idem")
    TableWriter.write(spark, Seq((0L, 0L)).toDF("id", "v"), dir,
      version = 0L, commitTs = 1000L)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        try TableWriter.appendIdempotent(spark,
          Seq((i.toLong, i * 10L)).toDF("id", "v"), dir,
          appId = s"job-$i", txnVersion = 1L, maxAttempts = 12)
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty,
      s"a benign concurrent commit must retry, not throw: $errs")
    val snap = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest()
    assert((1 to 4).forall(i => snap.txns.get(s"job-$i").contains(1L)),
      s"every racer's marker must land, got ${snap.txns}")
    assert(SnapshotReader.read(spark, dir).select(col("id"))
      .collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L, 4L))
    // any epoch replayed after the race skips against the fresh snapshot
    assert(TableWriter.appendIdempotent(spark,
      Seq((99L, 0L)).toDF("id", "v"), dir, "job-2", 1L).isEmpty)
  }
}
