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
}
