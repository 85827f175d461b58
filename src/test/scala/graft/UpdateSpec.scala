package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{CdcReader, SnapshotReader, TableWriter, TxnLog}

/** Row-level UPDATE WHERE and expectation-quarantine appends. */
class UpdateSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("UPDATE rewrites only matching rows; SET sees the OLD row") {
    val dir = freshDir("upd1")
    val li = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 7 === 0)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    // swap-style update: both SETs reference pre-update values
    TableWriter.updateWhere(spark, dir, col("l_quantity") < 10,
      Map("l_quantity" -> (col("l_quantity") + lit(100.0)),
        "l_extendedprice" -> (col("l_extendedprice") + col("l_quantity"))),
      version = 1L, commitTs = 2000L)
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // compare full-row MULTISETS against the same transform applied
    // frame-side
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .sorted.toSeq
    val want = rows(li
      .withColumn("_p", when(col("l_quantity") < 10,
        col("l_extendedprice") + col("l_quantity"))
        .otherwise(col("l_extendedprice")))
      .withColumn("l_quantity", when(col("l_quantity") < 10,
        col("l_quantity") + lit(100.0)).otherwise(col("l_quantity")))
      .withColumn("l_extendedprice", col("_p")))
    assert(rows(SnapshotReader.read(spark, dir)) == want)
  }

  test("UPDATE only rewrites files containing matches") {
    val dir = freshDir("upd2")
    val li = Tables.load(spark, sf, "lineitem")
    // two files with disjoint quantity ranges via partitioned write
    TableWriter.write(spark, li.filter(col("l_orderkey") % 9 === 0)
        .withColumn("qbig", (col("l_quantity") > 25).cast("string")),
      dir, partitionBy = Seq("qbig"), version = 0L, commitTs = 1000L)
    val before = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.map(_.path).toSet
    TableWriter.updateWhere(spark, dir, col("l_quantity") > 40,
      Map("l_discount" -> lit(0.0)), version = 1L, commitTs = 2000L)
    val after = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.map(_.path).toSet
    // the qbig=false file holds quantities ≤ 25: it must survive untouched
    assert(after.exists(before.contains), "all files rewritten")
    assert(after.exists(p => !before.contains(p)), "no file rewritten")
  }

  test("UPDATE with no matches commits a no-op version") {
    val dir = freshDir("upd3")
    TableWriter.write(spark,
      Tables.load(spark, sf, "lineitem").limit(100), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.updateWhere(spark, dir, col("l_quantity") > 1e9,
      Map("l_discount" -> lit(0.0)), version = 1L, commitTs = 2000L)
    val log = new TxnLog(dir, spark.sessionState.newHadoopConf())
    assert(log.versions() == Seq(0L, 1L))
    assert(log.snapshotLatest().files.nonEmpty)
  }

  test("UPDATE cannot bypass CHECK constraints or move partitions") {
    val dir = freshDir("upd4")
    TableWriter.write(spark,
      Tables.load(spark, sf, "lineitem").limit(200)
        .withColumn("flag", col("l_returnflag")),
      dir, partitionBy = Seq("flag"), version = 0L, commitTs = 1000L)
    TableWriter.addConstraint(spark, dir, "l_quantity <= 200",
      version = 1L, commitTs = 2000L)
    intercept[IllegalArgumentException] {
      TableWriter.updateWhere(spark, dir, col("l_quantity") > 10,
        Map("l_quantity" -> lit(500.0)), version = 2L, commitTs = 3000L)
    }
    intercept[IllegalArgumentException] {
      TableWriter.updateWhere(spark, dir, col("l_quantity") > 10,
        Map("flag" -> lit("X")), version = 2L, commitTs = 3000L)
    }
  }

  test("UPDATE emits CDC remove+add churn for the rewritten files") {
    val dir = freshDir("upd5")
    val li = Tables.load(spark, sf, "lineitem").filter(col("l_orderkey") % 11 === 0)
    TableWriter.write(spark, li, dir, version = 0L, commitTs = 1000L)
    TableWriter.updateWhere(spark, dir, col("l_linenumber") === 1,
      Map("l_quantity" -> (col("l_quantity") + 1)),
      version = 1L, commitTs = 2000L)
    val cdc = CdcReader.cdc(spark, dir, startingVersion = 0L,
      includeHistory = false)
    val ops = cdc.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = li.count()
    assert(ops.getOrElse("r", 0L) == n, s"expected $n removes, got $ops")
    assert(ops.getOrElse("c", 0L) == n)
  }

  test("quarantine routes violating rows with their failed expectations") {
    val main = freshDir("q1")
    val quar = freshDir("q2")
    val li = Tables.load(spark, sf, "lineitem")
    val clean = li.filter(col("l_discount") <= 0.08 && col("l_quantity") <= 45)
    TableWriter.write(spark, clean.limit(500), main,
      version = 0L, commitTs = 1000L)
    TableWriter.addConstraint(spark, main, "l_discount <= 0.08", 1L, 2000L)
    TableWriter.addConstraint(spark, main, "l_quantity <= 45", 2L, 3000L)
    val batch = li.limit(5000)
    val (nGood, nBad) = TableWriter.appendWithQuarantine(
      spark, batch, main, quar, commitTs = 4000L)
    val wantBad = batch.filter(col("l_discount") > 0.08 ||
      col("l_quantity") > 45).count()
    assert(nBad == wantBad && nGood == 5000L - wantBad)
    assert(SnapshotReader.read(spark, main).count() == 500L + nGood)
    val q = SnapshotReader.read(spark, quar)
    assert(q.count() == nBad)
    // tags name exactly the violated constraints, in declaration order
    val both = q.filter(col("l_discount") > 0.08 && col("l_quantity") > 45)
    assert(both.filter(col("_violated") ===
      "l_discount <= 0.08;l_quantity <= 45").count() == both.count())
    assert(q.filter(col("_violated") === "").count() == 0)
  }

  test("quarantine on a constraint-free table is a plain append") {
    val main = freshDir("q3")
    val quar = freshDir("q4")
    TableWriter.write(spark,
      Tables.load(spark, sf, "lineitem").limit(100), main,
      version = 0L, commitTs = 1000L)
    val (g, b) = TableWriter.appendWithQuarantine(spark,
      Tables.load(spark, sf, "lineitem").limit(300), main, quar,
      commitTs = 2000L)
    assert(g == 300L && b == 0L)
    assert(new TxnLog(quar, spark.sessionState.newHadoopConf())
      .latestVersion().isEmpty)
  }
}
