package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.txn._

/** CHECK constraints: writer-enforced data-quality rules stored in table
  * Metadata — violating writes fail BEFORE staging a file, NULL passes
  * (SQL CHECK semantics), constraints survive schema evolution and
  * checkpoints, ADD CONSTRAINT validates existing rows, and MERGE
  * enforces on its source side.
  */
class ConstraintSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val conf = new org.apache.hadoop.conf.Configuration()

  private def fresh(tag: String): String = {
    val dir = s"target/fixtures/ck_${tag}_${System.nanoTime()}"
    dir
  }

  private def seed(dir: String, constraints: Seq[String]): Unit = {
    val a = Seq((1L, 10.0, "en"), (2L, 20.0, "de"))
      .toDF("id", "score", "lang")
    TableWriter.write(spark, a, dir, version = 0L, commitTs = 1000L,
      extraActions =
        if (constraints.isEmpty) Seq.empty
        else Seq(Metadata(a.schema.json, Seq.empty, constraints)))
  }

  test("violating append fails loudly, names the constraint, stages nothing") {
    val dir = fresh("basic")
    seed(dir, Seq("score >= 0", "lang IN ('en','de','fr')"))
    val bad = Seq((3L, -5.0, "en"), (4L, 1.0, "xx")).toDF("id", "score", "lang")
    val e = intercept[IllegalArgumentException] {
      TableWriter.append(spark, bad, dir, commitTs = 2000L)
    }
    assert(e.getMessage.contains("score >= 0") && e.getMessage.contains("1 rows"))
    assert(e.getMessage.contains("lang IN") && e.getMessage.contains("1 rows"))
    // nothing committed, nothing staged
    assert(new TxnLog(dir, conf).latestVersion().contains(0L))
    assert(SnapshotReader.read(spark, dir).count() == 2)
  }

  test("valid append passes; NULL passes (SQL CHECK semantics)") {
    val dir = fresh("nulls")
    seed(dir, Seq("score >= 0"))
    val ok = Seq((3L, Some(5.0), "en"), (4L, None, "fr"))
      .toDF("id", "score", "lang")
    TableWriter.append(spark, ok, dir, commitTs = 2000L)
    assert(SnapshotReader.read(spark, dir).count() == 4)
  }

  test("ADD CONSTRAINT validates existing rows; then enforces on writes") {
    val dir = fresh("add")
    seed(dir, Seq.empty)
    // a constraint the existing data violates is refused
    intercept[IllegalArgumentException] {
      TableWriter.addConstraint(spark, dir, "score > 15", 1L, commitTs = 2000L)
    }
    // one it satisfies commits, and subsequently enforces
    TableWriter.addConstraint(spark, dir, "score > 5", 1L, commitTs = 2000L)
    intercept[IllegalArgumentException] {
      TableWriter.append(spark, Seq((9L, 3.0, "en")).toDF("id", "score", "lang"),
        dir, commitTs = 3000L)
    }
    TableWriter.append(spark, Seq((9L, 30.0, "en")).toDF("id", "score", "lang"),
      dir, commitTs = 3000L)
    assert(SnapshotReader.read(spark, dir).count() == 3)
  }

  test("constraints survive schema evolution AND parquet checkpoints") {
    val dir = fresh("evolve")
    seed(dir, Seq("score >= 0"))
    // schema-evolution commit WITHOUT restating constraints: they carry
    val evolved = Seq((5L, 1.0, "en", true)).toDF("id", "score", "lang", "flag")
    TableWriter.write(spark, evolved, dir, version = 1L, commitTs = 2000L,
      extraActions = Seq(Metadata(evolved.schema.json, Seq.empty)))
    val l = new TxnLog(dir, conf)
    assert(l.snapshotLatest().metadata.exists(_.constraints == Seq("score >= 0")))
    intercept[IllegalArgumentException] {
      TableWriter.append(spark,
        Seq((6L, -1.0, "en", false)).toDF("id", "score", "lang", "flag"),
        dir, commitTs = 3000L)
    }
    // checkpoint round-trip keeps them
    val v = l.latestVersion().get
    l.writeCheckpoint(v)
    val l2 = new TxnLog(dir, conf)
    assert(l2.checkpointVersions().contains(v))
    assert(l2.snapshot(v).metadata.exists(_.constraints == Seq("score >= 0")))
  }

  test("MERGE enforces constraints on its source side") {
    val dir = fresh("merge")
    seed(dir, Seq("score >= 0"))
    intercept[IllegalArgumentException] {
      TableWriter.mergeUpsert(spark, dir,
        Seq((1L, -99.0, "en")).toDF("id", "score", "lang"),
        keyCols = Seq("id"), version = 1L, commitTs = 2000L)
    }
    TableWriter.mergeUpsert(spark, dir,
      Seq((1L, 99.0, "en")).toDF("id", "score", "lang"),
      keyCols = Seq("id"), version = 1L, commitTs = 2000L)
    val got = SnapshotReader.read(spark, dir)
      .filter(col("id") === 1L).select("score").as[Double].collect().toSeq
    assert(got == Seq(99.0))
  }
}
