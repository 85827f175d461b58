package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.txn.{DataSkipping, TableWriter, TxnLog}

/** String stats truncation: long text bounds land in the log as capped
  * prefixes (min) / truncate-and-increment upper bounds (max), sound for
  * skipping, tight=false for the MIN/MAX pushdown contract.
  */
class StatsTruncationSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  test("long string bounds truncate soundly; tight flips off") {
    import spark.implicits._
    val dir = freshDir("trunc1")
    val docs = Seq("apple " * 40, "mango " * 40, "zebra " * 40)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    TableWriter.write(spark, docs.toDF("id", "text").coalesce(1), dir,
      version = 0L, commitTs = 1000L)
    val f = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.head
    val st = f.stats.get
    assert(!st.tight)
    val mn = st.minValues("text")
    val mx = st.maxValues("text")
    assert(mn.length <= 65 && mx.length <= 65, s"uncapped: $mn / $mx")
    docs.map(_._2).foreach { v =>
      assert(cmp(mn, v) <= 0, s"min bound $mn above value")
      assert(cmp(mx, v) > 0, s"max bound $mx not above value")
    }
    // numeric bounds stay exact alongside the truncated string
    assert(st.minValues("id") == "0" && st.maxValues("id") == "2")
  }

  test("short strings keep exact tight bounds") {
    import spark.implicits._
    val dir = freshDir("trunc2")
    TableWriter.write(spark,
      Seq((1L, "alpha"), (2L, "omega")).toDF("id", "text").coalesce(1),
      dir, version = 0L, commitTs = 1000L)
    val st = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files.head.stats.get
    assert(st.tight)
    assert(st.minValues("text") == "alpha" && st.maxValues("text") == "omega")
  }

  test("statsMinMax scans truncated-string files instead of fabricating " +
      "bounds") {
    import spark.implicits._
    val dir = freshDir("trunc4")
    val a = "apple " * 40
    val z = "zebra " * 40
    TableWriter.write(spark,
      Seq((1L, a), (2L, z)).toDF("id", "text").coalesce(1), dir,
      version = 0L, commitTs = 1000L)
    // the stored bounds are truncated (no real row holds them) — the
    // metadata-only answer must fall back to scanning and return REAL
    // values; numeric columns still answer from stats
    val (mn, mx) = graft.txn.SnapshotReader.statsMinMax(spark, dir, "text")
    assert(mn == a && mx == z)
    val (imn, imx) = graft.txn.SnapshotReader.statsMinMax(spark, dir, "id")
    assert(imn == 1L && imx == 2L)
  }

  test("skipping still prunes on truncated bounds, never falsely") {
    import spark.implicits._
    val dir = freshDir("trunc3")
    // two files with disjoint long-text prefixes
    TableWriter.write(spark,
      Seq((1L, "aaaa " * 40)).toDF("id", "text").coalesce(1), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.append(spark,
      Seq((2L, "zzzz " * 40)).toDF("id", "text").coalesce(1), dir,
      commitTs = 2000L)
    val files = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files
    // a probe equal to the 'z' value prunes the 'a' file but keeps 'z'
    // (truncated bounds still bracket the real values)
    val zVal = "zzzz " * 40
    val kept = DataSkipping.pruneFiles(files,
      org.apache.spark.sql.types.StringType, "text", zVal, zVal)
    assert(kept.size == 1)
    // ...and a probe equal to a REAL value is never pruned away
    // (the incremented max stays strictly above every value)
    val aVal = "aaaa " * 40
    val keptA = DataSkipping.pruneFiles(files,
      org.apache.spark.sql.types.StringType, "text", aVal, aVal)
    assert(keptA.exists(_.stats.exists(s =>
      cmp(s.minValues("text"), aVal) <= 0)))
  }
}
