package graft

import graft.txn.{SnapshotReader, TableWriter, TxnLog}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE schema evolution (autoMergeSchema): source-only columns evolve
  * the table schema atomically with the merged data; untouched files
  * surface them as null. Off by default; historically-declared names
  * refuse (their bytes may survive in live files).
  */
class MergeEvolutionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("a source-only column evolves the schema with the merge") {
    val dir = freshDir("me1")
    TableWriter.write(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").coalesce(1),
      dir, version = 0L, commitTs = 1000L)
    // second file so one stays untouched by the merge
    TableWriter.append(spark,
      Seq((10L, "x"), (11L, "y")).toDF("id", "name").coalesce(1),
      dir, commitTs = 2000L)
    val src = Seq((2L, "B", 99L), (4L, "d", 44L)).toDF("id", "name", "score")
    TableWriter.mergeUpsert(spark, dir, src, Seq("id"),
      version = 2L, commitTs = 3000L, autoMergeSchema = true)
    val t = SnapshotReader.read(spark, dir)
    assert(t.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    val rows = t.collect().map(r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows == Set((1L, "a", -1L), (2L, "B", 99L), (3L, "c", -1L),
      (4L, "d", 44L), (10L, "x", -1L), (11L, "y", -1L)),
      s"got $rows")
    // the untouched file was NOT rewritten
    val live = new TxnLog(dir, spark.sessionState.newHadoopConf())
      .snapshotLatest().files
    assert(live.exists(_.modificationTime == 2000L),
      "the file without matched keys must keep its path")
  }

  test("extra columns refuse without the flag") {
    val dir = freshDir("me2")
    TableWriter.write(spark, Seq((1L, "a")).toDF("id", "name"), dir,
      version = 0L, commitTs = 1000L)
    val e = intercept[IllegalArgumentException] {
      TableWriter.mergeUpsert(spark, dir,
        Seq((1L, "a", 9L)).toDF("id", "name", "score"), Seq("id"),
        version = 1L, commitTs = 2000L)
    }
    assert(e.getMessage.contains("autoMergeSchema"))
  }

  test("a source missing a DECLARED column refuses (no silent nulls)") {
    val dir = freshDir("me4")
    TableWriter.write(spark,
      Seq((1L, "a", 5L)).toDF("id", "name", "qty"), dir,
      version = 0L, commitTs = 1000L)
    // 'name' absent + 'score' extra: evolution must not smuggle in a
    // null-filling whole-row replacement
    val e = intercept[IllegalArgumentException] {
      TableWriter.mergeUpsert(spark, dir,
        Seq((1L, 9L, 3L)).toDF("id", "qty", "score"), Seq("id"),
        version = 1L, commitTs = 2000L, autoMergeSchema = true)
    }
    assert(e.getMessage.contains("every declared column"))
  }

  test("a historically-declared name refuses toward ALTER TABLE") {
    val dir = freshDir("me3")
    TableWriter.write(spark,
      Seq((1L, "a", 7L)).toDF("id", "name", "score"), dir,
      version = 0L, commitTs = 1000L)
    TableWriter.dropColumn(spark, dir, "score", version = 1L,
      commitTs = 2000L)
    val e = intercept[IllegalArgumentException] {
      TableWriter.mergeUpsert(spark, dir,
        Seq((2L, "b", 9L)).toDF("id", "name", "score"), Seq("id"),
        version = 2L, commitTs = 3000L, autoMergeSchema = true)
    }
    assert(e.getMessage.contains("historical"))
  }
}
