package graft

import graft.operators.TextIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted inverted index: incremental refresh equals a full rebuild,
  * the high-water skips already-indexed documents, and retrieval
  * through the index equals the direct (index-free) recompute.
  */
class TextIndexSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val docs = Seq(
    (1L, "red fox jumps over the lazy dog tonight"),
    (2L, "red fox jumps over the sleepy cat tonight"),
    (3L, "a completely different document about spark engines"),
    (4L, "red fox jumps over the lazy dog again today"),
    (5L, "spark engines power a completely different document"))
    .toDF("doc_id", "text")

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"

  test("build + refresh equals one-shot build, posting for posting") {
    val a = fresh("tixa")
    TextIndex.build(spark, docs.filter(col("doc_id") <= 3), a)
    val added = TextIndex.refresh(spark, docs, a)
    assert(added == 2L)
    val b = fresh("tixb")
    TextIndex.build(spark, docs, b)
    val pa = TextIndex.load(spark, a).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pb = TextIndex.load(spark, b).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pa == pb)
  }

  test("an up-to-date index refreshes to a no-op, no empty commit") {
    val p = fresh("tixc")
    TextIndex.build(spark, docs, p)
    val vBefore = TextIndex.versions(spark, p)
    assert(TextIndex.refresh(spark, docs, p) == 0L)
    assert(TextIndex.versions(spark, p) == vBefore)
  }

  test("retrieval through the index equals the direct recompute") {
    val p = fresh("tixd")
    TextIndex.build(spark, docs, p)
    val got = TextIndex.similar(spark, p,
        Seq(1L, 3L).toDF("doc_id"), dfCap = 100, k = 2)
      .orderBy(col("q_doc"), col("shared").desc, col("match_doc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 shares the "red fox jumps over the" run with 2 and 4 (4 is
    // also "lazy dog"); doc 3 shares with 5
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 4L), (1L, 2L), (3L, 5L)),
      s"unexpected ranking: ${got.toSeq}")
    val shared14 = got.find(t => t._1 == 1L && t._2 == 4L).get._3
    val shared12 = got.find(t => t._1 == 1L && t._2 == 2L).get._3
    assert(shared14 > shared12, "doc 4 shares strictly more shingles")
  }

  test("a shingle-less newest doc still advances the high-water") {
    val p = fresh("tixf")
    TextIndex.build(spark, docs, p)
    // doc 6 has < 3 tokens => zero shingles; the empty-doc marker must
    // record it so the NEXT refresh is a true no-op (no version churn)
    val withShort = docs.unionByName(Seq((6L, "too short")).toDF("doc_id", "text"))
    assert(TextIndex.refresh(spark, withShort, p) == 1L)
    val vAfter = TextIndex.versions(spark, p)
    assert(TextIndex.refresh(spark, withShort, p) == 0L)
    assert(TextIndex.versions(spark, p) == vAfter,
      "re-refresh after an empty doc must not commit")
    // the marker never surfaces as similarity
    assert(TextIndex.similar(spark, p, Seq(6L).toDF("doc_id")).count() == 0L)
  }

  test("the df cap drops flooded shingles before the probe join") {
    val p = fresh("tixe")
    TextIndex.build(spark, docs, p)
    // cap=1 kills every shared shingle (each appears in >=2 docs here)
    assert(TextIndex.similar(spark, p, Seq(1L).toDF("doc_id"),
      dfCap = 1, k = 3).count() == 0L)
  }
}
