package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Expectations
import graft.txn.TableWriter

/** Expectations audit: SQL CHECK semantics (NULL passes), one-pass
  * multi-expectation ledger, and the table-constraint variant.
  */
class ExpectationsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  test("violation = predicate exactly FALSE; NULL passes (CHECK semantics)") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (-1L, "b"), (null, "c"), (-2L, null))
      .toDF("v", "tag")
    val got = Expectations.audit(df, Seq(
        "pos_v" -> "v > 0", "tag_set" -> "tag IS NOT NULL"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // v > 0: rows -1, -2 violate; the NULL v row PASSES
    // tag IS NOT NULL: evaluates false (not null) on the null tag row
    assert(got == Seq(
      ("pos_v", 4L, 2L, 500000L),
      ("tag_set", 4L, 1L, 250000L)))
  }

  test("auditTable reads the table's own named constraints") {
    import spark.implicits._
    val dir = freshDir("exp_table")
    TableWriter.write(spark,
      (0L until 50L).map(k => (k, k * 10L)).toDF("k", "cents"),
      dir, version = 0L, commitTs = 1000L)
    TableWriter.addConstraint(spark, dir, "cents >= 0", version = 1L,
      commitTs = 2000L, name = Some("cents_nonneg"))
    val got = Expectations.auditTable(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("cents_nonneg", 50L, 0L)))
    // a constraint-less table refuses rather than returning nothing
    val dir2 = freshDir("exp_none")
    TableWriter.write(spark,
      Seq((1L, 2L)).toDF("k", "cents"), dir2, version = 0L,
      commitTs = 1000L)
    intercept[IllegalArgumentException] {
      Expectations.auditTable(spark, dir2)
    }
  }
}
