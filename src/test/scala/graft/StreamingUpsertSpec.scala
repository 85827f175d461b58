package graft

import graft.txn._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** foreachBatch MERGE upsert (q243's shape) is exactly-once across
  * restarts: the second drain of a shared checkpoint applies ONLY the
  * commits that arrived since the first. The MERGE here ACCUMULATES
  * (t.cents + s.cents) instead of overwriting, so a replayed batch
  * would be visible as a doubled value — overwrite-MERGE idempotence
  * can't mask an offset-tracking bug.
  */
class StreamingUpsertSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("gsu_wh").toString
    spark.conf.set("spark.sql.catalog.gsu",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsu.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsu.default")
    dir
  }

  private def drain(src: String, ck: String): Unit = {
    val q = spark.readStream.format("graft")
      .option("tablePath", src)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.createOrReplaceTempView("gsu_batch")
        b.sparkSession.sql(
          """MERGE INTO gsu.default.acc t
            |USING (SELECT k, cents FROM gsu_batch) s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET t.cents = t.cents + s.cents
            |WHEN NOT MATCHED THEN INSERT (k, cents)
            |  VALUES (s.k, s.cents)""".stripMargin)
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "drain did not self-terminate")
  }

  private def state(): Seq[(Long, Long)] =
    spark.sql("SELECT k, cents FROM gsu.default.acc ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("each source commit MERGEs exactly once across two drains") {
    wh
    spark.sql("DROP TABLE IF EXISTS gsu.default.acc")
    spark.sql("CREATE TABLE gsu.default.acc (k BIGINT, cents BIGINT)")
    val src = java.nio.file.Files.createTempDirectory("gsu_src").toString + "/t"
    val ck = java.nio.file.Files.createTempDirectory("gsu_ck").toString
    TableWriter.write(spark, Seq((1L, 10L), (2L, 20L)).toDF("k", "cents"),
      src, version = 0L, commitTs = 1000L)
    drain(src, ck)
    assert(state() == Seq((1L, 10L), (2L, 20L)))

    TableWriter.append(spark, Seq((2L, 5L), (3L, 30L)).toDF("k", "cents"),
      src, commitTs = 2000L)
    drain(src, ck)
    // v0 NOT re-applied (else 1->20, 2->45); v1 applied exactly once
    assert(state() == Seq((1L, 10L), (2L, 25L), (3L, 30L)))

    // an idle third drain applies nothing at all
    drain(src, ck)
    assert(state() == Seq((1L, 10L), (2L, 25L), (3L, 30L)))
  }
}
