package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `spark.readStream.table(...)` over catalog tables: snapshot-then-tail
  * payload rows, admission control, and the non-append refusal.
  */
class GraftTableStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("gstream_wh").toString
    spark.conf.set("spark.sql.catalog.gstream", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstream.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gstream.default")
    dir
  }

  test("snapshot first, then one batch per appended commit") {
    wh
    spark.sql("DROP TABLE IF EXISTS gstream.default.s1")
    spark.sql("CREATE TABLE gstream.default.s1 (id BIGINT, tag STRING)")
    spark.sql("INSERT INTO gstream.default.s1 VALUES (1, 'pre'), (2, 'pre')")
    val q = spark.readStream.table("gstream.default.s1")
      .writeStream.format("memory").queryName("s1_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("s1_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) FROM s1_sink").head().getLong(0) == 2,
        "the pre-existing snapshot arrives as the first batch")
      spark.sql("INSERT INTO gstream.default.s1 VALUES (3, 'post')")
      q.processAllAvailable()
      val rows = spark.sql("SELECT id, tag FROM s1_sink ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((1L, "pre"), (2L, "pre"), (3L, "post")))
    } finally q.stop()
  }

  test("a non-append change fails the stream loudly") {
    wh
    spark.sql("DROP TABLE IF EXISTS gstream.default.s2")
    spark.sql("CREATE TABLE gstream.default.s2 (id BIGINT)")
    spark.sql("INSERT INTO gstream.default.s2 VALUES (1), (2)")
    val q = spark.readStream.table("gstream.default.s2")
      .writeStream.format("memory").queryName("s2_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("s2_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      spark.sql("INSERT OVERWRITE gstream.default.s2 VALUES (9)")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("non-append change")))
    } finally q.stop()
  }

  test("ignoreDeletes=true tails through a rewrite, appends only") {
    wh
    spark.sql("DROP TABLE IF EXISTS gstream.default.s3")
    spark.sql("CREATE TABLE gstream.default.s3 (id BIGINT)")
    spark.sql("INSERT INTO gstream.default.s3 VALUES (1)")
    val q = spark.readStream
      .option("ignoreDeletes", "true")
      .table("gstream.default.s3")
      .writeStream.format("memory").queryName("s3_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("s3_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      spark.sql("INSERT OVERWRITE gstream.default.s3 VALUES (9)")
      q.processAllAvailable()
      // the overwrite's ADD is an append event; its removes are ignored
      val ids = spark.sql("SELECT id FROM s3_sink ORDER BY id")
        .collect().map(_.getLong(0))
      assert(ids.toSeq == Seq(1L, 9L))
    } finally q.stop()
  }

  test("maxRowsPerTrigger bounds each batch through the table surface") {
    wh
    spark.sql("DROP TABLE IF EXISTS gstream.default.s4")
    spark.sql("CREATE TABLE gstream.default.s4 (id BIGINT)")
    spark.sql("INSERT INTO gstream.default.s4 SELECT id FROM range(100)")
    val progress = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("maxRowsPerTrigger", "30")
      .table("gstream.default.s4")
      .writeStream.format("memory").queryName("s4_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("s4_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) FROM s4_sink").head().getLong(0) == 100)
      val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batches.length >= 3,
        s"row cap must split the backlog, saw ${batches.mkString(",")}")
      assert(batches.forall(_ <= 31),
        s"every batch under the cap (+1 admission slack), saw ${batches.mkString(",")}")
    } finally q.stop()
  }
}
