package graft

import graft.queries.Cdc
import graft.streaming.{CdcStreamRunner, EventStreams}
import graft.txn.CdcReader
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$sec%02d")

  test("tumbling window with watermark drops too-late rows") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val events = mem.toDF().toDF("ts", "event_type", "value", "user_id")
    val agg = EventStreams.tumblingCounts(events,
      windowLen = "10 minutes", lateness = "5 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("tumbling_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // batch 1: two events in [00:00,00:10), one in [00:10,00:20)
      mem.addData((ts(1), "click", 1.0, 1L), (ts(2), "click", 2.0, 1L),
        (ts(11), "click", 3.0, 1L))
      q.processAllAvailable()
      // batch 2: advance watermark far past the first window...
      mem.addData((ts(40), "click", 4.0, 1L))
      q.processAllAvailable()
      // batch 3: a *too-late* event for [00:00,00:10) — must be dropped
      mem.addData((ts(3), "click", 99.0, 1L))
      q.processAllAvailable()
      mem.addData((ts(59), "click", 5.0, 1L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT win_start, n, total_value FROM tumbling_out ORDER BY win_start")
        .collect()
      val first = rows.find(_.getTimestamp(0) == ts(0)).get
      assert(first.getLong(1) == 2L, "late row must not be re-counted")
      assert(first.getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("session window groups by inactivity gap in streaming mode") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val events = mem.toDF().toDF("ts", "event_type", "value", "user_id")
    val agg = EventStreams.sessionCounts(events, gap = "5 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("session_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // user 1: burst at 00:00-00:02 (one session), burst at 00:30 (another)
      mem.addData((ts(0), "a", 0.0, 1L), (ts(2), "a", 0.0, 1L), (ts(30), "a", 0.0, 1L))
      q.processAllAvailable()
      mem.addData((ts(59), "a", 0.0, 1L)) // advance watermark to close sessions
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events FROM session_out ORDER BY session_start").collect()
      assert(rows.map(_.getLong(1)).take(2).toSeq == Seq(2L, 1L))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with preceding clicks") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val pMem = MemoryStream[(Timestamp, Long, Long)]
    val cMem = MemoryStream[(Timestamp, Long, Long)]
    val purchases = pMem.toDF().toDF("ts", "event_id", "user_id")
    val clicks = cMem.toDF().toDF("ts", "event_id", "user_id")
    val joined = EventStreams.purchaseClickJoin(purchases, clicks,
      maxGap = "30 minutes", lateness = "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // clicks at 00:10 and 00:20 (user 1), 00:20 (user 2), 00:05 (user 1,
      // outside the 30-minute window of the later purchase)
      cMem.addData((ts(10), 101L, 1L), (ts(20), 102L, 1L),
        (ts(20), 103L, 2L), (ts(5), 104L, 1L))
      // purchase at 00:40 (user 1): window [00:10, 00:40]
      pMem.addData((ts(40), 201L, 1L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, purchase_id, click_id FROM ss_join_out " +
          "ORDER BY purchase_id, click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq((1L, 201L, 101L), (1L, 201L, 102L)))
      // advance watermark far past the window on BOTH sides, then feed a
      // too-late click that would otherwise match — state must be gone
      pMem.addData((ts(55, 59), 202L, 9L))
      cMem.addData((ts(55, 59), 105L, 9L))
      q.processAllAvailable()
      cMem.addData((ts(15), 106L, 1L)) // late: watermark is far past 00:15
      q.processAllAvailable()
      val n = spark.sql("SELECT COUNT(*) FROM ss_join_out").collect()(0).getLong(0)
      assert(n == 3, s"late click must not produce a pair (got $n rows)")
    } finally q.stop()
  }

  test("LEFT OUTER stream-stream join emits unmatched purchases as null") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val pMem = MemoryStream[(Timestamp, Long, Long)]
    val cMem = MemoryStream[(Timestamp, Long, Long)]
    val purchases = pMem.toDF().toDF("ts", "event_id", "user_id")
    val clicks = cMem.toDF().toDF("ts", "event_id", "user_id")
    val joined = EventStreams.purchaseClickJoinOuter(purchases, clicks,
      maxGap = "30 minutes", lateness = "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_outer_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // user 1: click then purchase (matches); user 3: purchase with NO
      // click anywhere in its window
      cMem.addData((ts(10), 101L, 1L))
      pMem.addData((ts(20), 201L, 1L), (ts(20), 202L, 3L))
      q.processAllAvailable()
      // the matched pair may emit immediately; the unmatched purchase
      // must NOT emit yet — a matching click could still arrive
      val early = spark.sql(
        "SELECT COUNT(*) FROM ss_outer_out WHERE click_id IS NULL")
        .collect()(0).getLong(0)
      assert(early == 0, "outer result emitted before the watermark closed")
      // advance BOTH watermarks far past user 3's window: Spark can now
      // prove no click will match, so the null-padded row emits
      pMem.addData((ts(59, 59), 203L, 9L))
      cMem.addData((ts(59, 59), 102L, 9L))
      q.processAllAvailable()
      // one more cycle so the watermark-advanced state eviction flushes
      pMem.addData((ts(59, 59), 204L, 9L))
      cMem.addData((ts(59, 59), 103L, 9L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT purchase_id, click_id FROM ss_outer_out ORDER BY purchase_id")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      assert(got.contains((201L, 101L)), s"matched pair missing: $got")
      assert(got.contains((202L, -1L)),
        s"unmatched purchase should null-pad after watermark: $got")
    } finally q.stop()
  }

  test("chained windowed aggs: 10-min partials roll up into hourly totals") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val mem = MemoryStream[(Timestamp, String)]
    val events = mem.toDF().toDF("ts", "event_type")
    val rolled = EventStreams.hourlyRollup(events, lateness = "5 minutes")
    val q = rolled.writeStream.outputMode("append")
      .format("memory").queryName("rollup_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // 3 clicks across distinct 10-min windows of hour 0, 1 view
      mem.addData((ts(5), "click"), (ts(25), "click"), (ts(45), "click"),
        (ts(45), "view"))
      // advance the watermark past hour 0 so BOTH stateful operators
      // (10-min partials, then the hourly rollup) close and emit.
      // (Timestamp.valueOf normalizes "00:70:30" to 01:10:30 — minutes
      // past 59 deliberately roll into the next hour here.)
      mem.addData((ts(70, 30), "click"))
      q.processAllAvailable()
      mem.addData((ts(80, 30), "click"))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT event_type, n FROM rollup_out " +
          "WHERE hour_start = timestamp'2024-01-01 00:00:00' ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("click", 3L), ("view", 1L)),
        s"hourly rollup must sum the 10-min partials: $got")
    } finally q.stop()
  }

  test("FULL OUTER stream-stream join null-pads BOTH sides post-watermark") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val pMem = MemoryStream[(Timestamp, Long, Long)]
    val cMem = MemoryStream[(Timestamp, Long, Long)]
    val purchases = pMem.toDF().toDF("ts", "event_id", "user_id")
    val clicks = cMem.toDF().toDF("ts", "event_id", "user_id")
    val joined = EventStreams.purchaseClickJoinFull(purchases, clicks,
      maxGap = "30 minutes", lateness = "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_full_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // user 1: click→purchase (matches); user 3: purchase with no click;
      // user 4: click that never leads to a purchase
      cMem.addData((ts(10), 101L, 1L), (ts(10), 104L, 4L))
      pMem.addData((ts(20), 201L, 1L), (ts(20), 202L, 3L))
      q.processAllAvailable()
      val early = spark.sql(
        "SELECT COUNT(*) FROM ss_full_out " +
          "WHERE click_id IS NULL OR purchase_id IS NULL")
        .collect()(0).getLong(0)
      assert(early == 0, "outer rows emitted before the watermark closed")
      // advance both watermarks past every window, twice (eviction flush)
      for (_ <- 1 to 2) {
        pMem.addData((ts(59, 59), 203L, 9L))
        cMem.addData((ts(59, 59), 102L, 9L))
        q.processAllAvailable()
      }
      val got = spark.sql(
        "SELECT user_id, purchase_id, click_id FROM ss_full_out")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(got.contains((1L, 201L, 101L)), s"matched pair missing: $got")
      assert(got.contains((3L, 202L, -1L)),
        s"purchase with no click should null-pad: $got")
      assert(got.contains((4L, -1L, 104L)),
        s"click with no purchase should null-pad: $got")
    } finally q.stop()
  }

  test("stream-static enrichment joins each batch against the dim table") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("uid", "segment")
    val q = EventStreams.enrich(events, dim, "user_id", "uid")
      .select(col("user_id"), col("segment"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      mem.addData((ts(1), 1L), (ts(2), 2L), (ts(3), 9L))
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, segment FROM enrich_out")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // left join: unknown user survives with null segment
      assert(got == Map(1L -> "gold", 2L -> "silver", 9L -> null))
    } finally q.stop()
  }

  test("streaming dedup emits within-watermark duplicates exactly once") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val mem = MemoryStream[(Timestamp, Long, Long)]
    val events = mem.toDF().toDF("ts", "event_id", "user_id")
    val deduped = EventStreams.dedupEvents(events, lateness = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // same event twice in one batch + once more in the next (all within
      // the watermark delay) — must emit exactly once
      mem.addData((ts(1), 100L, 1L), (ts(1), 100L, 1L), (ts(2), 200L, 1L))
      q.processAllAvailable()
      mem.addData((ts(3), 100L, 1L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT event_id, COUNT(*) AS n FROM dedup_out GROUP BY event_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(100L -> 1L, 200L -> 1L), s"got $got")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions carry keyed state across batches") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val sq = sqlCtx
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val gapUs = 300000000L // 5 minutes
    val sessions = graft.streaming.StatefulSessions
      .sessionizeStream(events, gapUs = gapUs, lateness = "5 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("fmgws_out")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // batch 1: user 1 opens a session
      mem.addData((ts(0), 1L), (ts(2), 1L))
      q.processAllAvailable()
      // batch 2: user 1 EXTENDS the open session from state (within gap);
      // user 2 opens one — nothing closed yet, no output expected
      mem.addData((ts(4), 1L), (ts(10), 2L))
      q.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) FROM fmgws_out")
        .collect()(0).getLong(0) == 0L, "open sessions must not emit")
      // batch 3: user 1 jumps past the gap — closes the 3-event session
      mem.addData((ts(40), 1L))
      q.processAllAvailable()
      // batch 4: sentinel advances the watermark far past every open
      // session's gap horizon — event-time timeouts flush them
      mem.addData((ts(59, 59), 9L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT user_id, session_start_us, session_end_us, n_events " +
          "FROM fmgws_out ORDER BY user_id, session_start_us")
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
      // user 1: (00:00-00:04 n=3) closed by gap, (00:40 n=1) by timeout;
      // user 2: (00:10 n=1) by timeout; user 9's session is still open
      assert(got == Seq((1L, 3L), (1L, 1L), (2L, 1L)), s"got $got")
    } finally q.stop()
  }

  test("stateful sessionization batch twin matches the relational q33 shape") {
    import spark.implicits._
    val events = Tables.load(spark, sf, "events")
    val got = graft.streaming.StatefulSessions.sessionizeBatch(events)
      .toDF()
    // relational decomposition (the q33/q35 oracle shape), in Spark
    import org.apache.spark.sql.expressions.Window
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
      .withColumn("is_new",
        when(col("prev_ts").isNull, 1)
          .when(unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("cdc stream runner: split runs equal one uninterrupted run") {
    val table = Cdc.buildFixture(spark, sf)
    val ck1 = Files.createTempDirectory("cdc_ck1").toString
    var counts1 = Vector.empty[Long]
    // interrupted: one batch, then "restart" (fresh call, same checkpoint)
    CdcStreamRunner.run(spark, table, ck1, maxBatches = 1)(df => counts1 :+= df.count())
    CdcStreamRunner.run(spark, table, ck1)(df => counts1 :+= df.count())
    val ck2 = Files.createTempDirectory("cdc_ck2").toString
    var counts2 = Vector.empty[Long]
    CdcStreamRunner.run(spark, table, ck2)(df => counts2 :+= df.count())
    assert(counts1.sum == counts2.sum)
    assert(counts1.sum == CdcReader.cdc(spark, table).count())
    // drained: nothing more to process in either checkpoint lineage
    var extra = 0
    CdcStreamRunner.run(spark, table, ck1)(_ => extra += 1)
    assert(extra == 0)
  }
}
