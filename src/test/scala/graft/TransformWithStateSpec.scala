package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** The transformWithState sessionizer (Spark 4's successor stateful API,
  * RocksDB-backed): same scenario the flatMapGroupsWithState spec pins,
  * so the two operators are checked against each other — state carry-over
  * across micro-batches, append discipline, and timer-driven flush.
  */
class TransformWithStateSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$sec%02d")

  test("transformWithState sessions: state across batches + timer flush") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sqlCtx = spark.sqlContext
      import spark.implicits._
      implicit val sq = sqlCtx
      val mem = MemoryStream[(Timestamp, Long)]
      val events = mem.toDF().toDF("ts", "user_id")
      val gapUs = 300000000L // 5 minutes
      val sessions = graft.streaming.SessionProcessor
        .sessionizeStream(events, gapUs = gapUs, lateness = "5 minutes")
      val q = sessions.writeStream.outputMode("append")
        .format("memory").queryName("tws_out")
        .option("checkpointLocation", Files.createTempDirectory("ck").toString)
        .start()
      try {
        // batch 1: user 1 opens a session
        mem.addData((ts(0), 1L), (ts(2), 1L))
        q.processAllAvailable()
        // batch 2: user 1 extends from ValueState; user 2 opens — nothing
        // closed, so Append emits nothing
        mem.addData((ts(4), 1L), (ts(10), 2L))
        q.processAllAvailable()
        assert(spark.sql("SELECT COUNT(*) FROM tws_out")
          .collect()(0).getLong(0) == 0L, "open sessions must not emit")
        // batch 3: user 1 jumps past the gap — closes the 3-event session
        mem.addData((ts(40), 1L))
        q.processAllAvailable()
        // batch 4: sentinel advances the watermark past every open
        // session's horizon — the registered timers flush them
        mem.addData((ts(59, 59), 9L))
        q.processAllAvailable()
        val got = spark.sql(
          "SELECT user_id, session_start_us, session_end_us, n_events " +
            "FROM tws_out ORDER BY user_id, session_start_us")
          .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
        // same pinned outcome as the flatMapGroupsWithState spec:
        // user 1: (00:00–00:04 n=3) closed by gap, (00:40 n=1) by timer;
        // user 2: (00:10 n=1) by timer; user 9's session is still open
        assert(got == Seq((1L, 3L), (1L, 1L), (2L, 1L)), s"got $got")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }
}
