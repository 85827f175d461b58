package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import StatefulSessions.{DefaultGapUs, OpenSession, SessionEvent, SessionOut, merge}

/** Spark-4-native sessionization on the `transformWithState` operator —
  * the successor to `flatMapGroupsWithState` (typed state variables,
  * explicit timers, TTL, RocksDB-backed state). Same session semantics
  * as [[StatefulSessions]] (shared [[StatefulSessions.merge]] core, 30-min
  * gap), so the two operators are mutually checkable and both reconcile
  * with the q33/q35 batch twins.
  *
  * State per key: ONE ValueState[OpenSession] plus ONE event-time timer —
  * O(1), RocksDB-spillable, so a 1000-executor run is bounded by active
  * keys, not history.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — transformWithState does not
  * run on the default HDFS-backed store.
  */
class SessionProcessor(gapUs: Long = DefaultGapUs)
  extends StatefulProcessor[Long, SessionEvent, SessionOut] {

  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenSession](
      "open", Encoders.product[OpenSession], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[SessionEvent],
      timerValues: TimerValues): Iterator[SessionOut] = {
    val prior = if (open.exists()) Some(open.get()) else None
    val (closed, cur) =
      merge(key, rows.map(_.ts_us).toArray.sorted, prior, gapUs)
    // one live timer per key: drop the stale horizon before arming the new
    getHandle.listTimers().foreach(t =>
      getHandle.deleteTimer(t.asInstanceOf[Long]))
    cur match {
      case Some(s) =>
        open.update(s)
        // flush once nothing can extend the session; a timer at/behind
        // the watermark would fire immediately with late data in flight
        getHandle.registerTimer(math.max(
          s.endUs / 1000L + gapUs / 1000L + 1L,
          timerValues.getCurrentWatermarkInMs() + 1L))
      case None => open.clear()
    }
    closed.iterator
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
    val out =
      if (open.exists()) {
        val s = open.get()
        Iterator.single(SessionOut(key, s.startUs, s.endUs, s.n))
      } else Iterator.empty
    open.clear()
    out
  }
}

object SessionProcessor {

  /** Streaming sessionization via transformWithState: closed sessions in
    * Append mode; open sessions flush on event-time timers.
    */
  def sessionizeStream(
      events: DataFrame,
      gapUs: Long = DefaultGapUs,
      lateness: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
