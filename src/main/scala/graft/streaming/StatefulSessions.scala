package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary keyed-state sessionization via `flatMapGroupsWithState`
  * (SURVEY.md §2.8 T8, the custom-logic path beyond `session_window`):
  * per-user sessions with an inactivity gap, assembled by an explicit
  * state machine so policies `session_window` can't express (per-session
  * event caps, custom timeout handling) have a home.
  *
  * The merge core is a pure function shared by two wrappers:
  *  - [[sessionizeStream]]: streaming — closed sessions emit in Append
  *    mode; the open session per user lives in [[GroupState]] and is
  *    flushed by an event-time timeout once the watermark passes its
  *    gap horizon. State per key is O(1) (one open session), so a
  *    1000-executor run holds |active users| tiny records, not history.
  *  - [[sessionizeBatch]]: batch — each key's full history arrives in one
  *    group call (Spark runs flatMapGroupsWithState on batch Datasets
  *    with empty initial state and no timeouts), so the open session is
  *    emitted too. This is the DuckDB-verifiable twin (q35).
  *
  * Reference basis: sessionization consumes the CDC event stream's event
  * time (reference DeltaRecord.java:214-221); the 30-minute gap mirrors
  * the q33 relational formulation.
  */
object StatefulSessions {

  /** 30 minutes in microseconds — the q33 gap. */
  val DefaultGapUs: Long = 1800000000L

  /** `ts` carries the watermarked event-time attribute through the typed
    * projection (EventTimeTimeout requires it in the operator's input);
    * the session math itself uses the exact-µs `ts_us`.
    */
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)
  case class OpenSession(startUs: Long, endUs: Long, n: Long)
  case class SessionOut(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long)

  /** Pure merge: fold sorted events into (closed sessions, open tail).
    * An event within `gapUs` of the open session's end extends it;
    * strictly beyond the gap closes it and opens a new one (same
    * boundary rule as q33's `> 1800000000` predicate).
    */
  def merge(
      userId: Long,
      sortedTs: Array[Long],
      prior: Option[OpenSession],
      gapUs: Long): (List[SessionOut], Option[OpenSession]) = {
    var closed = List.empty[SessionOut]
    var cur = prior
    sortedTs.foreach { t =>
      cur = cur match {
        case Some(s) if t - s.endUs <= gapUs =>
          Some(OpenSession(s.startUs, math.max(s.endUs, t), s.n + 1))
        case Some(s) =>
          closed ::= SessionOut(userId, s.startUs, s.endUs, s.n)
          Some(OpenSession(t, t, 1))
        case None => Some(OpenSession(t, t, 1))
      }
    }
    (closed.reverse, cur)
  }

  private def toTyped(events: DataFrame): Dataset[SessionEvent] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[SessionEvent]
  }

  /** Batch form: one group call per user holds all events, so every
    * session (including the last open one) is emitted.
    */
  def sessionizeBatch(
      events: DataFrame, gapUs: Long = DefaultGapUs): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    toTyped(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[SessionEvent],
         state: GroupState[OpenSession]) => {
          val (closed, open) =
            merge(userId, rows.map(_.ts_us).toArray.sorted, None, gapUs)
          (closed ++ open.map(s =>
            SessionOut(userId, s.startUs, s.endUs, s.n))).iterator
        })
  }

  /** Streaming form: the open session persists in keyed state between
    * micro-batches and is flushed by an event-time timeout `gapUs` past
    * its end (no event can extend it once the watermark is there, so the
    * flush is exactly-once and late-duplicate-safe).
    */
  def sessionizeStream(
      events: DataFrame,
      gapUs: Long = DefaultGapUs,
      lateness: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    toTyped(events.withWatermark("ts", lateness))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[SessionEvent],
         state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(userId, s.startUs, s.endUs, s.n)).iterator
            state.remove()
            out
          } else {
            val (closed, open) = merge(
              userId, rows.map(_.ts_us).toArray.sorted,
              state.getOption, gapUs)
            open match {
              case Some(s) =>
                state.update(s)
                // flush once nothing can extend the session; never set a
                // timeout at/behind the current watermark (Spark rejects it)
                state.setTimeoutTimestamp(math.max(
                  s.endUs / 1000L + gapUs / 1000L + 1L,
                  state.getCurrentWatermarkMs() + 1L))
              case None => state.remove()
            }
            closed.iterator
          }
        })
  }
}
