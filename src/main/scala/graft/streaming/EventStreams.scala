package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured-Streaming transforms over the events schema (SURVEY.md
  * §2.8 T5/T8): watermarked tumbling/sliding/session windows. Each takes
  * a (possibly streaming) DataFrame with (ts: timestamp, event_type,
  * value, user_id) and returns the windowed aggregate — the same
  * declarations work for batch DataFrames, which is how the DuckDB-
  * verified q30/q33 batch twins relate to these.
  */
object EventStreams {

  /** Tumbling window with watermark — late rows beyond `lateness` drop. */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "10 minutes",
      lateness: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(15,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding window (length, slide) per event type. */
  def slidingCounts(
      events: DataFrame,
      windowLen: String = "10 minutes",
      slide: String = "5 minutes",
      lateness: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Session window with an inactivity gap, per user — the streaming twin
    * of the relational q33_sessionize.
    */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      lateness: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
