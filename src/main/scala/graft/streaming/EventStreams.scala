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

  /** Stream-stream interval join (SURVEY §2.3 J10): each purchase pairs
    * with the same user's clicks in the `maxGap` window before it.
    * Watermarks on BOTH inputs plus the two-sided time-range predicate let
    * Spark bound the join state (buffered rows age out once the watermark
    * passes `p_ts` / `c_ts + maxGap`) — without them a stream-stream join
    * holds all history. The same declaration runs on batch frames
    * (withWatermark is a no-op in batch), which is how the DuckDB-verified
    * q34 batch twin exercises identical join semantics.
    */
  def purchaseClickJoin(
      purchases: DataFrame,
      clicks: DataFrame,
      maxGap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    val c = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", lateness)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $maxGap") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"))
  }

  /** LEFT OUTER stream-stream interval join: purchases WITHOUT a
    * preceding click still emit (click_id null) — but only once the
    * watermark passes the join window, when Spark can prove no matching
    * click can still arrive. The state bound is the same as the inner
    * form: both sides evict past watermark + interval.
    */
  def purchaseClickJoinOuter(
      purchases: DataFrame,
      clicks: DataFrame,
      maxGap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    val c = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", lateness)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $maxGap") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"))
  }

  /** FULL OUTER stream-stream interval join: unmatched rows of BOTH
    * sides emit once the watermark proves their window closed —
    * purchases with no prior click (click_id null) AND clicks that led
    * to no purchase within the gap (purchase_id null). Same bounded
    * state as the inner form; the only semantic addition is the
    * watermark-gated null emission on each side.
    */
  def purchaseClickJoinFull(
      purchases: DataFrame,
      clicks: DataFrame,
      maxGap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    val c = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", lateness)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $maxGap") &&
        col("c_ts") <= col("p_ts"),
      "full_outer")
      .select(coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("purchase_id"), col("click_id"))
  }

  /** Stream-stream LEFT SEMI join: purchases that had at least one
    * qualifying click — each purchase emits ONCE regardless of click
    * count (the conversion-flag shape; an inner join would duplicate
    * per click). Same bounded state as the other modes: the time-bound
    * condition + watermark lets Spark evict both sides.
    */
  def purchaseClickJoinSemi(
      purchases: DataFrame,
      clicks: DataFrame,
      maxGap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    val c = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", lateness)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $maxGap") &&
        col("c_ts") <= col("p_ts"),
      "left_semi")
      .select(col("p_user").as("user_id"), col("purchase_id"))
  }

  /** Stream-static enrichment join: the per-batch dimension lookup every
    * event pipeline runs. The static side broadcasts (no streaming state
    * at all — unlike stream-stream joins this needs no watermark), and
    * Spark re-plans it per micro-batch, so a slowly-refreshed dim table
    * is picked up on restart.
    */
  def enrich(
      events: DataFrame,
      dim: DataFrame,
      eventKey: String,
      dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Streaming exact dedup (§2.9 N1 in streaming form): duplicates of a
    * key arriving within the watermark delay of each other emit once.
    * State is bounded — a key's entry ages out once the watermark passes
    * its event time, which is what makes this viable on an unbounded
    * stream (a plain dropDuplicates would hold every key forever).
    */
  def dedupEvents(
      events: DataFrame,
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** CHAINED windowed aggregations — two stateful operators in one
    * streaming query (Spark ≥3.4): 10-minute partials roll up into hourly
    * totals via `window_time` (the first window's event-time column), so
    * the second aggregation keeps its own watermark-tracked state. The
    * scale point: the hourly state holds ONE row per (hour, type) fed by
    * pre-aggregated partials, not by raw events — the streaming analogue
    * of a partial/final aggregate split.
    */
  def hourlyRollup(
      events: DataFrame,
      lateness: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("window")), "1 hour"),
        col("event_type"))
      .agg(sum(col("n")).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"))

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
