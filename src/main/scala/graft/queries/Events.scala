package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

/** Event-table queries: time bucketing (the batch shape of SURVEY §2.8 T8
  * tumbling windows), JSON property extraction (§2.7 scalar functions), and
  * event-time ordering. Streaming variants live in graft.streaming; these
  * batch forms are the DuckDB-verifiable projections of the same semantics.
  */
object Events {

  private def money(c: Column): Column = c.cast(DecimalType(15, 2))

  def defs: Seq[QueryDef] = Seq(
    // Tumbling 1-hour window as a batch groupBy: date + hour keys are
    // engine-portable (no timestamp-precision mismatch in the output).
    QueryDef.sqlBacked(
      "q30_hourly_events",
      """SELECT CAST(ts AS DATE) AS d, CAST(HOUR(ts) AS INT) AS h, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY d, h, event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"),
          hour(col("ts")).cast("int").as("h"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("total_value"))
        .orderBy(col("d"), col("h"), col("event_type"))
    },

    // JSON property extraction from the props column.
    QueryDef.sqlBacked(
      "q31_json_extract",
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Behavioral diversity via EXACT Gini impurity (the rational
    // entropy substitute — float ln would hash-drift): per user,
    // impurity_ppm = (total² − Σcnt²)·10⁶ DIV total² over the user's
    // event-type distribution; top-10 most diverse users with
    // deterministic tiebreaks. Two hash aggregates (user×type, then
    // user) + TakeOrdered — the per-user frame never exceeds |types|.
    QueryDef.sqlBacked(
      "q325_behavior_impurity",
      """WITH ct AS (SELECT user_id, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, SUM(cnt) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    SUM(cnt * cnt) AS sq
        |  FROM ct GROUP BY user_id)
        |SELECT user_id, CAST(total AS BIGINT) AS n_events, n_types,
        |  CAST((total * total - sq) * 1000000 // (total * total)
        |    AS BIGINT) AS impurity_ppm
        |FROM u
        |ORDER BY impurity_ppm DESC, user_id LIMIT 10""".stripMargin) {
      (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(sum(col("cnt")).as("total"),
          count(lit(1)).as("n_types"),
          sum(col("cnt") * col("cnt")).as("sq"))
        .select(col("user_id"), col("total").as("n_events"),
          col("n_types"),
          expr("""CAST((total * total - sq) * 1000000
                 |  DIV (total * total) AS BIGINT)""".stripMargin)
            .as("impurity_ppm"))
        .orderBy(col("impurity_ppm").desc, col("user_id")).limit(10)
    },

    // Sliding-window (batch form): per-user ordered event sequence with
    // time-to-previous-event — the batch projection of sessionization input.
    QueryDef.sqlBacked(
      "q32_event_gaps",
      """SELECT user_id, event_id,
        |  EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id)) AS gap_us
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            .as("gap_us"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Batch twin of the watermarked stream-stream interval join (J10):
    // same EventStreams.purchaseClickJoin declaration, run on batch frames
    // (withWatermark is a no-op in batch). The streaming side is spec-
    // verified with two MemoryStreams in StreamingSpec.
    QueryDef.sqlBacked(
      "q34_interval_join",
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      graft.streaming.EventStreams.purchaseClickJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"))
        .orderBy(col("user_id"), col("purchase_id"), col("click_id"))
    },

    // Sessionization with a 30-minute inactivity gap, expressed relationally
    // (window lag + cumulative sum) so DuckDB can verify it; the streaming
    // twin uses session_window in graft.streaming.
    QueryDef.sqlBacked(
      "q33_sessionize",
      """SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  EPOCH_US(MIN(ts)) AS session_start_us, EPOCH_US(MAX(ts)) AS session_end_us
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                IS NULL THEN 1
        |           WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id
        |                ORDER BY ts, event_id)) > 1800000000 THEN 1
        |           ELSE 0 END AS is_new
        |    FROM events))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
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
        .orderBy(col("user_id"), col("session_id"))
    },

    // Time-weighted average (TWAP): each observation holds until the
    // next one, so its weight is that interval — the finance/telemetry
    // aggregate where a plain AVG is wrong whenever sampling is uneven.
    // All arithmetic is integer-exact (cents × whole seconds; the final
    // ratio is a floor-div kept under 2^53), so four window+agg steps
    // can't drift between engines. One shuffle on (event_type, day);
    // the lead() frame carries one scalar.
    QueryDef.sqlBacked(
      "q144_twap",
      """WITH obs AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents,
        |    CAST((EPOCH_US(LEAD(ts) OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |            ORDER BY ts, event_id) ) - EPOCH_US(ts)) // 1000000
        |      AS BIGINT) AS w
        |  FROM events),
        |agg AS (
        |  SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(w) AS BIGINT) AS total_s,
        |    CAST(SUM(cents * w) AS BIGINT) AS cw
        |  FROM obs WHERE w IS NOT NULL GROUP BY event_type, d)
        |SELECT event_type, d, n_obs, total_s,
        |  CASE WHEN total_s = 0 THEN NULL
        |    ELSE CAST((1000 * cw - (1000 * cw) % total_s) / total_s AS BIGINT)
        |    END AS twap_millicents
        |FROM agg ORDER BY event_type, d""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"), col("ts").cast("date"))
        .orderBy(col("ts"), col("event_id"))
      val obs = Tables.load(s, dir, "events")
        .select(col("event_type"), col("ts").cast("date").as("d"),
          floor(col("value") * 100).cast("long").as("cents"),
          ((unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
            / 1000000).cast("long").as("w"))
        .filter(col("w").isNotNull)
      obs.groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("n_obs"),
          sum(col("w")).cast("long").as("total_s"),
          sum(col("cents") * col("w")).cast("long").as("cw"))
        .select(col("event_type"), col("d"), col("n_obs"), col("total_s"),
          when(col("total_s") === 0, lit(null).cast("long"))
            .otherwise(((lit(1000) * col("cw") -
              (lit(1000) * col("cw")) % col("total_s")) / col("total_s"))
              .cast("long")).as("twap_millicents"))
        .orderBy(col("event_type"), col("d"))
    },

    // NATIVE session_window in batch: same sessions as q33's islands
    // construction, but built by Spark's own merging-session operator
    // (one MergingSessionsExec pass after a single shuffle on user_id —
    // no window-function sort chain). The oracle spells out the merge
    // rule the operator implements: an event EXTENDS a session iff it
    // starts strictly inside predecessor_ts + gap, so a gap of exactly
    // 30min breaks the session (q33's `>` becomes `>=` here — that is
    // the real operator's semantics, pinned cross-engine).
    QueryDef.sqlBacked(
      "q136_session_window_native",
      """SELECT user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  EPOCH_US(MIN(ts)) AS start_us,
        |  EPOCH_US(MAX(ts)) + 1800000000 AS end_us
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                IS NULL THEN 1
        |           WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id
        |                ORDER BY ts, event_id)) >= 1800000000 THEN 1
        |           ELSE 0 END AS is_new
        |    FROM events))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, start_us""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"))
        .orderBy(col("user_id"), col("start_us"))
    },

    // Stateful sessionization via flatMapGroupsWithState (SURVEY §2.8 T8
    // arbitrary keyed state) — batch twin of StatefulSessions.sessionize-
    // Stream, verified against the same relational session decomposition
    // as q33 (sans the ordinal session_id; sessions key on their start).
    QueryDef.sqlBacked(
      "q35_stateful_sessions",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  EPOCH_US(MIN(ts)) AS session_start_us, EPOCH_US(MAX(ts)) AS session_end_us
        |FROM (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |      CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                IS NULL THEN 1
        |           WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id
        |                ORDER BY ts, event_id)) > 1800000000 THEN 1
        |           ELSE 0 END AS is_new
        |    FROM events))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin) { (s, dir) =>
      graft.streaming.StatefulSessions
        .sessionizeBatch(Tables.load(s, dir, "events"))
        .toDF()
        .select(col("user_id"), col("n_events"),
          col("session_start_us"), col("session_end_us"))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // Ordered funnel (view → click → purchase): each stage requires an
    // event STRICTLY AFTER the user's previous-stage entry time. Scale
    // shape: stage frames are per-user aggregates (users ≪ events), so
    // each stage join broadcasts the small side; events shuffle only
    // into the per-stage groupBy.
    QueryDef.sqlBacked(
      "q90_funnel",
      """WITH v AS (SELECT user_id, MIN(ts) AS vts FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS cts FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.vts GROUP BY e.user_id),
        |p AS (SELECT DISTINCT e.user_id FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.cts)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        |  UNION ALL
        |  SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p)
        |ORDER BY stage""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("vts"))
      val c = ev.filter(col("event_type") === "click")
        .join(broadcast(v), "user_id")
        .filter(col("ts") > col("vts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("cts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(broadcast(c), "user_id")
        .filter(col("ts") > col("cts"))
        .select(col("user_id")).distinct()
      v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
        .unionAll(c.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("stage"), col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("stage"), col("n_users")))
        .orderBy(col("stage"))
    },

    // Cohort retention: cohort = date of a user's first event; one row
    // per (cohort, day offset 0..7) counting users active that day.
    // Scale shape: the per-user first-date frame is small (users ≪
    // events) and broadcasts into the distinct-activity join; only two
    // event-scale shuffles total (first-date agg, distinct-activity agg).
    QueryDef.sqlBacked(
      "q91_retention",
      """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT f.cohort, CAST(a.d - f.cohort AS INT) AS day_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_active
        |FROM a JOIN f ON a.user_id = f.user_id
        |WHERE a.d - f.cohort BETWEEN 0 AND 7
        |GROUP BY f.cohort, day_offset
        |ORDER BY cohort, day_offset""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val f = ev.groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("cohort"))
      val a = ev.select(col("user_id"), col("ts").cast("date").as("d")).distinct()
      a.join(broadcast(f), "user_id")
        .withColumn("day_offset", datediff(col("d"), col("cohort")))
        .filter(col("day_offset").between(0, 7))
        .groupBy(col("cohort"), col("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy(col("cohort"), col("day_offset"))
    },

    // Forward-fill (gap-fill): per-user LOCF — carry the last non-null
    // observation forward in event order. 'view' events are treated as
    // the null observations to fill. IGNORE NULLS last_value over a
    // running frame is the portable spelling (Spark: last(_, ignoreNulls));
    // (ts, event_id) is a unique order so the fill is deterministic.
    // Scale shape: one shuffle on user_id, running frame never
    // materializes more than the carried scalar per row.
    QueryDef.sqlBacked(
      "q100_forward_fill",
      """SELECT event_id, user_id,
        |  CAST(LAST_VALUE(CASE WHEN event_type <> 'view' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          last(when(col("event_type") =!= "view", col("value")),
            ignoreNulls = true).over(w).cast("double").as("filled"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Cumulative reach: users' first-touch days → per-day new users →
    // running total of distinct users ever seen (the growth-curve
    // shape). The running window runs over the per-DAY frame (tiny after
    // aggregation), not over events, so the single-partition window is
    // deliberate and safe at any scale.
    QueryDef.sqlBacked(
      "q105_cumulative_reach",
      """WITH firsts AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d
        |                FROM events GROUP BY user_id)
        |SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users,
        |  CAST(SUM(COUNT(*)) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS total_reach
        |FROM firsts GROUP BY d ORDER BY d""".stripMargin) { (s, dir) =>
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("d"))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("new_users"))
        .select(col("d"), col("new_users"),
          sum(col("new_users")).over(w).as("total_reach"))
        .orderBy(col("d"))
    },

    // Gaps-and-islands: longest consecutive-day activity streak per user.
    // The island key is d − row_number() (consecutive days share it) — the
    // classic SQL spelling, identical in both engines since DATE − INT is
    // date arithmetic in each. Scale shape: everything partitions by
    // user_id — one shuffle, per-user frames, no self-join against the
    // calendar.
    QueryDef.sqlBacked(
      "q108_activity_streaks",
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |              FROM events),
        |isl AS (SELECT user_id, d,
        |  d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS grp
        |  FROM days)
        |SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak
        |FROM (SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2)
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
        .withColumn("grp", date_sub(col("d"), row_number().over(w)))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("max_streak"))
        .orderBy(col("user_id"))
    },

    // Last-touch attribution: each purchase credits the user's most recent
    // PRIOR click within 7 days. One window pass per user (the as-of is a
    // running last-click carried by an ignore-nulls window over the merged
    // stream) — no purchase×click self-join, so the shape stays a single
    // user-partitioned shuffle at any scale. Millisecond epoch diffs keep
    // the 7-day cutoff integer-exact in both engines.
    QueryDef.sqlBacked(
      "q123_last_touch_attribution",
      """WITH ev AS (SELECT user_id, ts, event_id, event_type, value
        |            FROM events WHERE event_type IN ('click', 'purchase')),
        |ann AS (SELECT *,
        |  LAST_VALUE(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END
        |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ms,
        |  LAST_VALUE(CASE WHEN event_type = 'click' THEN CAST(ts AS DATE) END
        |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_day
        |  FROM ev)
        |SELECT click_day, CAST(COUNT(*) AS BIGINT) AS n_attributed,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
        |    AS attributed_cents
        |FROM ann
        |WHERE event_type = 'purchase' AND click_ms IS NOT NULL
        |  AND epoch_ms(ts) - click_ms <= 604800000
        |GROUP BY click_day ORDER BY click_day""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.load(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("click_ms",
          last(when(col("event_type") === "click", unix_millis(col("ts"))),
            ignoreNulls = true).over(w))
        .withColumn("click_day",
          last(when(col("event_type") === "click", col("ts").cast("date")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("click_ms").isNotNull
          && unix_millis(col("ts")) - col("click_ms") <= 604800000L)
        .groupBy(col("click_day"))
        .agg(count(lit(1)).as("n_attributed"),
          // cents, not raw doubles: integer summation is order-independent,
          // so the cross-engine hash can't drift with aggregation order
          sum(floor(col("value") * 100).cast("long")).as("attributed_cents"))
        .orderBy(col("click_day"))
    },

    // Time-to-convert distribution: click→purchase latency bucketed into
    // fixed bands. Same single-window as-of machinery as q123 (no
    // self-join); the bands are integer millisecond comparisons, so the
    // histogram is engine-exact. The marketing twin of q104.
    QueryDef.sqlBacked(
      "q130_conversion_latency",
      """WITH ev AS (SELECT user_id, ts, event_id, event_type
        |            FROM events WHERE event_type IN ('click', 'purchase')),
        |ann AS (SELECT *,
        |  LAST_VALUE(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END
        |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ms
        |  FROM ev),
        |lat AS (SELECT epoch_ms(ts) - click_ms AS ms FROM ann
        |        WHERE event_type = 'purchase' AND click_ms IS NOT NULL)
        |SELECT CASE WHEN ms <= 1800000 THEN 'a_0_30m'
        |            WHEN ms <= 7200000 THEN 'b_30m_2h'
        |            WHEN ms <= 86400000 THEN 'c_2h_24h'
        |            ELSE 'd_over_24h' END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lat GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.load(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("click_ms",
          last(when(col("event_type") === "click", unix_millis(col("ts"))),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("click_ms").isNotNull)
        .withColumn("ms", unix_millis(col("ts")) - col("click_ms"))
        .select(
          when(col("ms") <= 1800000L, "a_0_30m")
            .when(col("ms") <= 7200000L, "b_30m_2h")
            .when(col("ms") <= 86400000L, "c_2h_24h")
            .otherwise("d_over_24h").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },

    // Trailing-24h distinct users per hour — the exact sliding-distinct
    // shape: each event REPLICATES to the 24 hour-buckets it is visible
    // from (explode of a fixed-length sequence, map-side), then ONE
    // hash-distinct aggregation; no range self-join, no per-bucket rescan.
    // 24× replication is the deliberate price of exactness; q28's HLL is
    // the sketch alternative when ±2% suffices.
    QueryDef.sqlBacked(
      "q124_sliding_distinct",
      """WITH ev AS (SELECT date_trunc('hour', ts) AS eh, user_id FROM events),
        |obs AS (SELECT DISTINCT eh AS h FROM ev)
        |SELECT o.h, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users_24h
        |FROM obs o JOIN ev e
        |  ON e.eh BETWEEN o.h - INTERVAL 23 HOUR AND o.h
        |GROUP BY o.h ORDER BY o.h""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(date_trunc("hour", col("ts")).as("eh"), col("user_id"))
      val contrib = ev.select(col("user_id"),
        explode(sequence(col("eh"),
          col("eh") + expr("INTERVAL 23 HOURS"),
          expr("INTERVAL 1 HOUR"))).as("h"))
      val observed = ev.select(col("eh").as("h")).distinct()
      contrib.join(observed, Seq("h"), "left_semi")
        .groupBy(col("h"))
        .agg(countDistinct(col("user_id")).as("users_24h"))
        .orderBy(col("h"))
    },

    // OHLC downsampling (time-series bar charts): per (event_type, day),
    // open/high/low/close of value. Open/close are rank-1 rows of the two
    // orderings — (ts, event_id) tie-broken, so both engines pick the same
    // row — folded into the same single aggregation as high/low.
    QueryDef.sqlBacked(
      "q125_ohlc_downsample",
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS d, ts, event_id,
        |             value FROM events),
        |r AS (SELECT *,
        |  ROW_NUMBER() OVER (PARTITION BY event_type, d
        |    ORDER BY ts, event_id) AS ra,
        |  ROW_NUMBER() OVER (PARTITION BY event_type, d
        |    ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT event_type, d,
        |  MAX(CASE WHEN ra = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MAX(CASE WHEN rd = 1 THEN value END) AS close,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM r GROUP BY event_type, d
        |ORDER BY event_type, d""".stripMargin) { (s, dir) =>
      val wa = Window.partitionBy(col("event_type"), col("d"))
        .orderBy(col("ts"), col("event_id"))
      val wd = Window.partitionBy(col("event_type"), col("d"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.load(s, dir, "events")
        .select(col("event_type"), col("ts").cast("date").as("d"),
          col("ts"), col("event_id"), col("value"))
        .withColumn("ra", row_number().over(wa))
        .withColumn("rd", row_number().over(wd))
        .groupBy(col("event_type"), col("d"))
        .agg(max(when(col("ra") === 1, col("value"))).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max(when(col("rd") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("d"))
    },

    // Linear-interpolation gap fill over a sparsified daily series: the
    // per-type date spine left-joins the sparse daily sums, missing days
    // interpolate between the bracketing known points in EXACT integer
    // arithmetic — (pv·(nd−d) + nv·(d−pd)) div (nd−pd) keeps the
    // numerator non-negative so floor and truncation agree across
    // engines. Scale shape: the fact side reduces in one hash aggregate;
    // the spine is days×types (tiny); the fill is two IGNORE-NULLS
    // window passes on the dense grid, no self-join.
    QueryDef.sqlBacked(
      "q195_linear_interpolation",
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS v
        |  FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
        |bounds AS (SELECT event_type, MIN(d) AS lo, MAX(d) AS hi
        |  FROM daily GROUP BY 1),
        |grid AS (SELECT b.event_type,
        |    CAST(UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM bounds b),
        |g AS (SELECT grid.event_type, grid.d, daily.v
        |  FROM grid LEFT JOIN daily
        |    ON grid.event_type = daily.event_type AND grid.d = daily.d),
        |f AS (SELECT event_type, d, v,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY d ROWS UNBOUNDED PRECEDING) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER (PARTITION BY event_type
        |        ORDER BY d ROWS UNBOUNDED PRECEDING) AS pd,
        |    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER (PARTITION BY event_type
        |        ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM g)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_filled,
        |  CAST(SUM((pv * (nd - d) + nv * (d - pd)) // (nd - pd)) AS BIGINT)
        |    AS filled_cents
        |FROM f WHERE v IS NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "events")
        .filter(col("event_id") % 97 === 0)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
      val grid = daily.groupBy(col("event_type"))
        .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"),
            expr("interval 1 day"))).as("d"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
      val wNext = w.rowsBetween(0, Window.unboundedFollowing)
      grid.join(daily, Seq("event_type", "d"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pd", last(when(col("v").isNotNull, col("d")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nd", first(when(col("v").isNotNull, col("d")),
          ignoreNulls = true).over(wNext))
        .filter(col("v").isNull)
        // integer div (not /): the numerator is non-negative by
        // construction, so Spark's div and DuckDB's // agree exactly
        .withColumn("interp", expr(
          "(pv * datediff(nd, d) + nv * datediff(d, pd))" +
            " div datediff(nd, pd)"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_filled"),
          sum(col("interp")).cast("long").as("filled_cents"))
        .orderBy(col("event_type"))
    },

    // CUSUM changepoint scan per event-type series: S_d = Σ_{k≤d}
    // (n·x_k − T) — the mean-centered cumulative sum scaled by n so the
    // arithmetic stays integer-exact — and the changepoint is the day
    // maximizing |S_d| (earliest day on ties). One aggregate for the
    // daily series, two window passes on the 150-row frame, a rank —
    // nothing touches the fact table twice.
    QueryDef.sqlBacked(
      "q196_cusum_changepoint",
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, d, x,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n,
        |    SUM(x) OVER (PARTITION BY event_type) AS t FROM daily),
        |cu AS (SELECT event_type, d,
        |    SUM(n * x - t) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS UNBOUNDED PRECEDING) AS sd FROM st),
        |r AS (SELECT event_type, d, sd,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY ABS(sd) DESC, d) AS rn FROM cu)
        |SELECT event_type, d AS changepoint_day,
        |  CAST(ABS(sd) AS BIGINT) AS max_abs_cusum
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
      val wAll = Window.partitionBy(col("event_type"))
      val wCum = wAll.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, 0)
      daily
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("t", sum(col("x")).over(wAll))
        .withColumn("sd", sum(col("n") * col("x") - col("t")).over(wCum))
        .withColumn("rn", row_number().over(
          wAll.orderBy(abs(col("sd")).desc, col("d"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("d").as("changepoint_day"),
          abs(col("sd")).as("max_abs_cusum"))
        .orderBy(col("event_type"))
    },

    // Day-of-week seasonal index per event-type series, in exact ppm:
    // index(dow) = mean(daily cents | dow) / mean(daily cents), spelled
    // as one integer expression. Day-of-week comes from epoch-day
    // arithmetic anchored at a known Monday (1970-01-05) — engine-
    // agnostic, unlike dayofweek()'s differing conventions. Scale: one
    // aggregate to the daily frame, one 7×types output.
    QueryDef.sqlBacked(
      "q197_seasonal_index",
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |dw AS (SELECT event_type, (d - DATE '1970-01-05') % 7 AS dow, x
        |  FROM daily),
        |agg AS (SELECT event_type, dow,
        |    SUM(x) AS sx, COUNT(*) AS cx FROM dw GROUP BY 1, 2),
        |tot AS (SELECT event_type, SUM(sx) AS tx, SUM(cx) AS tc
        |  FROM agg GROUP BY 1)
        |SELECT a.event_type, CAST(a.dow AS BIGINT) AS dow,
        |  CAST((a.sx * t.tc * 1000000) // (a.cx * t.tx) AS BIGINT)
        |    AS index_ppm
        |FROM agg a JOIN tot t ON a.event_type = t.event_type
        |ORDER BY a.event_type, dow""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
      val agg = daily
        .withColumn("dow",
          pmod(datediff(col("d"), lit("1970-01-05").cast("date")), lit(7))
            .cast("long"))
        .groupBy(col("event_type"), col("dow"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cx"))
      val tot = agg.groupBy(col("event_type"))
        .agg(sum(col("sx")).as("tx"), sum(col("cx")).as("tc"))
      agg.join(tot, "event_type")
        .withColumn("index_ppm",
          expr("(sx * tc * 1000000L) div (cx * tx)"))
        .select(col("event_type"), col("dow"), col("index_ppm"))
        .orderBy(col("event_type"), col("dow"))
    },

    // Time-constrained funnel (view → click → purchase, each stage
    // within 24 h of the PREVIOUS stage's earliest qualifying event):
    // the product-analytics shape where an unconstrained funnel (q90)
    // overcounts. Three per-user min aggregates chained by the window
    // constraint — user-keyed shuffles only, no event×event join.
    QueryDef.sqlBacked(
      "q202_windowed_funnel",
      """WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t1
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.t0
        |    AND e.ts <= v.t0 + INTERVAL 24 HOURS GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t1
        |    AND e.ts <= c.t1 + INTERVAL 24 HOURS GROUP BY 1)
        |SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM v
        |UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
        |UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
        |ORDER BY stage""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") >= col("t0") &&
          col("ts") <= col("t0") + expr("interval 24 hours"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") >= col("t1") &&
          col("ts") <= col("t1") + expr("interval 24 hours"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      def stage(tag: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("users")).select(lit(tag).as("stage"),
          col("users"))
      stage("1_view", v).unionAll(stage("2_click", c))
        .unionAll(stage("3_purchase", p)).orderBy(col("stage"))
    },

    // Cohort LTV curves: users cohorted by first-activity week, value
    // accumulated by cohort age in weeks — the retention table's
    // revenue twin. Cohorting is one per-user aggregate; the cumulative
    // sum runs over the (cohort × age) frame, which is weeks², not
    // users². Age = day-distance div 7 (both engines truncate weeks to
    // Monday, so the distance is an exact multiple of 7).
    QueryDef.sqlBacked(
      "q203_cohort_ltv",
      """WITH first AS (SELECT user_id,
        |    CAST(date_trunc('week', MIN(CAST(ts AS DATE))) AS DATE) AS cohort
        |  FROM events GROUP BY 1),
        |weekly AS (SELECT f.cohort,
        |    CAST(date_trunc('week', CAST(e.ts AS DATE)) AS DATE) AS wk,
        |    SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) AS cents
        |  FROM events e JOIN first f ON f.user_id = e.user_id
        |  GROUP BY 1, 2),
        |aged AS (SELECT cohort, CAST((wk - cohort) // 7 AS BIGINT) AS age,
        |    cents FROM weekly),
        |cohort_sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS users
        |  FROM first GROUP BY 1)
        |SELECT a.cohort, a.age, s.users,
        |  CAST(SUM(a.cents) OVER (PARTITION BY a.cohort ORDER BY a.age
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        |FROM aged a JOIN cohort_sizes s ON s.cohort = a.cohort
        |ORDER BY a.cohort, a.age""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val first = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts").cast("date")))
          .cast("date").as("cohort"))
      val weekly = ev.join(first, "user_id")
        .groupBy(col("cohort"),
          date_trunc("week", col("ts").cast("date")).cast("date").as("wk"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      val aged = weekly.select(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("long").as("age"),
        col("cents"))
      val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("users"))
      aged.join(sizes, "cohort")
        .withColumn("cum_cents", sum(col("cents")).over(
          Window.partitionBy(col("cohort")).orderBy(col("age"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("cohort"), col("age"), col("users"),
          col("cum_cents").cast("long"))
        .orderBy(col("cohort"), col("age"))
    },

    // Event-type precedence matrix (sequence mining, order-of-first-
    // occurrence): for every ordered type pair (a, b), how many users
    // saw a strictly before b. One per-(user, type) min aggregate, then
    // a user-keyed self-join of the 5-type mins — fan-out is types², not
    // events².
    QueryDef.sqlBacked(
      "q204_event_precedence",
      """WITH m AS (SELECT user_id, event_type, MIN(ts) AS t
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type AS first_type, b.event_type AS then_type,
        |  CAST(COUNT(*) AS BIGINT) AS users
        |FROM m a JOIN m b
        |  ON a.user_id = b.user_id AND a.event_type <> b.event_type
        |WHERE a.t < b.t
        |GROUP BY 1, 2 ORDER BY first_type, then_type""".stripMargin) { (s, dir) =>
      val m = Tables.load(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("ts")).as("t"))
      m.as("a").join(m.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") =!= col("b.event_type") &&
            col("a.t") < col("b.t"))
        .groupBy(col("a.event_type").as("first_type"),
          col("b.event_type").as("then_type"))
        .agg(count(lit(1)).as("users"))
        .orderBy(col("first_type"), col("then_type"))
    },

    // Position-based (U-shaped, 40/20/40) multi-touch attribution in
    // EXACT basis points: per user, the first and last touch each get
    // 4000 bps, the middles split 2000 by integer division with the
    // remainder going to the EARLIEST middles — so every user's credit
    // sums to exactly 10000 and the per-type totals are
    // hash-comparable, no floating credit. One user-keyed window.
    QueryDef.sqlBacked(
      "q235_position_attribution",
      """WITH t AS (
        |  SELECT user_id, event_type, ts, event_id
        |  FROM events WHERE event_type IN ('click', 'view')),
        |r AS (
        |  SELECT event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS k
        |  FROM t),
        |c AS (
        |  SELECT event_type,
        |    CASE WHEN k = 1 THEN 10000
        |         WHEN k = 2 THEN 5000
        |         WHEN rn = 1 OR rn = k THEN 4000
        |         ELSE CAST(2000 // (k - 2) AS BIGINT)
        |           + CASE WHEN rn - 1 <= 2000 % (k - 2) THEN 1 ELSE 0 END
        |    END AS bps
        |  FROM r)
        |SELECT event_type, CAST(SUM(bps) AS BIGINT) AS total_bps,
        |  CAST(COUNT(*) AS BIGINT) AS n_touches
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wk = Window.partitionBy(col("user_id"))
      Tables.load(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("k", count(lit(1)).over(wk))
        .select(col("event_type"),
          when(col("k") === 1, 10000L)
            .when(col("k") === 2, 5000L)
            .when(col("rn") === 1 || col("rn") === col("k"), 4000L)
            .otherwise((lit(2000L) / (col("k") - 2)).cast("long") +
              when(col("rn") - 1 <= lit(2000L) % (col("k") - 2), 1L)
                .otherwise(0L))
            .as("bps"))
        .groupBy(col("event_type"))
        .agg(sum(col("bps")).cast("long").as("total_bps"),
          count(lit(1)).as("n_touches"))
        .orderBy(col("event_type"))
    },

    // Theil–Sen robust trend (the median-of-pairwise-slopes estimator,
    // the outlier-immune complement of q154's OLS): per event type,
    // daily revenue totals pair within the group (days-per-type is
    // bounded by the time span, so the pair fan-out is quadratic only
    // in ~100 days, never in rows). INTEGER-EXACT floor semantics on
    // both engines: slopes can be negative and Spark's `div` truncates
    // while DuckDB's `//` floors, so the division is SHIFTED positive
    // by K·dt (K = 10¹⁵ — the shifted numerator stays positive for any
    // |dv| ≤ 10⁹ cents/day, 100× past the largest daily total any SF
    // here produces, while K·dt_max ~ 10¹⁷ keeps int64 headroom) and
    // K subtracted back — algebraically
    // floor(dv·10⁶/dt) everywhere. The lower median picks rank
    // (n+1)/2, deterministic under ties.
    QueryDef.sqlBacked(
      "q248_theil_sen",
      """WITH d AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2000-01-01', CAST(ts AS DATE)) AS day,
        |    SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    ((b.cents - a.cents) * 1000000
        |      + 1000000000000000 * (b.day - a.day)) // (b.day - a.day)
        |      - 1000000000000000 AS slope_ppm
        |  FROM d a JOIN d b
        |    ON a.event_type = b.event_type AND b.day > a.day),
        |r AS (SELECT event_type, slope_ppm,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY slope_ppm) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM p)
        |SELECT event_type, CAST(slope_ppm AS BIGINT) AS theil_sen_ppm
        |FROM r WHERE rn = (cnt + 1) // 2
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val K = 1000000000000000L
      val d = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2000-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      val a = d.select(col("event_type"), col("day").as("d1"),
        col("cents").as("c1"))
      val b = d.select(col("event_type").as("et2"), col("day").as("d2"),
        col("cents").as("c2"))
      val pairs = a.join(b,
        col("event_type") === col("et2") && col("d2") > col("d1"))
        .select(col("event_type"),
          expr(s"((c2 - c1) * 1000000L + ${K}L * (d2 - d1)) div (d2 - d1)" +
            s" - ${K}L").as("slope_ppm"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("slope_ppm"))
      val wc = Window.partitionBy(col("event_type"))
      pairs.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter(col("rn") === expr("(cnt + 1L) div 2L"))
        .select(col("event_type"), col("slope_ppm").as("theil_sen_ppm"))
        .orderBy(col("event_type"))
    },

    // Lag-1 autocorrelation of the daily revenue series, EXACT: Pearson
    // r² in ppm computed entirely in integers — r²·10⁶ =
    // num²·10⁶ // (d1·d2) with num = n·Σxy − Σx·Σy and d- the variance
    // forms — plus the correlation's sign as ±1. num² reaches ~10²⁷, so
    // the squaring runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB);
    // every value is a whole-dollar total, so no float ever appears and
    // the engines agree to the last ppm. One scan, one per-type daily
    // aggregate, one lead() window, one group aggregate.
    QueryDef.sqlBacked(
      "q251_autocorrelation",
      """WITH d AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2000-01-01', CAST(ts AS DATE)) AS day,
        |    SUM(CAST(FLOOR(value) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, x,
        |    LEAD(x) OVER (PARTITION BY event_type ORDER BY day) AS y
        |  FROM d),
        |m AS (SELECT event_type, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM l WHERE y IS NOT NULL GROUP BY event_type),
        |c AS (SELECT event_type,
        |    n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS d1, n * syy - sy * sy AS d2
        |  FROM m)
        |SELECT event_type,
        |  CAST((CAST(num AS HUGEINT) * num * 1000000)
        |    // (CAST(d1 AS HUGEINT) * d2) AS BIGINT) AS r2_ppm,
        |  CAST(CASE WHEN num >= 0 THEN 1 ELSE -1 END AS BIGINT) AS sign
        |FROM c WHERE d1 > 0 AND d2 > 0
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2000-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(sum(floor(col("value")).cast("long")).as("x"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      d.withColumn("y", lead(col("x"), 1).over(w))
        .filter(col("y").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"),
          expr("n * sxy - sx * sy").as("num"),
          expr("n * sxx - sx * sx").as("d1"),
          expr("n * syy - sy * sy").as("d2"))
        .filter(col("d1") > 0 && col("d2") > 0)
        .select(col("event_type"),
          expr("CAST((CAST(num AS DECIMAL(38,0)) * num * 1000000) div " +
            "(CAST(d1 AS DECIMAL(38,0)) * d2) AS BIGINT)").as("r2_ppm"),
          when(col("num") >= 0, 1L).otherwise(-1L).as("sign"))
        .orderBy(col("event_type"))
    },

    // Semi-structured props through Spark 4's VARIANT type (q31's
    // modern twin): parse_json builds the shredded binary encoding
    // ONCE, then typed variant_get extraction — the engine-native
    // semi-structured path, not per-access string re-parsing. The
    // oracle extracts the same values with DuckDB's JSON functions.
    QueryDef.sqlBacked(
      "q254_variant_extract",
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  CAST(COUNT(*) FILTER (WHERE
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) > 50)
        |    AS BIGINT) AS n_high
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).cast("long").as("sum_k"),
          count(when(col("k") > 50, 1)).as("n_high"))
        .orderBy(col("event_type"))
    },

    // PIVOT to a wide day-of-week × event-type count matrix — the
    // relational pivot operator (Dataset.pivot with EXPLICIT values, so
    // no extra distinct-discovery pass runs before the aggregate). The
    // dow is q197's engine-agnostic epoch-day arithmetic; the oracle
    // spells the same matrix as CASE aggregation.
    QueryDef.sqlBacked(
      "q276_pivot_dow_matrix",
      """SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT)
        |    AS dow,
        |  CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        |    AS click,
        |  CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
        |    AS error,
        |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
        |    AS purchase,
        |  CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT)
        |    AS signup,
        |  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
        |    AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(datediff(col("ts").cast("date"),
            lit("1970-01-05").cast("date")).cast("long").mod(7).as("dow"),
          col("event_type"))
        .groupBy(col("dow"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("dow"))
    },

    // EVENT-PATH REGEX matching (the MATCH_RECOGNIZE generalization of
    // the fixed-stage funnels q90/q202): each user's event-type
    // sequence becomes a string over a DATA-DERIVED alphabet
    // (alphabetical rank of the type → one char, so the mapping needs
    // no hardcoding and both engines state it identically), and
    // arbitrary regex patterns count matching users — "viewed then
    // clicked then purchased, in order, anything between" is 'e.*a.*c'.
    // One shuffle to the per-user frame; sequences are user-activity-
    // bounded; the pattern pass is map-only over |users| strings.
    QueryDef.sqlBacked(
      "q363_path_regex",
      """WITH tm AS (SELECT event_type,
        |    chr(96 + CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS INT))
        |      AS c
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |sq AS (SELECT user_id, string_agg(c, '' ORDER BY ts, event_id)
        |    AS seq
        |  FROM events JOIN tm USING (event_type) GROUP BY user_id)
        |SELECT p.pattern, CAST((SELECT COUNT(*) FROM sq) AS BIGINT)
        |    AS n_users,
        |  CAST((SELECT COUNT(*) FILTER (regexp_matches(seq, p.re))
        |    FROM sq) AS BIGINT) AS n_matched
        |FROM (VALUES
        |    ('funnel_view_click_purchase', 'e.*a.*c'),
        |    ('view_click_adjacent', 'ea'),
        |    ('three_errors', 'b.*b.*b'),
        |    ('purchase_never_errors_after', 'c[^b]*$')) p(pattern, re)
        |ORDER BY p.pattern""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      // 5-row frame: the unpartitioned window is bounded by |types|
      val tmap = ev.select(col("event_type")).distinct()
        .withColumn("c", expr(
          "chr(96 + row_number() OVER (ORDER BY event_type))"))
      val seqs = ev.join(broadcast(tmap), "event_type")
        .groupBy(col("user_id"))
        .agg(concat_ws("", expr(
          "transform(array_sort(collect_list(struct(ts, event_id, c)))," +
            " x -> x.c)")).as("seq"))
        .persist()
      try {
        val patterns = Seq(
          ("funnel_view_click_purchase", "e.*a.*c"),
          ("view_click_adjacent", "ea"),
          ("three_errors", "b.*b.*b"),
          ("purchase_never_errors_after", "c[^b]*$"))
        val agg = seqs.agg(
          count(lit(1)).as("n_users"),
          patterns.map { case (name, re) =>
            count(when(col("seq").rlike(re), 1)).as(name)
          }: _*).head()
        patterns.zipWithIndex.map { case ((name, _), i) =>
          (name, agg.getLong(0), agg.getLong(i + 1))
        }.toDF("pattern", "n_users", "n_matched")
          .orderBy(col("pattern"))
      } finally { seqs.unpersist(); () }
    },

    // Traffic BURSTINESS (Fano factor = variance/mean of per-hour event
    // counts, per event type — the dispersion screen behind rate-limit
    // and anomaly thresholds; ≈1e6 ppm means Poisson-like, far above
    // means bursty): counts per (type, hour) then ONE aggregate per type
    // over its hour frame, the whole statistic in exact integers —
    // fano_ppm = (n·Σc² − (Σc)²)·1e6 DIV (n·Σc) over OBSERVED hours
    // (stated: empty hours are out of frame), sums carried wide
    // (DECIMAL(38,0) ↔ HUGEINT) so the only narrowing DIV is the final
    // small ratio. Hours from exact MICROSECONDS so bucket edges cannot
    // drift between engines.
    QueryDef.sqlBacked(
      "q373_burstiness",
      """WITH c AS (SELECT event_type,
        |    epoch_us(ts) // 3600000000 AS h, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  CAST(SUM(n) AS BIGINT) AS n_events,
        |  CAST((COUNT(*) * CAST(SUM(n * n) AS HUGEINT)
        |      - CAST(SUM(n) AS HUGEINT) * SUM(n)) * 1000000
        |    // (COUNT(*) * CAST(SUM(n) AS HUGEINT)) AS BIGINT)
        |    AS fano_ppm
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
      Tables.load(s, dir, "events")
        // integer DIV, not `/`: double division of ~1e15 micros then a
        // cast could truncate differently at exact hour boundaries
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 3600000000").as("h"))
        .groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(col("n")).cast("long").as("n_events"),
          expr("""CAST((COUNT(*) * SUM(CAST(n AS DECIMAL(38,0)) * n)
            - SUM(CAST(n AS DECIMAL(38,0))) * SUM(CAST(n AS DECIMAL(38,0))))
            * 1000000 DIV (COUNT(*) * SUM(CAST(n AS DECIMAL(38,0))))
            AS BIGINT)""").as("fano_ppm"))
        .orderBy(col("event_type"))
    },

    // TIME-WEIGHTED average (TWAP — the right mean for irregularly
    // sampled state: each event's value HOLDS until the user's next
    // event): per user Σ cents·Δt DIV (last−first) over exact
    // MICROSECOND gaps and floor-cents values (the established
    // conventions), rolled to a bucket histogram so the output is
    // distribution-sized. Products carried in DECIMAL(38,0) ↔ HUGEINT
    // (cents·Δt reaches ~1e16 per term); the only narrowing DIVs are
    // the final small ratios. DIV↔`//` agree only on non-negative
    // operands (Spark truncates toward zero, DuckDB floors), so the
    // sign invariant is ENFORCED, not assumed: both sides filter to
    // value >= 0 (the whole fixture today — the filter is a no-op that
    // exists to keep the protocol sign-safe if the data ever isn't).
    // One user-partitioned window + two aggregates.
    QueryDef.sqlBacked(
      "q375_twap",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS c,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nt
        |  FROM events WHERE value >= 0),
        |u AS (SELECT user_id,
        |    SUM(CAST(c AS HUGEINT) * (nt - t)) AS ws,
        |    MAX(t) - MIN(t) AS span
        |  FROM e GROUP BY user_id HAVING MAX(t) > MIN(t)),
        |tw AS (SELECT CAST(ws // span AS BIGINT) AS twap_cents FROM u)
        |SELECT CAST(twap_cents // 500 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(MIN(twap_cents) AS BIGINT) AS min_twap,
        |  CAST(MAX(twap_cents) AS BIGINT) AS max_twap
        |FROM tw GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .filter(col("value") >= 0)
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          floor(col("value") * 100).cast("long").as("c"),
          col("ts"), col("event_id"))
        .withColumn("nt", lead(col("t"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * (nt - t)")).as("ws"),
          (max(col("t")) - min(col("t"))).as("span"))
        .filter(col("span") > 0)
        .select(expr("CAST(ws DIV span AS BIGINT)").as("twap_cents"))
        .groupBy(expr("twap_cents DIV 500").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_users"),
          min(col("twap_cents")).cast("long").as("min_twap"),
          max(col("twap_cents")).cast("long").as("max_twap"))
        .orderBy(col("bucket"))
    }
  )
}
