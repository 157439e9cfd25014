package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.AsOfJoin

/** Event-time operators in batch form (SURVEY.md §2.9 T1–T3) and the
  * as-of join (§2.3 J8). Streaming forms of T1–T3 reuse the identical
  * expressions under readStream (see graft.streaming).
  *
  * All event timestamps cross the oracle boundary as epoch integers
  * (BIGINT) — timestamp rendering differs between engines; integers don't.
  */
object TimeJson extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** T1: tumbling window via the real `window()` function (q6 exercises
    * the date_trunc route). */
  val t1TumblingWindow: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), r4(sum("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("win_start_s", "user_id")

  /** T2: sliding window — 1 hour every 15 minutes; each event lands in
    * four windows. */
  val t2SlidingWindow: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      // min/max are order-independent across engines (an avg here sat on
      // the 4-decimal rounding boundary for a handful of windows)
      .agg(
        count(lit(1)).as("n_events"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("n_events"), col("min_value"), col("max_value"))
      .orderBy("win_start_s")

  /** T3: session window — 10-minute gap per user. Output bounds are
    * min/max event time (not window end, whose +gap padding is a Spark
    * detail the oracle shouldn't re-derive). */
  val t3SessionWindow: Q = (s, d) =>
    events(s, d)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      // microsecond epochs: event times carry fractional seconds, and
      // DuckDB CAST(epoch() AS BIGINT) rounds while unix_timestamp
      // truncates — integers at full precision sidestep both
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("sess_start_us"),
        unix_micros(max(col("ts"))).as("sess_end_us"))
      .select("user_id", "sess_start_us", "sess_end_us", "n_events")
      .orderBy("user_id", "sess_start_us")

  /** J8: as-of join — for each purchase, the latest preceding click by
    * the same user (oracle: DuckDB ASOF JOIN). */
  val j8AsofJoin: Q = (s, d) => {
    val e = events(s, d)
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.where(col("event_type") === "click")
      .select("user_id", "ts", "value")
    AsOfJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts", "click_")
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("click_ts")).as("click_ts_us"),
        col("click_value"))
      .orderBy("event_id")
  }

  /** J8d: as-of with TOLERANCE — the backward match only counts when the
    * matched click is within 15 minutes of the purchase; staler matches
    * null out (the market-data "max staleness" contract). Composed as
    * backward as-of + a post-filter on the gap, so the join plan is
    * unchanged — tolerance costs one codegen'd projection.
    */
  val j8dAsofTolerance: Q = (s, d) => {
    val e = events(s, d)
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.where(col("event_type") === "click")
      .select("user_id", "ts", "value")
    val tolUs = 15L * 60 * 1000000
    val tolOk = col("click_ts").isNotNull &&
      (unix_micros(col("ts")) - unix_micros(col("click_ts")) <= lit(tolUs))
    AsOfJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts", "click_")
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(tolOk, unix_micros(col("click_ts"))).as("click_ts_us"),
        when(tolOk, col("click_value")).as("click_value"))
      .orderBy("event_id")
  }

  /** J8c: FORWARD as-of — each purchase matched to the EARLIEST click at
    * or after it ("next interaction"), the mirror of j8. */
  val j8cAsofForward: Q = (s, d) => {
    val e = events(s, d)
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.where(col("event_type") === "click")
      .select("user_id", "ts", "value")
    AsOfJoin.forward(purchases, clicks, Seq("user_id"), "ts", "ts", "click_")
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("click_ts")).as("click_ts_us"),
        col("click_value"))
      .orderBy("event_id")
  }

  /** J8b: the same as-of join through the native custom operator
    * (LogicalPlan + Strategy + merge-scan SparkPlan) — same DuckDB
    * ASOF JOIN oracle as j8. */
  val j8bAsofNative: Q = (s, d) => {
    val e = events(s, d)
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = e.where(col("event_type") === "click")
      .select("user_id", "ts", "value")
    org.apache.spark.sql.graft.AsOfJoinNative
      .backward(purchases, clicks, Seq("user_id"), "ts", "ts", "click_")
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("click_ts")).as("click_ts_us"),
        col("click_value"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "t1_tumbling_window" -> t1TumblingWindow,
    "t2_sliding_window" -> t2SlidingWindow,
    "t3_session_window" -> t3SessionWindow,
    "j8_asof_join" -> j8AsofJoin,
    "j8b_asof_native" -> j8bAsofNative,
    "j8c_asof_forward" -> j8cAsofForward,
    "j8d_asof_tolerance" -> j8dAsofTolerance,
  )

  val oracleSql: Map[String, String] = Map(
    "t1_tumbling_window" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP), TIMESTAMP '1970-01-01')) AS BIGINT) AS win_start_s,
        | user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY win_start_s, user_id""".stripMargin,
    "t2_sliding_window" ->
      """WITH b AS (
        |  SELECT CAST(floor(epoch(min(CAST(ts AS TIMESTAMP))) / 900) AS BIGINT) * 900 - 2700 AS lo_s,
        |         CAST(floor(epoch(max(CAST(ts AS TIMESTAMP))) / 900) AS BIGINT) * 900 AS hi_s
        |  FROM events),
        |starts AS (
        |  SELECT unnest(generate_series(lo_s, hi_s, 900)) AS s_s FROM b),
        |win AS (
        |  SELECT s_s, count(*) AS n_events,
        |   min(e.value) AS min_value, max(e.value) AS max_value
        |  FROM starts JOIN events e
        |    ON epoch(CAST(e.ts AS TIMESTAMP)) >= s_s
        |   AND epoch(CAST(e.ts AS TIMESTAMP)) < s_s + 3600
        |  GROUP BY s_s)
        |SELECT s_s AS win_start_s, n_events, min_value, max_value
        |FROM win ORDER BY win_start_s""".stripMargin,
    "t3_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id,
        | CAST(epoch_us(min(ts)) AS BIGINT) AS sess_start_us,
        | CAST(epoch_us(max(ts)) AS BIGINT) AS sess_end_us,
        | count(*) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_us""".stripMargin,
    "j8_asof_join" ->
      """SELECT p.event_id, p.user_id,
        | CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
        | CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
        | c.value AS click_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |                FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "j8c_asof_forward" ->
      """SELECT p.event_id, p.user_id,
        | CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
        | CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
        | c.value AS click_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |                FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "j8b_asof_native" ->
      """SELECT p.event_id, p.user_id,
        | CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
        | CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
        | c.value AS click_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |                FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "j8d_asof_tolerance" ->
      """SELECT p.event_id, p.user_id,
        | CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
        | CASE WHEN c.ts IS NOT NULL
        |        AND epoch_us(p.ts) - epoch_us(c.ts) <= 900000000
        |      THEN CAST(epoch_us(c.ts) AS BIGINT) END AS click_ts_us,
        | CASE WHEN c.ts IS NOT NULL
        |        AND epoch_us(p.ts) - epoch_us(c.ts) <= 900000000
        |      THEN c.value END AS click_value
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |                FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
  )
}
