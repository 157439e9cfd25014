package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 11: domain-mixture balancing under a token budget.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (curation / pipeline family).
  */
object SurfaceR8k extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LP29: waterfilling allocation of a token budget across sources —
    * the domain-balancing step of corpus mixing (every domain keeps
    * everything below the waterline; over-represented domains are
    * capped at a common level so the total hits the budget exactly).
    * Budget = 50% of corpus tokens. The waterline is found in closed
    * form from the by-size prefix sums — sources sorted ascending, k*
    * = the last rank whose full take still fits with the remaining
    * sources at its size — then the integer level and a deterministic
    * ±1 remainder spread make Σ alloc = budget EXACTLY (all integer
    * arithmetic; the spec asserts exact closure and the cap/level
    * dichotomy). Every window here runs over the #domains relation,
    * which is small by construction; facts are touched once for the
    * token counts. */
  val lp29MixtureWaterfill: Q = (s, d) => {
    val src = documents(s, d)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n"))
    val tot = src.agg(sum("n").as("stot"), count(lit(1)).as("k"),
      (sum("n") / 2).cast("long").as("b"))
    val byN = graft.Windows.bounded(col("n"), col("source"))
    val o = src
      .withColumn("rk", row_number().over(byN).cast("long"))
      .withColumn("pre", sum("n").over(
        byN.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
    val kstar = o
      .agg(max(when(col("pre") + col("n") * (col("k") - col("rk")) <= col("b"),
        col("rk")).otherwise(0L)).as("kstar"))
    val withK = o.crossJoin(broadcast(kstar))
    val preK = withK.where(col("rk") === col("kstar"))
      .agg(coalesce(max("pre"), lit(0L)).as("prek"))
    val staged = withK.crossJoin(broadcast(preK))
      .withColumn("level",
        when(col("kstar") === col("k"), lit(null).cast("long"))
          .otherwise(((col("b") - coalesce(col("prek"), lit(0L))) /
            (col("k") - col("kstar"))).cast("long")))
      .withColumn("a0",
        when(col("level").isNull || col("rk") <= col("kstar"), col("n"))
          .otherwise(col("level")))
    val rem = staged.agg((max("b") - sum("a0")).as("r"))
    staged.crossJoin(broadcast(rem))
      .withColumn("bump",
        when(col("a0") < col("n") &&
          row_number().over(
            Window.partitionBy(col("a0") < col("n")).orderBy("rk"))
            .cast("long") <= col("r") && col("r") > 0L, 1L)
          .otherwise(0L))
      .select(col("source"), col("n"), (col("a0") + col("bump")).as("alloc"))
      .orderBy("source")
  }

  /** T19: session windows with a DYNAMIC per-event gap — Spark 4's
    * `session_window(ts, gapExpr)`: error events hold a session open
    * for 6 h, everything else for 12 h (ops sessions shouldn't die
    * while a burst of errors is still fresh). The oracle reconstructs
    * the merge semantics independently: a new session starts exactly
    * when an event's time reaches the running MAX of all previous
    * events' (time + their gap) — the furthest-end chain rule, which
    * is what overlapping-interval merging reduces to under a sort.
    * Integer-µs arithmetic throughout. */
  val t19DynamicGapSession: Q = (s, d) => {
    // session_window's dynamic gap must be CalendarIntervalType —
    // make_interval, not an ANSI day-time interval literal
    val gap = when(col("event_type") === "error",
      expr("make_interval(0, 0, 0, 0, 6, 0, 0)"))
      .otherwise(expr("make_interval(0, 0, 0, 0, 12, 0, 0)"))
    events(s, d)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
      .select("user_id", "n_events", "start_us", "end_us")
      .orderBy("user_id", "start_us")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp29_mixture_waterfill" -> lp29MixtureWaterfill,
    "t19_dynamic_gap_session" -> t19DynamicGapSession)

  val oracleSql: Map[String, String] = Map(
    "lp29_mixture_waterfill" ->
      """WITH src AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |        CAST(sum(n) // 2 AS BIGINT) AS b FROM src),
        |o AS (
        |  SELECT source, n,
        |    CAST(row_number() OVER (ORDER BY n, source) AS BIGINT) AS rk,
        |    CAST(sum(n) OVER (ORDER BY n, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre
        |  FROM src),
        |lvl AS (
        |  SELECT max(CASE WHEN pre + n * (k - rk) <= b THEN rk ELSE 0 END) AS kstar
        |  FROM o CROSS JOIN tot),
        |wl AS (
        |  SELECT kstar,
        |    CASE WHEN kstar = (SELECT k FROM tot) THEN NULL
        |         ELSE ((SELECT b FROM tot)
        |               - coalesce((SELECT pre FROM o WHERE rk = kstar), 0))
        |              // ((SELECT k FROM tot) - kstar) END AS level
        |  FROM lvl),
        |alloc AS (
        |  SELECT o.source, o.n, o.rk,
        |    CASE WHEN wl.level IS NULL OR o.rk <= wl.kstar THEN o.n
        |         ELSE wl.level END AS a0
        |  FROM o CROSS JOIN wl),
        |rem AS (
        |  SELECT (SELECT b FROM tot) - CAST(sum(a0) AS BIGINT) AS r FROM alloc)
        |SELECT source, n,
        |  CAST(a0 + CASE WHEN a0 < n AND
        |      row_number() OVER (PARTITION BY (a0 < n) ORDER BY rk)
        |        <= (SELECT r FROM rem)
        |      AND (SELECT r FROM rem) > 0 THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM alloc ORDER BY source""".stripMargin,
    "t19_dynamic_gap_session" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tu,
        |    CASE WHEN event_type = 'error' THEN 21600000000
        |         ELSE 43200000000 END AS gap
        |  FROM events),
        |m AS (
        |  SELECT user_id, tu,
        |    CASE WHEN max(tu + gap) OVER w IS NULL
        |           OR tu >= max(tu + gap) OVER w THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |s AS (
        |  SELECT user_id, tu,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY tu
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM m)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(tu) AS start_us, max(tu) AS end_us
        |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin)
}
