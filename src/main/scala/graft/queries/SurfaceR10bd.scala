package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 56: process monitoring + SQL surface —
  * the Shewhart x̄/R control chart (the oldest and still most-used
  * operations monitor: weekly subgroups of daily volumes, limits at
  * X̿ ± A₂(n)·R̄) and the ANSI FILTER aggregate clause (the standard
  * conditional-aggregation syntax both engines parse natively —
  * exercised through the SQL front door like x8/x10/x15).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (monitoring), §2.11 (SQL surface).
  */
object SurfaceR10bd extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M140: x̄/R control chart ----

  private val ccXbb = "(CAST(ssum AS DOUBLE) / ndsum)"
  private val ccRbar = "(CAST(rsum AS DOUBLE) / b)"
  /** A2 constants for subgroup sizes 2..7 (classical x̄/R table). */
  private val ccA2 =
    "(CASE nd WHEN 2 THEN 1.880 WHEN 3 THEN 1.023 WHEN 4 THEN 0.729 WHEN 5 THEN 0.577 WHEN 6 THEN 0.483 ELSE 0.419 END)"
  private val ccOoc =
    s"(CASE WHEN CAST(s_w AS DOUBLE) / nd > $ccXbb + $ccA2 * $ccRbar OR CAST(s_w AS DOUBLE) / nd < $ccXbb - $ccA2 * $ccRbar THEN 1 ELSE 0 END)"

  /** M140: CONTROL CHART — weekly subgroups of the observed
    * daily order counts (variable subgroup size nd ≥ 2 — sparse
    * fixtures have empty days, and variable-n charts are standard
    * practice), x̄ chart with the classical A₂(n) range-based limits
    * looked up per subgroup, and the count of out-of-control weeks. Week sums and ranges are exact integers;
    * the limits and every OOC comparison run through ONE shared
    * formula text, so the flag count is bit-deterministic. Two hash
    * aggregates over the daily table — the plan a 100 TB event stream
    * would use unchanged (daily cells are already tiny). */
  val m140ControlChart: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    val weeks = daily
      .select(expr("CAST(floor(t / 7.0) AS BIGINT)").as("wk"), col("y"))
      .groupBy("wk")
      .agg(count(lit(1)).as("nd"), sum("y").as("s_w"),
        (max("y") - min("y")).as("r_w"))
      .where(col("nd") >= 2)
    val consts = weeks.agg(count(lit(1)).as("b"), sum("s_w").as("ssum"),
      sum("nd").as("ndsum"), sum("r_w").as("rsum"))
    weeks.crossJoin(broadcast(consts))
      .groupBy("b", "ssum", "ndsum", "rsum")
      .agg(sum(expr(ccOoc)).as("n_ooc"))
      .select(col("b").as("n_weeks"),
        r4(expr(ccXbb)).as("xbar_bar"),
        r4(expr(ccRbar)).as("r_bar"),
        col("n_ooc"))
  }

  // ---- X19: FILTER clause ----

  /** X19: FILTER CLAUSE — `agg(...) FILTER (WHERE ...)` through the
    * SQL front door: per priority, finalized/open counts and the
    * finalized-only revenue (exact cents). Same text runs on both
    * engines — the point of exercising the parser path is proving the
    * standard syntax, not inventing one. */
  val x19FilterClause: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("graft_x19_orders")
    s.sql(
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
        |  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    FILTER (WHERE o_orderstatus = 'F') AS final_cents
        |FROM graft_x19_orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m140_control_chart" -> m140ControlChart,
    "x19_filter_clause" -> x19FilterClause)

  val oracleSql: Map[String, String] = Map(
    "m140_control_chart" ->
      s"""WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |weeks AS (
        |  SELECT CAST(floor(t / 7.0) AS BIGINT) AS wk,
        |    CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(y) AS BIGINT) AS s_w,
        |    CAST(max(y) - min(y) AS BIGINT) AS r_w
        |  FROM daily GROUP BY 1),
        |full_weeks AS (SELECT * FROM weeks WHERE nd >= 2),
        |consts AS (
        |  SELECT CAST(count(*) AS BIGINT) AS b,
        |    CAST(sum(s_w) AS BIGINT) AS ssum,
        |    CAST(sum(nd) AS BIGINT) AS ndsum,
        |    CAST(sum(r_w) AS BIGINT) AS rsum
        |  FROM full_weeks),
        |agg AS (
        |  SELECT b, ssum, ndsum, rsum,
        |    CAST(sum($ccOoc) AS BIGINT) AS n_ooc
        |  FROM full_weeks CROSS JOIN consts
        |  GROUP BY 1, 2, 3, 4)
        |SELECT b AS n_weeks,
        |  round($ccXbb, 4) AS xbar_bar,
        |  round($ccRbar, 4) AS r_bar,
        |  n_ooc
        |FROM agg""".stripMargin,
    "x19_filter_clause" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_final,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS final_cents
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
}
