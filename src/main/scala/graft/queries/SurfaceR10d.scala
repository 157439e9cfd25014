package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 4: ntile (the one rank-family member without
  * a registry row), Holt linear-trend exponential smoothing (the
  * recursive sibling of t15's EWMA — a genuine fold, expressed as the
  * same ordered struct-reduction on both engines), and the
  * Kaplan–Meier survival estimator (the nonparametric sibling of m69's
  * AFT fit, exact in SQL).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.5 (windows), §2.13 (time series / survival).
  */
object SurfaceR10d extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** W12: ntile — equal-frequency bucket assignment over a per-group
    * order (the rank-family member w1/w8 left out). Partitioned window,
    * no global sort. */
  val w12Ntile: Q = (s, d) => {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("o_orderkey")
  }

  /** LT17: HOLT LINEAR-TREND SMOOTHING — level+trend double exponential
    * smoothing (α=0.5, β=0.3) over each event type's daily-mean series.
    * Unlike t15's EWMA (whose closed form is a weighted window sum),
    * Holt's coupled level/trend recursion is a genuine fold — run as
    * `aggregate` over the date-sorted series with a struct accumulator,
    * the IDENTICAL op-order reduction the DuckDB oracle spells out with
    * `list_reduce`. Scale: the fold state is per-GROUP and the series
    * length is bounded by distinct DAYS (not events) — the daily
    * pre-aggregation is the distributed pass; the fold is O(days) per
    * type. Output: final level/trend and the 1-step forecast. */
  val lt17Holt: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("sv"),
        count(lit(1)).as("n_days"))
      .select(col("event_type"), col("n_days"),
        // trend update in the EXPANDED form t' = βα·x − βα·l + (1−β(1−α))·t
        // (β(l'−l)+(1−β)t with l' substituted) so the l' subexpression
        // appears exactly once: DuckDB's lambda CSE mis-evaluates a
        // repeated struct-field subexpression, and a single-occurrence
        // formula is the cross-engine-safe spelling of the same fold.
        expr("""aggregate(sv,
          named_struct('l', cast(0.0 as double), 't', cast(0.0 as double), 'i', 0),
          (acc, x) -> CASE WHEN acc.i = 0
            THEN named_struct('l', x.v, 't', cast(0.0 as double), 'i', 1)
            ELSE named_struct(
              'l', 0.5 * x.v + 0.5 * (acc.l + acc.t),
              't', 0.15 * x.v - 0.15 * acc.l + 0.85 * acc.t,
              'i', acc.i + 1) END)""").as("h"))
      .select(col("event_type"), col("n_days"),
        r4(col("h.l")).as("level"),
        r4(col("h.t")).as("trend"),
        r4(col("h.l") + col("h.t")).as("forecast_1"))
      .orderBy("event_type")
  }

  /** M71: KAPLAN–MEIER SURVIVAL CURVE per order priority — durations in
    * days to a fixed administrative censor date, event = finalized
    * status ('F'). Exact product-limit estimator via
    * exp(Σ ln(1 − dᵢ/nᵢ)) over the per-group time-ordered window (the
    * cumulative-product idiom both engines evaluate in the same
    * ascending order). At-risk counts from one cumulative window over
    * the per-time death/censor tallies — two partitioned windows, no
    * global sort, no driver loop. */
  val m71KaplanMeier: Q = (s, d) => {
    val base = orders(s, d).select(
      col("o_orderpriority").as("grp"),
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"))
    val perT = base.groupBy("grp", "dur")
      .agg(sum("ev").as("d"), count(lit(1)).as("c"))
    val w = Window.partitionBy("grp").orderBy("dur")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("grp")
    perT
      .withColumn("n_total", sum(col("c")).over(tot))
      .withColumn("left_before",
        sum(col("c")).over(wCum) - col("c"))
      .withColumn("n_risk", col("n_total") - col("left_before"))
      // d < n_risk: the terminal complete-death time (S would hit exactly
      // 0 via ln(0) = −∞) is excluded — the curve is reported at event
      // times with survivors remaining, identically on both engines
      // (DuckDB's ln(0) errors instead of returning −∞).
      .where(col("d") > 0 && col("d") < col("n_risk"))
      .withColumn("surv",
        exp(sum(log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .over(wCum)))
      .select(col("grp"), col("dur"), col("d"), col("n_risk"),
        r4(col("surv")).as("surv"))
      .orderBy("grp", "dur")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "w12_ntile" -> w12Ntile,
    "lt17_holt" -> lt17Holt,
    "m71_kaplan_meier" -> m71KaplanMeier)

  val oracleSql: Map[String, String] = Map(
    "w12_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(4) OVER (PARTITION BY o_orderpriority
        |                 ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // Oracle via RECURSIVE CTE rather than list_reduce: DuckDB 1.0's
    // struct-accumulator lambda mis-reads fields of the struct under
    // construction, so the recursion is spelled as the per-step join —
    // identical fp op order to the Spark fold.
    "lt17_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    avg(value) AS v
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS INT) AS j,
        |    CAST(v AS DOUBLE) AS v
        |  FROM daily),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM idx GROUP BY 1),
        |rec AS (
        |  SELECT event_type, j, v AS l, CAST(0.0 AS DOUBLE) AS t
        |  FROM idx WHERE j = 1
        |  UNION ALL
        |  SELECT i.event_type, i.j,
        |    0.5 * i.v + 0.5 * (r.l + r.t),
        |    0.15 * i.v - 0.15 * r.l + 0.85 * r.t
        |  FROM rec r JOIN idx i ON i.event_type = r.event_type AND i.j = r.j + 1),
        |fin AS (SELECT event_type, max_by(l, j) AS l, max_by(t, j) AS t
        |        FROM rec GROUP BY 1)
        |SELECT f.event_type, n.n_days,
        |  round(f.l, 4) AS level, round(f.t, 4) AS trend,
        |  round(f.l + f.t, 4) AS forecast_1
        |FROM fin f JOIN nd n USING (event_type) ORDER BY event_type""".stripMargin,
    "m71_kaplan_meier" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS dur,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
        |  FROM orders),
        |pt AS (
        |  SELECT grp, dur, CAST(sum(ev) AS BIGINT) AS d,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |r AS (
        |  SELECT grp, dur, d, c,
        |    sum(c) OVER (PARTITION BY grp) AS n_total,
        |    sum(c) OVER (PARTITION BY grp ORDER BY dur
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
        |      AS left_before
        |  FROM pt)
        |SELECT grp, dur, d,
        |  CAST(n_total - left_before AS BIGINT) AS n_risk,
        |  round(exp(sum(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_total - left_before AS DOUBLE)))
        |    OVER (PARTITION BY grp ORDER BY dur
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4) AS surv
        |FROM r WHERE d > 0 AND d < n_total - left_before
        |ORDER BY grp, dur""".stripMargin)
}
