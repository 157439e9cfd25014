package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 41: robust trend estimation — the Theil–Sen
  * slope (median of pairwise slopes: one wild week cannot move it, the
  * OLS slope m121 fits can be dragged anywhere by a single outlier)
  * and the Mann–Kendall trend test (its rank-based significance
  * companion; together they are the standard nonparametric trend kit).
  *
  * Both run on the calendar-bounded weekly order-count series (~360
  * rows regardless of corpus size), so the all-pairs join is a
  * bounded broadcast nested-loop (~65k pairs) — facts only ever feed
  * the per-week hash aggregate. Pair statistics are exact integers;
  * the closing formulas are ONE shared SQL text.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (time series, robust statistics).
  */
object SurfaceR10ao extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val weekSql =
    "CAST(floor(CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) / 7.0) AS BIGINT)"

  // ---- M122: Theil–Sen ----

  /** M122: THEIL–SEN — median of the (y_b−y_a)/(w_b−w_a) pairwise
    * slopes over the weekly series, intercept = med(y) − slope·med(w).
    * Every slope is a ratio of exact integers (identical IEEE divide
    * on both engines); the median is an order statistic, so the whole
    * estimator is deterministic to the last bit up to the engines'
    * midpoint-interpolation op order (sub-1e-4 — the m72
    * percentile ≡ quantile_cont precedent). */
  val m122TheilSen: Q = (s, d) => {
    val weekly = orders(s, d)
      .select(expr(sparkWeek).as("w"))
      .groupBy("w").agg(count(lit(1)).as("y"))
    val slopes = weekly.as("a").join(broadcast(weekly.as("b")),
        expr("a.w < b.w"))
      .select(expr("CAST(b.y - a.y AS DOUBLE) / (b.w - a.w)").as("slope"))
    val medSlope = slopes.agg(count(lit(1)).as("n_pairs"),
      expr("percentile(slope, 0.5)").as("ts_slope"))
    val meds = weekly.agg(count(lit(1)).as("n_weeks"),
      expr("percentile(w, 0.5)").as("med_w"),
      expr("percentile(y, 0.5)").as("med_y"))
    medSlope.crossJoin(broadcast(meds))
      .select(col("n_weeks"), col("n_pairs"),
        r4(col("ts_slope")).as("slope"),
        r4(expr("med_y - ts_slope * med_w")).as("intercept"))
  }

  // ---- M123: Mann–Kendall ----

  private val mkVar =
    "((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tie_term) / 18.0)"
  private val mkZ =
    s"(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt($mkVar) " +
      s"WHEN s_stat < 0 THEN (s_stat + 1) / sqrt($mkVar) ELSE 0.0 END)"

  /** M123: MANN–KENDALL — S = Σ_{i<j} sgn(y_j−y_i) over the weekly
    * series with the tie-corrected variance
    * Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 and the
    * continuity-corrected Z. S and the tie term are exact integers
    * (the sign is a CASE, not float signum); only the final Z touches
    * doubles, through one shared formula. |Z| > 1.96 ⇒ a monotone
    * trend at 5% — the test you run before bothering to fit m122's
    * slope. */
  val m123MannKendall: Q = (s, d) => {
    val weekly = orders(s, d)
      .select(expr(sparkWeek).as("w"))
      .groupBy("w").agg(count(lit(1)).as("y"))
    val sStat = weekly.as("a").join(broadcast(weekly.as("b")),
        expr("a.w < b.w"))
      .agg(sum(expr(
        "CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END"))
        .as("s_stat"))
    val ties = weekly.groupBy("y").agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
    val n = weekly.agg(count(lit(1)).as("n"))
    sStat.crossJoin(broadcast(ties)).crossJoin(broadcast(n))
      .select(col("n").as("n_weeks"), col("s_stat"),
        r4(expr(mkZ)).as("z"))
  }

  /** Spark-side week expression — identical text modulo the datediff
    * spelling (Spark `datediff(end, start)` ≡ DuckDB
    * `date_diff('day', start, end)`; both BIGINT day counts). */
  private def sparkWeek: String =
    "CAST(floor(CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT) / 7.0) AS BIGINT)"

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m122_theil_sen" -> m122TheilSen,
    "m123_mann_kendall" -> m123MannKendall)

  val oracleSql: Map[String, String] = Map(
    "m122_theil_sen" ->
      s"""WITH weekly AS (
        |  SELECT $weekSql AS w, CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |slopes AS (
        |  SELECT CAST(b.y - a.y AS DOUBLE) / (b.w - a.w) AS slope
        |  FROM weekly a JOIN weekly b ON a.w < b.w),
        |ms AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    quantile_cont(slope, 0.5) AS ts_slope
        |  FROM slopes),
        |md AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_weeks,
        |    quantile_cont(w, 0.5) AS med_w,
        |    quantile_cont(y, 0.5) AS med_y
        |  FROM weekly)
        |SELECT n_weeks, n_pairs,
        |  round(ts_slope, 4) AS slope,
        |  round(med_y - ts_slope * med_w, 4) AS intercept
        |FROM ms CROSS JOIN md""".stripMargin,
    "m123_mann_kendall" ->
      s"""WITH weekly AS (
        |  SELECT $weekSql AS w, CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM weekly a JOIN weekly b ON a.w < b.w),
        |tg AS (SELECT y, CAST(count(*) AS BIGINT) AS t FROM weekly GROUP BY 1),
        |ties AS (
        |  SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM tg),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM weekly)
        |SELECT n AS n_weeks, s_stat,
        |  round($mkZ, 4) AS z
        |FROM s CROSS JOIN ties CROSS JOIN nn""".stripMargin)
}
