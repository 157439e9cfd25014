package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 40: time-series regression diagnostics —
  * the Ljung–Box portmanteau test (is this series white noise?) and
  * the Durbin–Watson statistic (are the trend-fit residuals serially
  * correlated?). Both run on calendar-bounded daily aggregates, so
  * their windows are [[graft.Windows]]-sanctioned bounded series; the
  * fact tables only ever feed hash aggregates.
  *
  * House float discipline: every sum is an exact integer (counts,
  * n·x−S centered values, 1e-4-quantized residuals); statistics are
  * ONE shared SQL formula text over those integers (lt11/a34 pattern).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (time series).
  */
object SurfaceR10an extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT36: Ljung–Box ----

  private val lbRho = "(CAST(num AS DOUBLE) / den)"
  private val lbTerm = s"($lbRho * $lbRho / (CAST(n AS DOUBLE) - lag))"
  private val lbQ = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * sum_term)"

  /** LT36: LJUNG–BOX — per event_type, Q = n(n+2)·Σₖρₖ²/(n−k) over
    * lags 1..5 of the daily event-count series. The ACF is computed
    * from EXACT integers: u_t = n·x_t − S (the n-scaled centered
    * count), ρₖ = Σu_t·u_{t−k} / Σu_t² — no float mean subtraction
    * anywhere, so ρ is bit-deterministic. Series length is calendar-
    * bounded (≤ #days regardless of corpus size); daily counts grow
    * with volume but u² stays ≪ 2⁶³ through sf1 (resample weekly
    * beyond that). Facts → per-(type,day) hash agg; the lag windows
    * run per type over the bounded series. */
  val lt36LjungBox: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"))
    val cells = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val u = daily.join(broadcast(cells), "event_type")
      .select(col("event_type"), col("day"), col("n"),
        (col("n") * col("x") - col("sx")).as("u"))
    val den = u.groupBy("event_type").agg(sum(expr("u * u")).as("den"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagged = (1 to 5).map { k =>
      u.withColumn("lag", lit(k.toLong))
        .withColumn("y", lag(col("u"), k).over(w))
        .where(col("y").isNotNull)
    }.reduce(_ unionAll _)
    lagged.groupBy("event_type", "n", "lag")
      .agg(sum(expr("u * y")).as("num"))
      .join(broadcast(den), "event_type")
      .groupBy("event_type", "n")
      .agg(sum(expr(lbTerm)).as("sum_term"),
        max(when(col("lag") === 1, expr(lbRho))).as("rho1raw"))
      .select(col("event_type"), col("n").as("n_days"),
        r4(col("rho1raw")).as("rho1"),
        r4(expr(lbQ)).as("q_lb"))
      .orderBy("event_type")
  }

  // ---- M121: Durbin–Watson ----

  private val dwB =
    "((n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy) / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st))"
  private val dwA = s"((CAST(sy AS DOUBLE) - $dwB * st) / n)"
  private val dwE = s"(CAST(y AS DOUBLE) - $dwA - $dwB * t)"
  private val dwEq = s"CAST(floor($dwE * 1e4 + 0.5) AS BIGINT)"

  /** M121: DURBIN–WATSON — fit the daily order count on time by
    * closed-form OLS (slope/intercept from five exact integer sums),
    * then DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² on the residuals. Residuals are
    * 1e-4-QUANTIZED to integers before the two sums, so the statistic
    * is bit-deterministic end to end (the m97 Cook's-distance lesson:
    * never sum raw floats whose order the engine picks). The series
    * is calendar-bounded, so the single lag window is a sanctioned
    * [[graft.Windows.bounded]]; DW≈2 means independent residuals,
    * →0 positive serial correlation (what a weekly cycle produces). */
  val m121DurbinWatson: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    val sums = daily.agg(count(lit(1)).as("n"), sum("t").as("st"),
      sum("y").as("sy"), sum(expr("t * t")).as("stt"),
      sum(expr("t * y")).as("sty"))
    val eq = daily.crossJoin(broadcast(sums))
      .select(col("t"), col("n"), expr(dwEq).as("eq"),
        r4(expr(dwB)).as("slope_r"))
    val w = graft.Windows.bounded(col("t"))
    eq.withColumn("eqp", lag(col("eq"), 1).over(w))
      .groupBy("n", "slope_r")
      .agg(sum(expr("(eq - eqp) * (eq - eqp)")).as("num"),
        sum(expr("eq * eq")).as("den"))
      .select(col("n").as("n_days"),
        col("slope_r").as("slope"),
        r4(expr("CAST(num AS DOUBLE) / den")).as("dw"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt36_ljung_box" -> lt36LjungBox,
    "m121_durbin_watson" -> m121DurbinWatson)

  val oracleSql: Map[String, String] = Map(
    "lt36_ljung_box" ->
      s"""WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx
        |  FROM daily GROUP BY 1),
        |u AS (
        |  SELECT d.event_type, d.day, c.n, c.n * d.x - c.sx AS u
        |  FROM daily d JOIN cells c USING (event_type)),
        |den AS (
        |  SELECT event_type, CAST(sum(u * u) AS BIGINT) AS den
        |  FROM u GROUP BY 1),
        |l AS (
        |  SELECT event_type, n, k.lag, u,
        |    lag(u, CAST(k.lag AS INT)) OVER (PARTITION BY event_type, k.lag
        |      ORDER BY day) AS y
        |  FROM u CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5]) AS lag) k),
        |nums AS (
        |  SELECT event_type, n, CAST(lag AS BIGINT) AS lag,
        |    CAST(sum(u * y) AS BIGINT) AS num
        |  FROM l WHERE y IS NOT NULL GROUP BY 1, 2, 3),
        |agg AS (
        |  SELECT nums.event_type, n,
        |    sum($lbTerm) AS sum_term,
        |    max(CASE WHEN lag = 1 THEN $lbRho END) AS rho1raw
        |  FROM nums JOIN den ON den.event_type = nums.event_type
        |  GROUP BY 1, 2)
        |SELECT event_type, n AS n_days,
        |  round(rho1raw, 4) AS rho1,
        |  round($lbQ, 4) AS q_lb
        |FROM agg ORDER BY event_type""".stripMargin,
    "m121_durbin_watson" ->
      s"""WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS st,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(t * t) AS BIGINT) AS stt,
        |    CAST(sum(t * y) AS BIGINT) AS sty
        |  FROM daily),
        |eq AS (
        |  SELECT t, n, $dwEq AS eq, round($dwB, 4) AS slope_r
        |  FROM daily CROSS JOIN sums),
        |lagged AS (
        |  SELECT n, slope_r, eq, lag(eq, 1) OVER (ORDER BY t) AS eqp
        |  FROM eq),
        |agg AS (
        |  SELECT n, slope_r,
        |    CAST(sum((eq - eqp) * (eq - eqp)) AS BIGINT) AS num,
        |    CAST(sum(eq * eq) AS BIGINT) AS den
        |  FROM lagged GROUP BY 1, 2)
        |SELECT n AS n_days, slope_r AS slope,
        |  round(CAST(num AS DOUBLE) / den, 4) AS dw
        |FROM agg""".stripMargin)
}
