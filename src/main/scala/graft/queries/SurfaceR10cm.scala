package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 91: Weibull shape/scale via median-rank
  * regression, and closed-form ridge LOOCV (PRESS) to select the
  * penalty on the m168 system.
  *
  * Contrast with near-siblings: m71 (Kaplan–Meier) is the
  * NONPARAMETRIC survival curve and m69 (AFT) an iterative MLlib fit
  * spec'd without an oracle; Weibull median-rank regression is the
  * closed-form PARAMETRIC fit reliability engineering actually plots
  * (linearize ln(−ln(1−F)) = β·ln t − β·ln η on Bernard's median
  * ranks) — shape β answers "is fulfillment risk rising or falling
  * with age", which no nonparametric curve states. m168 reports the
  * ridge coefficient PATH but not which λ to pick; m173 closes that
  * loop with the leave-one-out identity e₋ᵢ = eᵢ/(1−hᵢ) — exact for
  * ridge at fixed λ — scoring each λ by PRESS without refitting n
  * models. m97 uses the same hat/residual algebra for per-point
  * INFLUENCE; here it aggregates into MODEL SELECTION.
  *
  * Float discipline: Weibull's regression points live on the bounded
  * distinct-duration table; x=ln t and y=ln(−ln(1−F)) are quantized
  * to 1e-4 BIGINTs (the m121 idiom) before the bounded OLS sums, so
  * both engines sum identical integers. PRESS quantizes each row's
  * squared deleted residual to whole dollars² before summing; every
  * per-row expression is one shared closed form over the exact
  * BIGINT moment row.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13; siblings m71/m69, m168 (SurfaceR10ce), m97.
  */
object SurfaceR10cm extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // Quantize a double expression to 1e-4 BIGINT (m121 residual idiom).
  private def q4(e: String): String =
    s"CAST(floor(($e) * 1e4 + 0.5) AS BIGINT)"

  // Weibull linearization point coords over (t, cum, n):
  private val wbF = "((cum - 0.3) / (n + 0.4))"
  private val wbX = "ln(CAST(t AS DOUBLE))"
  private val wbY = s"ln(-ln(1.0 - $wbF))"

  // OLS on the quantized points (sums sxq..syyq, k points), in 1e-4
  // units; slope is unit-free, intercept carries the 1e-4 scale back.
  private val wbSlope =
    "((k * CAST(sxyq AS DOUBLE) - CAST(sxq AS DOUBLE) * syq) /" +
    " (k * CAST(sxxq AS DOUBLE) - CAST(sxq AS DOUBLE) * sxq))"
  private val wbIntercept =
    s"((CAST(syq AS DOUBLE) - $wbSlope * sxq) / k / 1e4)"

  /** M172: WEIBULL MEDIAN-RANK FIT — order fulfillment age t = days
    * from order date to last shipment + 1 (the +1 keeps ln finite on
    * same-day orders, stated). Distinct ages carry Bernard's median
    * rank F = (i−0.3)/(n+0.4) at the rank of their LAST tied
    * observation; the ln/ln–ln point cloud (≤ calendar-bounded #ages)
    * is fit by OLS. Readout: shape β, scale η = exp(−a/β) in days,
    * and the fit R². β > 1 ⇒ fulfillment hazard rises with age.
    *
    * Scale shape: facts → per-order agg → distinct-age hash agg; the
    * cumulative rank rides the sanctioned bounded window; the OLS
    * sums are over the bounded point table.
    */
  val m172WeibullFit: Q = (s, d) => {
    val ages = lineitem(s, d).groupBy("l_orderkey")
      .agg(expr("max(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000)").as("ls"))
      .join(orders(s, d).select(col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(expr("greatest(ls - od, 0L) + 1").as("t"))
    val byT = ages.groupBy("t").agg(count(lit(1)).as("c"))
    val n1 = byT.agg(sum("c").as("n"))
    val wCum = Windows.bounded(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = byT.withColumn("cum", sum("c").over(wCum))
      .crossJoin(broadcast(n1))
      .select(expr(q4(wbX)).as("xq"), expr(q4(wbY)).as("yq"))
    pts.agg(count(lit(1)).as("k"),
        sum("xq").as("sxq"), sum("yq").as("syq"),
        sum(expr("xq * xq")).as("sxxq"), sum(expr("xq * yq")).as("sxyq"),
        sum(expr("yq * yq")).as("syyq"))
      .select(col("k"),
        r4(expr(wbSlope)).as("shape"),
        r4(expr(s"exp(-($wbIntercept) / $wbSlope)")).as("scale_days"),
        r4(expr(
          "(k * CAST(sxyq AS DOUBLE) - CAST(sxq AS DOUBLE) * syq) *" +
          " (k * CAST(sxyq AS DOUBLE) - CAST(sxq AS DOUBLE) * syq) /" +
          " ((k * CAST(sxxq AS DOUBLE) - CAST(sxq AS DOUBLE) * sxq) *" +
          "  (k * CAST(syyq AS DOUBLE) - CAST(syq AS DOUBLE) * syq))"))
          .as("r2"))
  }

  // ---- M173: ridge PRESS over the m168 standardized system ----

  // Moment-derived scalars (shared by Spark and DuckDB): centered
  // second moments, correlations, per-λ standardized coefficients.
  private val rpC11 = "(s11 - CAST(s1 AS DOUBLE) * s1 / n)"
  private val rpC22 = "(s22 - CAST(s2 AS DOUBLE) * s2 / n)"
  private val rpC12 = "(s12 - CAST(s1 AS DOUBLE) * s2 / n)"
  private val rpC1y = "(s1y - CAST(s1 AS DOUBLE) * sy / n)"
  private val rpC2y = "(s2y - CAST(s2 AS DOUBLE) * sy / n)"
  private val rpCyy = "(syy - CAST(sy AS DOUBLE) * sy / n)"
  private val rpR12 = s"($rpC12 / sqrt($rpC11 * $rpC22))"
  private val rpR1y = s"($rpC1y / sqrt($rpC11 * $rpCyy))"
  private val rpR2y = s"($rpC2y / sqrt($rpC22 * $rpCyy))"
  private val rpDet =
    s"((1 + lambda) * (1 + lambda) - $rpR12 * $rpR12)"
  private val rpB1 = s"(((1 + lambda) * $rpR1y - $rpR12 * $rpR2y) / $rpDet)"
  private val rpB2 = s"(((1 + lambda) * $rpR2y - $rpR12 * $rpR1y) / $rpDet)"
  // Per-row standardized coords (population sd), prediction, hat diag:
  private val rpZ1 = s"((x1 - CAST(s1 AS DOUBLE) / n) / sqrt($rpC11 / n))"
  private val rpZ2 = s"((x2 - CAST(s2 AS DOUBLE) / n) / sqrt($rpC22 / n))"
  private val rpYhat =
    s"(CAST(sy AS DOUBLE) / n + sqrt($rpCyy / n) * ($rpB1 * $rpZ1 + $rpB2 * $rpZ2))"
  private val rpHat =
    s"(1.0 / n + ((1 + lambda) * $rpZ1 * $rpZ1" +
    s" - 2 * $rpR12 * $rpZ1 * $rpZ2" +
    s" + (1 + lambda) * $rpZ2 * $rpZ2) / ($rpDet * n))"
  private val rpDel = s"((y - $rpYhat) / (1.0 - $rpHat))"
  // Whole-dollar² quantization of each squared residual before the sum.
  private val rpSqDel = s"CAST(floor($rpDel * $rpDel + 0.5) AS BIGINT)"
  private val rpSqIn =
    s"CAST(floor((y - $rpYhat) * (y - $rpYhat) + 0.5) AS BIGINT)"

  /** M173: RIDGE PRESS — for λ ∈ {0, 0.1, 1} on the m168 system
    * (order dollars ~ line count + total quantity, correlation form),
    * score each penalty with the exact leave-one-out identity:
    * PRESS(λ) = Σ(eᵢ/(1−hᵢ(λ)))², hᵢ from the closed 2×2 ridge hat.
    * Readout per λ: in-sample RMSE and LOOCV RMSE — the λ that
    * minimizes the latter is the principled pick, no n refits.
    *
    * Scale shape: one exact moment agg (broadcast), then a single
    * fact pass evaluating the shared closed forms per (row, λ) and
    * hash-aggregating the quantized squares — 3λ × rows, map-side
    * combinable, nothing iterative.
    */
  val m173RidgePress: Q = (s, d) => {
    val rows = lineitem(s, d)
      .select(col("l_orderkey"),
        col("l_quantity").cast("long").as("lq"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("x1"), sum("lq").as("x2"),
        expr("CAST(sum(cents) AS BIGINT) div 100").as("y"))
    val m = rows.agg(
      count(lit(1)).as("n"),
      sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
      sum(expr("x1 * x1")).as("s11"), sum(expr("x2 * x2")).as("s22"),
      sum(expr("x1 * x2")).as("s12"),
      sum(expr("x1 * y")).as("s1y"), sum(expr("x2 * y")).as("s2y"),
      sum(expr("y * y")).as("syy"))
    val lam = s.range(1).select(explode(array(
      lit(0.0), lit(0.1), lit(1.0))).as("lambda"))
    rows.crossJoin(broadcast(m)).crossJoin(broadcast(lam))
      .select(col("lambda"), col("n"),
        expr(rpSqDel).as("sq_del"), expr(rpSqIn).as("sq_in"))
      .groupBy("lambda", "n")
      .agg(sum("sq_del").as("press"), sum("sq_in").as("sse"))
      .select(col("lambda"),
        r4(expr("sqrt(CAST(press AS DOUBLE) / n)")).as("rmse_loocv"),
        r4(expr("sqrt(CAST(sse AS DOUBLE) / n)")).as("rmse_in"))
      .orderBy("lambda")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m172_weibull_fit" -> m172WeibullFit,
    "m173_ridge_press" -> m173RidgePress)

  val oracleSql: Map[String, String] = Map(
    "m172_weibull_fit" ->
      s"""WITH ages AS (
         |  SELECT greatest(ls - od, 0) + 1 AS t FROM (
         |    SELECT l_orderkey,
         |      CAST(max(epoch_us(l_shipdate) // 86400000000) AS BIGINT) AS ls
         |    FROM lineitem GROUP BY 1) li
         |  JOIN (SELECT o_orderkey,
         |      CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS od
         |    FROM orders) o ON li.l_orderkey = o.o_orderkey),
         |by_t AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS c FROM ages GROUP BY 1),
         |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM by_t),
         |pts AS (
         |  SELECT ${q4(wbX)} AS xq, ${q4(wbY)} AS yq FROM (
         |    SELECT t, CAST(sum(c) OVER (ORDER BY t) AS BIGINT) AS cum, n
         |    FROM by_t CROSS JOIN nn)),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(xq) AS BIGINT) AS sxq, CAST(sum(yq) AS BIGINT) AS syq,
         |    CAST(sum(xq * xq) AS BIGINT) AS sxxq,
         |    CAST(sum(xq * yq) AS BIGINT) AS sxyq,
         |    CAST(sum(yq * yq) AS BIGINT) AS syyq
         |  FROM pts)
         |SELECT k, round($wbSlope, 4) AS shape,
         |  round(exp(-($wbIntercept) / $wbSlope), 4) AS scale_days,
         |  round(
         |    (k * CAST(sxyq AS DOUBLE) - CAST(sxq AS DOUBLE) * syq) *
         |    (k * CAST(sxyq AS DOUBLE) - CAST(sxq AS DOUBLE) * syq) /
         |    ((k * CAST(sxxq AS DOUBLE) - CAST(sxq AS DOUBLE) * sxq) *
         |     (k * CAST(syyq AS DOUBLE) - CAST(syq AS DOUBLE) * syq)), 4)
         |    AS r2
         |FROM agg""".stripMargin,
    "m173_ridge_press" ->
      s"""WITH per_order AS (
         |  SELECT CAST(count(*) AS BIGINT) AS x1,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2,
         |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
         |      AS BIGINT) // 100 AS y
         |  FROM lineitem GROUP BY l_orderkey),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
         |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
         |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
         |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
         |    CAST(sum(x2 * y) AS BIGINT) AS s2y,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM per_order),
         |lam AS (SELECT unnest([0e0, 0.1e0, 1e0]) AS lambda),
         |terms AS (
         |  SELECT lambda, n, $rpSqDel AS sq_del, $rpSqIn AS sq_in
         |  FROM per_order CROSS JOIN m CROSS JOIN lam),
         |agg AS (
         |  SELECT lambda, n, CAST(sum(sq_del) AS BIGINT) AS press,
         |    CAST(sum(sq_in) AS BIGINT) AS sse
         |  FROM terms GROUP BY 1, 2)
         |SELECT lambda,
         |  round(sqrt(CAST(press AS DOUBLE) / n), 4) AS rmse_loocv,
         |  round(sqrt(CAST(sse AS DOUBLE) / n), 4) AS rmse_in
         |FROM agg ORDER BY lambda""".stripMargin)
}
