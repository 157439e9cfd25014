package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 58: modern dependence + classical normality
  * testing on the daily order series — Chatterjee's ξ (2020), the
  * rank-based coefficient that detects ARBITRARY functional dependence
  * (not just monotone like Spearman/Kendall), and the Jarque–Bera
  * moment test (is the series plausibly Gaussian?). Both run off the
  * bounded daily aggregate (#days rows, not data-scaling): one
  * fact-table hash aggregate, then rank/lag windows and power sums
  * whose internals are EXACT integers — only the final ratios touch
  * doubles, through ONE formula text shared with the oracle.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13 (statistics over aggregates), siblings m121/lt37.
  */
object SurfaceR10bf {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M141: Chatterjee's xi ----

  /** Tie-aware ξ: 1 − n·Σ|r_{i+1}−r_i| / (2·Σ l_i(n−l_i)), with
    * r_i = #{y_j ≤ y_i}, l_i = #{y_j ≥ y_i}, i ordered by day. */
  private val xiF = "(1.0 - CAST(nd AS DOUBLE) * sum_d / den)"

  /** M141: CHATTERJEE XI — dependence of the daily order count on the
    * day index. Ranks via ties-inclusive RANGE count windows (exact
    * integers), the numerator off one lag window, the denominator an
    * exact integer sum — all over the bounded daily series. */
  val m141ChatterjeeXi: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    // Default window frame with ORDER BY is RANGE UNBOUNDED PRECEDING →
    // CURRENT ROW, which is ties-INCLUSIVE: exactly #{y_j <= y_i}.
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key)
    val ranked = daily
      .withColumn("r", count(lit(1)).over(Windows.bounded(col("y"))))
      .withColumn("l", count(lit(1)).over(Windows.bounded(col("y").desc)))
      .withColumn("ndr", count(lit(1)).over(wAll))
    ranked
      .withColumn("rn", lead(col("r"), 1).over(Windows.bounded(col("t"))))
      .agg(
        count(lit(1)).as("nd"),
        sum(when(col("rn").isNotNull, abs(col("rn") - col("r")))
          .otherwise(0L)).as("sum_d"),
        sum(col("l") * (col("ndr") - col("l"))).as("den_half"))
      .select(col("nd"), col("sum_d"),
        (col("den_half") * 2L).as("den"))
      .select(col("nd"), col("sum_d"), col("den"),
        r4(expr(xiF)).as("xi"))
  }

  // ---- M142: Jarque–Bera ----

  private val jbMu = "(CAST(s1 AS DOUBLE) / nd)"
  private val jbM2 = s"(CAST(s2 AS DOUBLE) / nd - $jbMu * $jbMu)"
  private val jbM3 =
    s"(CAST(s3 AS DOUBLE) / nd - 3.0 * $jbMu * (CAST(s2 AS DOUBLE) / nd) + 2.0 * $jbMu * $jbMu * $jbMu)"
  private val jbM4 =
    s"(CAST(s4 AS DOUBLE) / nd - 4.0 * $jbMu * (CAST(s3 AS DOUBLE) / nd) + 6.0 * $jbMu * $jbMu * (CAST(s2 AS DOUBLE) / nd) - 3.0 * $jbMu * $jbMu * $jbMu * $jbMu)"
  private val jbS = s"($jbM3 / ($jbM2 * sqrt($jbM2)))"
  private val jbK = s"($jbM4 / ($jbM2 * $jbM2))"
  private val jbStat =
    s"(CAST(nd AS DOUBLE) / 6.0 * ($jbS * $jbS + ($jbK - 3.0) * ($jbK - 3.0) / 4.0))"
  /** χ²(2) survival is the exact closed form e^{−x/2} — no erf needed. */
  private val jbP = s"(exp(-$jbStat / 2.0))"

  /** M142: JARQUE–BERA — skewness/kurtosis normality test of the daily
    * order count. The four power sums are exact BIGINTs (y ≤ ~10³ per
    * day, #days ~10³, so Σy⁴ ≪ 2⁶³); skew, kurtosis, the JB statistic
    * and its exact χ²(2) p-value all come from one shared formula. */
  val m142JarqueBera: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    daily.agg(
      count(lit(1)).as("nd"),
      sum(col("y")).as("s1"),
      sum(col("y") * col("y")).as("s2"),
      sum(col("y") * col("y") * col("y")).as("s3"),
      sum(col("y") * col("y") * col("y") * col("y")).as("s4"))
      .select(col("nd"),
        r4(expr(jbS)).as("skew"),
        r4(expr(jbK)).as("kurt"),
        r4(expr(jbStat)).as("jb"),
        r4(expr(jbP)).as("p_value"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m141_chatterjee_xi" -> m141ChatterjeeXi,
    "m142_jarque_bera" -> m142JarqueBera)

  private val dailySql =
    """SELECT CAST(date_diff('day', DATE '1992-01-01',
      |    CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
      |  CAST(count(*) AS BIGINT) AS y
      |FROM orders GROUP BY 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "m141_chatterjee_xi" ->
      s"""WITH daily AS ($dailySql),
        |ranked AS (
        |  SELECT t, y,
        |    CAST(count(*) OVER (ORDER BY y) AS BIGINT) AS r,
        |    CAST(count(*) OVER (ORDER BY y DESC) AS BIGINT) AS l,
        |    CAST(count(*) OVER () AS BIGINT) AS nd
        |  FROM daily),
        |stepped AS (
        |  SELECT *, lead(r, 1) OVER (ORDER BY t) AS rn FROM ranked),
        |agg AS (
        |  SELECT CAST(max(nd) AS BIGINT) AS nd,
        |    CAST(sum(CASE WHEN rn IS NOT NULL THEN abs(rn - r) ELSE 0 END) AS BIGINT) AS sum_d,
        |    CAST(2 * sum(l * (nd - l)) AS BIGINT) AS den
        |  FROM stepped)
        |SELECT nd, sum_d, den, round($xiF, 4) AS xi FROM agg""".stripMargin,
    "m142_jarque_bera" ->
      s"""WITH daily AS ($dailySql),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(y) AS BIGINT) AS s1,
        |    CAST(sum(y * y) AS BIGINT) AS s2,
        |    CAST(sum(y * y * y) AS BIGINT) AS s3,
        |    CAST(sum(y * y * y * y) AS BIGINT) AS s4
        |  FROM daily)
        |SELECT nd,
        |  round($jbS, 4) AS skew,
        |  round($jbK, 4) AS kurt,
        |  round($jbStat, 4) AS jb,
        |  round($jbP, 4) AS p_value
        |FROM sums""".stripMargin)
}
