package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 60: the two classical survival-analysis
  * siblings m71's Kaplan–Meier curve was missing — the LOG-RANK test
  * (do two arms have the same survival function? THE standard
  * comparison behind every clinical/churn A-B readout) and the
  * NELSON–AALEN cumulative-hazard estimator (the integrated risk
  * curve, more stable than −ln(KM) in small samples). Same duration
  * convention as m71: dur = days from order date to the fixture
  * horizon, event = finalized status. All at-risk/event counts are
  * exact integers off cumulative windows over the bounded
  * distinct-duration table; the float accumulations (E₁, V, H(t)) are
  * ORDERED window cumsums — addition order is pinned by the window on
  * both engines, so even the doubles are bit-reproducible.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (statistics), sibling m71/m69/m114.
  */
object SurfaceR10bh {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val lrChi2 = "((o1 - e1) * (o1 - e1) / v)"
  /** Two-sided normal tail via the shared logistic-Φ closed form
    * (m125 precedent — neither engine has erf; stated approximation). */
  private val lrP = s"(2.0 / (1.0 + exp(1.702 * sqrt($lrChi2))))"

  /** M143: LOG-RANK TEST — urgent arm (priorities 1/2) vs the rest.
    * Per pooled event time: d (deaths), d1 (arm-1 deaths), n, n1 (at
    * risk) — exact integers from two bounded cumulative windows; then
    * E₁ = Σ d·n1/n and V = Σ d·(n1/n)(1−n1/n)(n−d)/(n−1) as ordered
    * cumsums (terms ≥ 0, so their running max IS the total — order
    * pinned). χ² = (O₁−E₁)²/V on 1 df. */
  val m143LogRank: Q = (s, d) => {
    val base = orders(s, d).select(
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("g1"))
    val perT = base.groupBy("dur").agg(
      sum("ev").as("d"),
      sum(col("ev") * col("g1")).as("d1"),
      count(lit(1)).as("c"),
      sum("g1").as("c1"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key)
    val wCum = Windows.bounded(col("dur"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val risks = perT
      .withColumn("n_tot", sum("c").over(wAll))
      .withColumn("n1_tot", sum("c1").over(wAll))
      .withColumn("n", col("n_tot") - (sum("c").over(wCum) - col("c")))
      .withColumn("n1", col("n1_tot") - (sum("c1").over(wCum) - col("c1")))
      .where(col("d") > 0 && col("n") > 1)
      .withColumn("e1t",
        expr("CAST(d AS DOUBLE) * n1 / n"))
      .withColumn("vt",
        expr("CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n) * (1.0 - CAST(n1 AS DOUBLE) / n) * (n - d) / (n - 1)"))
    val wCum2 = Windows.bounded(col("dur"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    risks
      .withColumn("cum_e1", sum("e1t").over(wCum2))
      .withColumn("cum_v", sum("vt").over(wCum2))
      .agg(count(lit(1)).as("n_times"),
        sum("d1").as("o1"),
        max("cum_e1").as("e1"),
        max("cum_v").as("v"))
      .select(col("n_times"), col("o1"),
        r4(col("e1")).as("e1"),
        r4(col("v")).as("v"),
        r4(expr(lrChi2)).as("chi2"),
        r4(expr(lrP)).as("p_approx"))
  }

  /** M144: NELSON–AALEN — pooled cumulative hazard H(t) = Σ_{s≤t} d/n
    * and its variance Σ d/n², reported at every event time with
    * survivors remaining. Exact integer d and n; the two hazard
    * accumulations are ordered window cumsums (order-pinned floats). */
  val m144NelsonAalen: Q = (s, d) => {
    val base = orders(s, d).select(
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"))
    val perT = base.groupBy("dur").agg(
      sum("ev").as("d"), count(lit(1)).as("c"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key)
    val wCum = Windows.bounded(col("dur"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val risks = perT
      .withColumn("n_tot", sum("c").over(wAll))
      .withColumn("n", col("n_tot") - (sum("c").over(wCum) - col("c")))
      .where(col("d") > 0 && col("d") < col("n"))
      .withColumn("ht", expr("CAST(d AS DOUBLE) / n"))
      .withColumn("vt", expr("CAST(d AS DOUBLE) / n / n"))
    val wCum2 = Windows.bounded(col("dur"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    risks
      .withColumn("cumhaz", sum("ht").over(wCum2))
      .withColumn("cumvar", sum("vt").over(wCum2))
      .select(col("dur"), col("d"), col("n"),
        r4(col("cumhaz")).as("cumhaz"),
        r4(col("cumvar")).as("cumvar"))
      .orderBy("dur")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m143_logrank" -> m143LogRank,
    "m144_nelson_aalen" -> m144NelsonAalen)

  private val baseSql =
    """SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
      |    DATE '1998-12-31') AS BIGINT) AS dur,
      |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
      |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS g1
      |FROM orders""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "m143_logrank" ->
      s"""WITH base AS ($baseSql),
        |per_t AS (
        |  SELECT dur, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(ev * g1) AS BIGINT) AS d1,
        |    CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(g1) AS BIGINT) AS c1
        |  FROM base GROUP BY dur),
        |risks AS (
        |  SELECT dur, d, d1,
        |    CAST(sum(c) OVER () - (sum(c) OVER (ORDER BY dur
        |      ROWS UNBOUNDED PRECEDING) - c) AS BIGINT) AS n,
        |    CAST(sum(c1) OVER () - (sum(c1) OVER (ORDER BY dur
        |      ROWS UNBOUNDED PRECEDING) - c1) AS BIGINT) AS n1
        |  FROM per_t),
        |ev AS (
        |  SELECT dur, d, d1, n, n1,
        |    CAST(d AS DOUBLE) * n1 / n AS e1t,
        |    CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n) * (1.0 - CAST(n1 AS DOUBLE) / n) * (n - d) / (n - 1) AS vt
        |  FROM risks WHERE d > 0 AND n > 1),
        |cum AS (
        |  SELECT dur, d1,
        |    sum(e1t) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS cum_e1,
        |    sum(vt) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS cum_v
        |  FROM ev),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_times,
        |    CAST(sum(d1) AS BIGINT) AS o1,
        |    max(cum_e1) AS e1x, max(cum_v) AS vx
        |  FROM cum)
        |SELECT n_times, o1, round(e1x, 4) AS e1, round(vx, 4) AS v,
        |  round((o1 - e1x) * (o1 - e1x) / vx, 4) AS chi2,
        |  round(2.0 / (1.0 + exp(1.702 * sqrt((o1 - e1x) * (o1 - e1x) / vx))), 4) AS p_approx
        |FROM agg""".stripMargin,
    "m144_nelson_aalen" ->
      s"""WITH base AS ($baseSql),
        |per_t AS (
        |  SELECT dur, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY dur),
        |risks AS (
        |  SELECT dur, d,
        |    CAST(sum(c) OVER () - (sum(c) OVER (ORDER BY dur
        |      ROWS UNBOUNDED PRECEDING) - c) AS BIGINT) AS n
        |  FROM per_t),
        |ev AS (
        |  SELECT dur, d, n,
        |    CAST(d AS DOUBLE) / n AS ht,
        |    CAST(d AS DOUBLE) / n / n AS vt
        |  FROM risks WHERE d > 0 AND d < n)
        |SELECT dur, d, n,
        |  round(sum(ht) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING), 4) AS cumhaz,
        |  round(sum(vt) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING), 4) AS cumvar
        |FROM ev
        |ORDER BY dur""".stripMargin)
}
