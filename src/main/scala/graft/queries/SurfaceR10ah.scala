package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 34: proportion inference closers — the
  * Wilson score interval (the CI a conversion rate should actually
  * ship with; the normal approximation misbehaves near 0/1 and at
  * small n) and Fleiss' kappa (chance-corrected agreement for MORE
  * than two raters — m76's Cohen kappa only handles pairs).
  *
  * Float discipline per SurfaceR10l.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13 (statistics).
  */
object SurfaceR10ah extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M110: Wilson score interval ----

  private val phatSql = "(CAST(conv AS DOUBLE) / n)"
  private val wilsonMidSql =
    s"(($phatSql + 3.8416 / (2.0 * n)) / (1.0 + 3.8416 / n))"
  private val wilsonHalfSql =
    s"((1.96 * sqrt($phatSql * (1.0 - $phatSql) / n + 3.8416 / (4.0 * CAST(n AS DOUBLE) * n))) / (1.0 + 3.8416 / n))"

  /** M110: WILSON INTERVAL — 95% score interval for the finalized-rate
    * per priority group (z=1.96, z²=3.8416 written as literals so both
    * engines run identical constants). Unlike the Wald interval, the
    * bounds stay inside [0,1] and behave at small n — the right CI for
    * every conversion-rate tile on a dashboard. Exact integer counts,
    * one shared closed form. */
  val m110WilsonCi: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", 1)).as("conv"))
      .select(col("grp"), col("n"), col("conv"),
        r4(expr(phatSql)).as("rate"),
        r4(expr(s"($wilsonMidSql - $wilsonHalfSql)")).as("ci_lo"),
        r4(expr(s"($wilsonMidSql + $wilsonHalfSql)")).as("ci_hi"))
      .orderBy("grp")

  // ---- M112: Fleiss' kappa ----

  private val fleissPbarSql =
    "((CAST(sq_sum AS DOUBLE) - 3.0 * nn) / (6.0 * nn))"
  private val fleissPeSql =
    "((CAST(hi_tot AS DOUBLE) / (3.0 * nn)) * (hi_tot / (3.0 * nn)) + " +
      "((3.0 * nn - hi_tot) / (3.0 * nn)) * ((3.0 * nn - hi_tot) / (3.0 * nn)))"

  /** M112: FLEISS' KAPPA — agreement among THREE deterministic raters
    * (priority rule, price rule, recency rule) labeling every order
    * hi/lo: per-item agreement Pᵢ = (Σnᵢⱼ²−r)/(r(r−1)) with r=3,
    * chance agreement from the pooled category shares. This is the
    * statistic for multi-annotator labeling QA — Cohen's kappa (m76)
    * cannot aggregate a 3-judge panel. The per-item category count is
    * integer (0–3 hi votes), so Σnᵢⱼ² is exact; one aggregate. */
  val m112FleissKappa: Q = (s, d) =>
    orders(s, d)
      .select((
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L) +
        when(col("o_totalprice") > 150000.0, 1L).otherwise(0L) +
        when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("n_hi"))
      .agg(count(lit(1)).as("nn"), sum("n_hi").as("hi_tot"),
        sum(expr("n_hi * n_hi + (3 - n_hi) * (3 - n_hi)")).as("sq_sum"))
      .select(col("nn").as("n_items"), col("hi_tot"),
        r4(expr(fleissPbarSql)).as("p_bar"),
        r4(expr(fleissPeSql)).as("p_e"),
        r4(expr(s"(($fleissPbarSql - $fleissPeSql) / (1.0 - $fleissPeSql))"))
          .as("kappa"))

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m110_wilson_ci" -> m110WilsonCi,
    "m112_fleiss_kappa" -> m112FleissKappa)

  val oracleSql: Map[String, String] = Map(
    "m110_wilson_ci" ->
      s"""WITH agg AS (
        |  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
        |      AS conv
        |  FROM orders GROUP BY 1)
        |SELECT grp, n, conv,
        |  round($phatSql, 4) AS rate,
        |  round(($wilsonMidSql - $wilsonHalfSql), 4) AS ci_lo,
        |  round(($wilsonMidSql + $wilsonHalfSql), 4) AS ci_hi
        |FROM agg ORDER BY grp""".stripMargin,
    "m112_fleiss_kappa" ->
      s"""WITH votes AS (
        |  SELECT
        |    (CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END +
        |     CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END +
        |     CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END)
        |      AS n_hi
        |  FROM orders),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nn,
        |    CAST(sum(n_hi) AS BIGINT) AS hi_tot,
        |    CAST(sum(n_hi * n_hi + (3 - n_hi) * (3 - n_hi)) AS BIGINT) AS sq_sum
        |  FROM votes)
        |SELECT nn AS n_items, hi_tot,
        |  round($fleissPbarSql, 4) AS p_bar,
        |  round($fleissPeSql, 4) AS p_e,
        |  round((($fleissPbarSql - $fleissPeSql) / (1.0 - $fleissPeSql)), 4)
        |    AS kappa
        |FROM agg""".stripMargin)
}
