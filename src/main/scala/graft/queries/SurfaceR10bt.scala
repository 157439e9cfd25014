package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.PrefixSum

/** Round-10 surface batch 72: ranking uncertainty — the
  * HANLEY–McNEIL CONFIDENCE INTERVAL for ROC-AUC (m32 reports the
  * point estimate; this adds the SE and 95% CI every model-eval
  * report actually ships). The AUC inherits m32's exact tie-handled
  * Mann–Whitney pipeline (PrefixSum cumulative counts — no
  * fact-table ranking); Q1/Q2 and the CI are one shared closed form
  * on top.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (evaluation), sibling m32.
  */
object SurfaceR10bt extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M156: AUC with Hanley–McNeil CI ----

  private val hmA =
    "((CAST(s2 AS DOUBLE) - CAST(npos AS DOUBLE) * (npos + 1)) / (2e0 * npos * nneg))"
  private val hmQ1 = s"($hmA / (2e0 - $hmA))"
  private val hmQ2 = s"(2e0 * $hmA * $hmA / (1e0 + $hmA))"
  private val hmSe =
    s"sqrt(($hmA * (1e0 - $hmA) + (npos - 1) * ($hmQ1 - $hmA * $hmA) + (nneg - 1) * ($hmQ2 - $hmA * $hmA)) / (CAST(npos AS DOUBLE) * nneg))"

  /** M156: AUC ± HANLEY–McNEIL — the m32 exact U-statistic AUC of
    * `value` scoring purchases, plus its analytic SE and the 95%
    * normal CI. Integer to the last division; SE/CI one shared
    * formula. */
  val m156AucCi: Q = (s, d) => {
    val e = events(s, d).select(col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val byV = e.groupBy("value")
      .agg(count(lit(1)).as("nv"), sum("y").as("posv"))
    val terms = PrefixSum
      .withRunningTotal(byV, Seq("value"), "nv", numPartitions = 16,
        outCol = "cumincl")
      .withColumn("cumprev", col("cumincl") - col("nv"))
      .select(
        (col("posv") * (lit(2L) * col("cumprev") + col("nv") + 1L)).as("t"),
        col("posv"), col("nv"))
    terms.agg(
      sum("t").as("s2"), sum("posv").as("npos"),
      (sum("nv") - sum("posv")).as("nneg"))
      .select(col("npos"), col("nneg"),
        r4(expr(hmA)).as("auc"),
        r4(expr(hmSe)).as("se"),
        r4(expr(s"$hmA - 196e-2 * $hmSe")).as("ci_lo"),
        r4(expr(s"$hmA + 196e-2 * $hmSe")).as("ci_hi"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m156_auc_ci" -> m156AucCi)

  val oracleSql: Map[String, String] = Map(
    "m156_auc_ci" ->
      s"""WITH byv AS (
        |  SELECT value, CAST(count(*) AS BIGINT) AS nv,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS posv
        |  FROM events GROUP BY value),
        |cums AS (
        |  SELECT posv, nv,
        |    CAST(sum(nv) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |      - nv AS BIGINT) AS cumprev
        |  FROM byv),
        |sums AS (
        |  SELECT
        |    CAST(sum(posv * (2 * cumprev + nv + 1)) AS BIGINT) AS s2,
        |    CAST(sum(posv) AS BIGINT) AS npos,
        |    CAST(sum(nv) - sum(posv) AS BIGINT) AS nneg
        |  FROM cums)
        |SELECT npos, nneg,
        |  round($hmA, 4) AS auc,
        |  round($hmSe, 4) AS se,
        |  round($hmA - 196e-2 * $hmSe, 4) AS ci_lo,
        |  round($hmA + 196e-2 * $hmSe, 4) AS ci_hi
        |FROM sums""".stripMargin)
}
