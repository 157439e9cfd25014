package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 63: method-comparison statistics — DEMING
  * (orthogonal) regression and the BLAND–ALTMAN agreement analysis,
  * run on the two per-line "measurements" of item value the fixtures
  * carry: gross extended price vs the net (discounted) price — two
  * billing measures of the same line. OLS (m5/m121) assumes x is
  * noiseless; when BOTH sides carry error (two sensors, two
  * pipelines, two annotators) Deming's errors-in-both-variables slope
  * and Bland–Altman's limits of agreement are the standard answers.
  * Both reduce to closed forms over exact integer dollar sums (cents
  * quantized per row, then integer-divided to dollars — the m134
  * overflow discipline), gathered in ONE narrow scan + hash-agg pass
  * over lineitem.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (statistics), siblings m5/m121/m134.
  */
object SurfaceR10bk extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Paired per-line dollar measurements: gross vs net (discounted). */
  private[queries] def paired(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) DIV 100")
        .as("x"),
      expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) DIV 100")
        .as("y"))

  // ---- M148: Deming regression ----

  private val dmSxx = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)"
  private val dmSyy = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)"
  private val dmSxy = "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)"
  private val dmSlope =
    s"(($dmSyy - $dmSxx + sqrt(($dmSyy - $dmSxx) * ($dmSyy - $dmSxx) + 4.0 * $dmSxy * $dmSxy)) / (2.0 * $dmSxy))"
  private val dmIntercept =
    s"((CAST(sy AS DOUBLE) - $dmSlope * sx) / n)"

  /** M148: DEMING REGRESSION — errors-in-both-variables fit with
    * error-variance ratio λ=1 (orthogonal regression): β = (S_yy −
    * S_xx + √((S_yy−S_xx)² + 4S_xy²)) / (2S_xy). All six sums are
    * exact BIGINTs in whole dollars; one shared closed form. */
  val m148Deming: Q = (s, d) =>
    paired(s, d).agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("x * x")).as("sxx"),
      sum(expr("y * y")).as("syy"),
      sum(expr("x * y")).as("sxy"))
      .select(col("n"),
        r4(expr(dmSlope)).as("slope"),
        r4(expr(dmIntercept)).as("intercept"),
        r4(expr(s"$dmSxy / sqrt($dmSxx * $dmSyy)")).as("pearson_r"))

  // ---- M149: Bland–Altman ----

  private val baMean = "(CAST(sd1 AS DOUBLE) / n)"
  private val baSd =
    "sqrt((CAST(sd2 AS DOUBLE) - CAST(sd1 AS DOUBLE) * sd1 / n) / (n - 1))"
  private val baLo = s"($baMean - 1.96 * $baSd)"
  private val baHi = s"($baMean + 1.96 * $baSd)"

  /** M149: BLAND–ALTMAN — per-order difference d = x − y in exact
    * dollars; mean bias, SD, the 95% limits of agreement, and the
    * exact count of orders outside the limits (the bound is one
    * shared float formula applied to integer differences, so the
    * comparison is bit-deterministic). Two passes: one agg for the
    * bounds, one broadcast-scalar recount — the plan that scales. */
  val m149BlandAltman: Q = (s, d) => {
    val p = paired(s, d).withColumn("diff", col("x") - col("y"))
    val sums = p.agg(
      count(lit(1)).as("n"),
      sum("diff").as("sd1"),
      sum(expr("diff * diff")).as("sd2"))
    p.crossJoin(broadcast(sums))
      .groupBy("n", "sd1", "sd2")
      .agg(sum(when(expr(s"diff < $baLo OR diff > $baHi"), 1L)
        .otherwise(0L)).as("n_outside"))
      .select(col("n"),
        r4(expr(baMean)).as("bias"),
        r4(expr(baSd)).as("sd_diff"),
        r4(expr(baLo)).as("loa_lo"),
        r4(expr(baHi)).as("loa_hi"),
        col("n_outside"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m148_deming" -> m148Deming,
    "m149_bland_altman" -> m149BlandAltman)

  private val pairedSql =
    """SELECT
      |  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100 AS x,
      |  CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) // 100 AS y
      |FROM lineitem""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "m148_deming" ->
      s"""WITH paired AS ($pairedSql),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM paired)
        |SELECT n,
        |  round($dmSlope, 4) AS slope,
        |  round($dmIntercept, 4) AS intercept,
        |  round($dmSxy / sqrt($dmSxx * $dmSyy), 4) AS pearson_r
        |FROM sums""".stripMargin,
    "m149_bland_altman" ->
      s"""WITH paired AS ($pairedSql),
        |diffs AS (SELECT x - y AS diff FROM paired),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(diff) AS BIGINT) AS sd1,
        |    CAST(sum(diff * diff) AS BIGINT) AS sd2
        |  FROM diffs),
        |outside AS (
        |  SELECT CAST(sum(CASE WHEN diff < $baLo OR diff > $baHi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
        |  FROM diffs CROSS JOIN sums)
        |SELECT n,
        |  round($baMean, 4) AS bias,
        |  round($baSd, 4) AS sd_diff,
        |  round($baLo, 4) AS loa_lo,
        |  round($baHi, 4) AS loa_hi,
        |  n_outside
        |FROM sums CROSS JOIN outside""".stripMargin)
}
