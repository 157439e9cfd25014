package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 77: ordered alternatives + aggregation
  * honesty — the JONCKHEERE–TERPSTRA test (do order values trend
  * MONOTONICALLY across the five ordered priorities? Kruskal–Wallis
  * (m152) only asks "any difference"; JT exploits the ordering for
  * power) and a SIMPSON'S PARADOX AUDIT (does the pooled trend
  * direction survive stratification? — the aggregation-reversal check
  * every dashboard metric should ship with). JT's pairwise
  * Mann–Whitney counts come from cross-joins of BOUNDED kilodollar
  * value grids (ties counted exactly via the ×2 trick); the audit
  * compares closed-form OLS slope signs, pooled vs per-stratum, from
  * exact integer sums.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (statistics), siblings m47/m152/m121.
  */
object SurfaceR10by extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M162: Jonckheere–Terpstra ----

  /** M162: JONCKHEERE–TERPSTRA — kilodollar order values, groups
    * ordered by priority rank. 2J = Σ_{i<j} (2·#{a<b} + #{a=b}) over
    * all cross pairs, exact via the per-group value-grid cross joins
    * (grids are kilodollar-bounded, never order×order); the normal
    * approximation z uses the no-tie null moments (stated approx —
    * the exact integer 2J is the auditable part). */
  val m162Jonckheere: Q = (s, d) => {
    val vals = orders(s, d)
      .select(
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
        expr("CAST(floor(o_totalprice / 1000) AS BIGINT)").as("v"))
    val grid = vals.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val cross = grid.as("a").join(grid.as("b"), col("b.g") > col("a.g"))
    val sums = cross.agg(
      sum(when(col("a.v") < col("b.v"), lit(2L) * col("a.c") * col("b.c"))
        .when(col("a.v") === col("b.v"), col("a.c") * col("b.c"))
        .otherwise(0L)).as("j2"))
    val ns = vals.groupBy("g").agg(count(lit(1)).as("ng"))
      .agg(sum("ng").as("n"), sum(col("ng") * col("ng")).as("sn2"),
        sum(col("ng") * col("ng") * (lit(2L) * col("ng") + 3L)).as("sn23"))
    sums.crossJoin(broadcast(ns))
      .select(col("j2"), col("n"),
        r4(expr("(CAST(n AS DOUBLE) * n - sn2) / 4e0")).as("mu_j"),
        r4(expr(
          "(CAST(j2 AS DOUBLE) / 2e0 - (CAST(n AS DOUBLE) * n - sn2) / 4e0) / " +
            "sqrt((CAST(n AS DOUBLE) * n * (2e0 * n + 3e0) - sn23) / 72e0)"))
          .as("z_approx"))
  }

  // ---- M163: Simpson's paradox audit ----

  private def slope(p: String) =
    s"((n$p * CAST(sty$p AS DOUBLE) - CAST(st$p AS DOUBLE) * sy$p) / " +
      s"(n$p * CAST(stt$p AS DOUBLE) - CAST(st$p AS DOUBLE) * st$p))"

  /** M163: SIMPSON AUDIT — pooled daily-volume trend slope vs the
    * same slope within each priority stratum (daily per-priority
    * counts). Reports the pooled slope, how many strata trend the
    * OPPOSITE way, and the reversal flag. All slopes are closed
    * forms over exact integer sums; sign comparison is exact. */
  val m163SimpsonAudit: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"),
        col("o_orderpriority").as("grp"))
      .groupBy("t", "grp").agg(count(lit(1)).as("y"))
    val strata = daily.groupBy("grp").agg(
      count(lit(1)).as("ns"), sum("t").as("sts"), sum("y").as("sys"),
      sum(expr("t * t")).as("stts"), sum(expr("t * y")).as("stys"))
      .withColumn("slope_s", expr(
        "(ns * CAST(stys AS DOUBLE) - CAST(sts AS DOUBLE) * sys) / " +
          "(ns * CAST(stts AS DOUBLE) - CAST(sts AS DOUBLE) * sts)"))
    val pooledDaily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    val pooled = pooledDaily.agg(
      count(lit(1)).as("n0"), sum("t").as("st0"), sum("y").as("sy0"),
      sum(expr("t * t")).as("stt0"), sum(expr("t * y")).as("sty0"))
      .withColumn("slope_p", expr(slope("0")))
    strata.crossJoin(broadcast(pooled))
      .agg(
        max("slope_p").as("pooled_slope_raw"),
        count(lit(1)).as("n_strata"),
        sum(when((col("slope_s") > 0) =!= (col("slope_p") > 0), 1L)
          .otherwise(0L)).as("n_opposite"))
      .select(
        r4(col("pooled_slope_raw")).as("pooled_slope"),
        col("n_strata"), col("n_opposite"),
        expr("CAST(CASE WHEN n_opposite > 0 THEN 1 ELSE 0 END AS BIGINT)")
          .as("reversal_flag"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m162_jonckheere" -> m162Jonckheere,
    "m163_simpson_audit" -> m163SimpsonAudit)

  val oracleSql: Map[String, String] = Map(
    "m162_jonckheere" ->
      """WITH vals AS (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |    CAST(floor(o_totalprice / 1000) AS BIGINT) AS v
        |  FROM orders),
        |grid AS (
        |  SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2),
        |j2t AS (
        |  SELECT CAST(sum(CASE WHEN a.v < b.v THEN 2 * a.c * b.c
        |    WHEN a.v = b.v THEN a.c * b.c ELSE 0 END) AS BIGINT) AS j2
        |  FROM grid a JOIN grid b ON b.g > a.g),
        |ns AS (
        |  SELECT CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(ng * ng) AS BIGINT) AS sn2,
        |    CAST(sum(ng * ng * (2 * ng + 3)) AS BIGINT) AS sn23
        |  FROM (SELECT g, CAST(count(*) AS BIGINT) AS ng FROM vals GROUP BY g) t)
        |SELECT j2, n,
        |  round((CAST(n AS DOUBLE) * n - sn2) / 4e0, 4) AS mu_j,
        |  round((CAST(j2 AS DOUBLE) / 2e0 - (CAST(n AS DOUBLE) * n - sn2) / 4e0) /
        |    sqrt((CAST(n AS DOUBLE) * n * (2e0 * n + 3e0) - sn23) / 72e0), 4) AS z_approx
        |FROM j2t CROSS JOIN ns""".stripMargin,
    "m163_simpson_audit" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    o_orderpriority AS grp,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |strata AS (
        |  SELECT grp,
        |    (count(*) * CAST(sum(t * y) AS DOUBLE) - CAST(sum(t) AS DOUBLE) * sum(y)) /
        |    (count(*) * CAST(sum(t * t) AS DOUBLE) - CAST(sum(t) AS DOUBLE) * sum(t)) AS slope_s
        |  FROM daily GROUP BY grp),
        |pooled AS (
        |  SELECT
        |    (count(*) * CAST(sum(t * y) AS DOUBLE) - CAST(sum(t) AS DOUBLE) * sum(y)) /
        |    (count(*) * CAST(sum(t * t) AS DOUBLE) - CAST(sum(t) AS DOUBLE) * sum(t)) AS slope_p
        |  FROM (
        |    SELECT t, CAST(sum(y) AS BIGINT) AS y FROM daily GROUP BY t) d)
        |SELECT round(max(slope_p), 4) AS pooled_slope,
        |  CAST(count(*) AS BIGINT) AS n_strata,
        |  CAST(sum(CASE WHEN (slope_s > 0) <> (slope_p > 0) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_opposite,
        |  CAST(CASE WHEN sum(CASE WHEN (slope_s > 0) <> (slope_p > 0) THEN 1 ELSE 0 END) > 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS reversal_flag
        |FROM strata CROSS JOIN pooled""".stripMargin)
}
