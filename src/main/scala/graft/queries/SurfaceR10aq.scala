package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 43: sequence randomness + multiple-testing
  * control — the Wald–Wolfowitz runs test (is the daily up/down
  * pattern random, or does momentum/mean-reversion structure exist?)
  * and a Benjamini–Hochberg FDR screen over a family of per-segment
  * tests (the thing that separates "we ran 5 tests and one hit
  * p<0.05" from an actual discovery).
  *
  * House float discipline: run/tie counts and test-statistic power
  * sums are exact integers; z/p/threshold formulas are ONE shared SQL
  * text; every window is over a bounded relation (days, 5 segments).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (statistics).
  */
object SurfaceR10aq extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT37: Wald–Wolfowitz runs test ----

  private val rtMu = "(1.0 + 2.0 * n1 * n2 / (n1 + n2))"
  private val rtVar =
    "((2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2) * (n1 + n2) - (CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)))"
  private val rtZ = s"((r_runs - $rtMu) / sqrt($rtVar))"

  /** LT37: RUNS TEST — classify each day as up/down vs the previous
    * day's order count (ties dropped), count the runs R and test
    * R against its null mean 1 + 2n₁n₂/N and variance
    * 2n₁n₂(2n₁n₂−N)/(N²(N−1)). |z| ≫ 0 ⇒ the daily series is not a
    * random shuffle (momentum or alternation). Signs, run boundaries,
    * and all three counts are exact integers off ONE bounded-series
    * lag window (the m121 daily aggregate); only z touches doubles.
    * Note Var is written as 2n₁n₂(2n₁n₂−n₁−n₂) / (N²(N−1)) with the
    * denominator expanded (N³−N²·1) to stay in one text. */
  val lt37RunsTest: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    val w = graft.Windows.bounded(col("t"))
    val signs = daily
      .withColumn("yp", lag(col("y"), 1).over(w))
      .where(col("yp").isNotNull && col("y") =!= col("yp"))
      .withColumn("sgn", when(col("y") > col("yp"), 1L).otherwise(-1L))
    val w2 = graft.Windows.bounded(col("t"))
    signs
      .withColumn("sp", lag(col("sgn"), 1).over(w2))
      .agg(
        sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n2"),
        (sum(when(col("sp").isNull || col("sp") =!= col("sgn"), 1L)
          .otherwise(0L))).as("r_runs"))
      .select(col("n1"), col("n2"), col("r_runs"),
        r4(expr(rtMu)).as("mu"),
        r4(expr(rtZ)).as("z"))
  }

  // ---- M125: Benjamini–Hochberg screen ----

  private val bhV1 = "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1))"
  private val bhV2 = "((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1))"
  private val bhT =
    s"((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / sqrt($bhV1 / n1 + $bhV2 / n2))"
  /** Two-sided p from the logistic approximation to the normal CDF
    * (Φ(z) ≈ 1/(1+e^{−1.702z}), max error ~0.01 — fine for a screen,
    * and a CLOSED FORM both engines share; neither engine has erf). */
  private val bhP = s"(2.0 / (1.0 + exp(1.702 * abs($bhT))))"

  /** M125: BENJAMINI–HOCHBERG — per priority, does the mean order
    * total differ between finalized and open orders? Five Welch tests
    * from exact integer (n, Σx, Σx²) per cell, p via the shared
    * logistic-Φ closed form, then the BH step-up at α=0.10:
    * k* = max{i : p(i) ≤ α·i/m}, discoveries = ranks ≤ k*. The
    * rank/threshold windows run over the 5-row test family (bounded
    * by construction). This is the multiple-testing gate a metrics
    * platform applies to every scorecard sweep. */
  val m125BhScreen: Q = (s, d) => {
    val cells = orders(s, d)
      .select(col("o_orderpriority").as("grp"), col("o_orderstatus").as("st"),
        expr("CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT)")
          .as("x"))
      .groupBy("grp")
      .agg(
        sum(when(col("st") === "F", 1L).otherwise(0L)).as("n1"),
        sum(when(col("st") === "O", 1L).otherwise(0L)).as("n2"),
        sum(when(col("st") === "F", col("x")).otherwise(0L)).as("s1"),
        sum(when(col("st") === "O", col("x")).otherwise(0L)).as("s2"),
        sum(when(col("st") === "F", expr("x * x")).otherwise(0L)).as("q1"),
        sum(when(col("st") === "O", expr("x * x")).otherwise(0L)).as("q2"))
    val tests = cells.select(col("grp"), col("n1"), col("n2"),
      expr(bhT).as("t_raw"), expr(bhP).as("p_raw"))
    val wRank = graft.Windows.bounded(col("p_raw"), col("grp"))
    val wAll = graft.Windows.bounded(col("p_raw"), col("grp"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    tests
      .withColumn("rank", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("kstar",
        max(when(expr("p_raw * m <= 0.10 * rank"), col("rank"))
          .otherwise(lit(0))).over(wAll))
      .select(col("grp"), col("n1"), col("n2"),
        r4(col("t_raw")).as("t_stat"),
        r4(col("p_raw")).as("p_value"),
        col("rank").cast("long").as("p_rank"),
        (col("rank") <= col("kstar")).cast("long").as("discovered"))
      .orderBy("p_rank")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt37_runs_test" -> lt37RunsTest,
    "m125_bh_screen" -> m125BhScreen)

  val oracleSql: Map[String, String] = Map(
    "lt37_runs_test" ->
      s"""WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |signs AS (
        |  SELECT t, CASE WHEN y > yp THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT t, y, lag(y, 1) OVER (ORDER BY t) AS yp FROM daily)
        |  WHERE yp IS NOT NULL AND y <> yp),
        |runs AS (
        |  SELECT sgn, lag(sgn, 1) OVER (ORDER BY t) AS sp FROM signs),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN sp IS NULL OR sp <> sgn THEN 1 ELSE 0 END) AS BIGINT) AS r_runs
        |  FROM runs)
        |SELECT n1, n2, r_runs,
        |  round($rtMu, 4) AS mu,
        |  round($rtZ, 4) AS z
        |FROM agg""".stripMargin,
    "m125_bh_screen" ->
      s"""WITH cells AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN x ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN x ELSE 0 END) AS BIGINT) AS s2,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN x * x ELSE 0 END) AS BIGINT) AS q1,
        |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN x * x ELSE 0 END) AS BIGINT) AS q2
        |  FROM (SELECT o_orderpriority, o_orderstatus,
        |          CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT) AS x
        |        FROM orders)
        |  GROUP BY 1),
        |tests AS (
        |  SELECT grp, n1, n2, $bhT AS t_raw, $bhP AS p_raw FROM cells),
        |ranked AS (
        |  SELECT grp, n1, n2, t_raw, p_raw,
        |    row_number() OVER (ORDER BY p_raw, grp) AS rank,
        |    count(*) OVER () AS m
        |  FROM tests),
        |kk AS (
        |  SELECT *,
        |    max(CASE WHEN p_raw * m <= 0.10 * rank THEN rank ELSE 0 END)
        |      OVER () AS kstar
        |  FROM ranked)
        |SELECT grp, n1, n2,
        |  round(t_raw, 4) AS t_stat,
        |  round(p_raw, 4) AS p_value,
        |  CAST(rank AS BIGINT) AS p_rank,
        |  CAST(CASE WHEN rank <= kstar THEN 1 ELSE 0 END AS BIGINT) AS discovered
        |FROM kk ORDER BY p_rank""".stripMargin)
}
