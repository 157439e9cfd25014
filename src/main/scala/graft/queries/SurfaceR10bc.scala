package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 55: repeated-measures inference + purchase
  * cadence — Friedman's test (the nonparametric k-treatment
  * analogue of repeated-measures ANOVA: rank the k priorities WITHIN
  * each week, then ask whether the rank sums could be exchangeable)
  * and the inter-purchase-gap distribution (median days between a
  * customer's consecutive orders — the cadence metric behind every
  * churn/replenishment model).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (statistics), §2.14 (product analytics).
  */
object SurfaceR10bc extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M139: Friedman test ----

  private val frTerm =
    "((CAST(r2 AS DOUBLE) - 6.0 * b) * (CAST(r2 AS DOUBLE) - 6.0 * b))"
  private val frChi2 =
    "(4.0 * sum_t / (CAST(sa2 AS DOUBLE) - 180.0 * b))"

  /** M139: FRIEDMAN — blocks = weeks with all 5 priorities present,
    * treatment value = the week's order count per priority, ranks are
    * TIE-AVERAGED and kept integer-exact as ar2 = 2·rank + ties − 1
    * (average rank doubled — counts tie constantly, so midranks are
    * the correct form, and doubling keeps every sum exact). With k=5
    * the tie-corrected statistic reduces to
    * χ² = 4·Σⱼ(R2ⱼ−6b)² / (Σar2² − 180b) — one shared formula over
    * exact integer rank sums. The in-block rank windows are 5-row
    * partitions (bounded by construction); the fact table only feeds
    * the weekly hash agg. */
  val m139Friedman: Q = (s, d) => {
    val weekly = orders(s, d)
      .select(expr(
        "CAST(floor(CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT) / 7.0) AS BIGINT)")
        .as("wk"), col("o_orderpriority").as("pr"))
      .groupBy("wk", "pr").agg(count(lit(1)).as("v"))
    val complete = weekly.groupBy("wk").agg(count(lit(1)).as("npr"))
      .where(col("npr") === 5).select("wk")
    val ranked = weekly.join(broadcast(complete), "wk")
      .withColumn("rnk",
        rank().over(Window.partitionBy("wk").orderBy("v")).cast("long"))
      .withColumn("ties",
        count(lit(1)).over(Window.partitionBy("wk", "v")).cast("long"))
      .withColumn("ar2", lit(2L) * col("rnk") + col("ties") - 1L)
    val perPr = ranked.groupBy("pr").agg(sum("ar2").as("r2"))
    val consts = ranked.agg(
      (count(lit(1)) / 5).cast("long").as("b"),
      sum(expr("ar2 * ar2")).as("sa2"))
    perPr.crossJoin(broadcast(consts))
      .groupBy("b", "sa2")
      .agg(sum(expr(frTerm)).as("sum_t"),
        max(expr("CAST(r2 AS DOUBLE) / (2.0 * b)")).as("max_rbar"),
        min(expr("CAST(r2 AS DOUBLE) / (2.0 * b)")).as("min_rbar"))
      .select(col("b").as("n_blocks"),
        r4(expr(frChi2)).as("chi2"),
        r4(col("max_rbar")).as("max_mean_rank"),
        r4(col("min_rbar")).as("min_mean_rank"))
  }

  // ---- Q43: inter-purchase gap distribution ----

  /** Q43: INTER-PURCHASE GAPS — per customer with ≥2 orders, the
    * median of consecutive-order day gaps (median DOUBLED to stay an
    * exact integer through the interpolated even-count case — the
    * m120 trick), then the population histogram in 30-day buckets of
    * the median. Per-customer lag windows (the per-entity shape);
    * both the bucket edges and the in-bucket mean are exact-integer
    * arithmetic. The cadence profile a replenishment model trains on. */
  val q43InterpurchaseGap: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("dt")
    val gaps = orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("dt"))
      .withColumn("prev", lag(col("dt"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("o_custkey"),
        datediff(col("dt"), col("prev")).cast("long").as("gap"))
    gaps.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_gaps"),
        expr("CAST(percentile(2 * gap, 0.5) AS BIGINT)").as("med2"))
      .select(col("o_custkey"), col("n_gaps"), col("med2"),
        expr("CAST(floor(med2 / 60.0) AS BIGINT)").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_customers"),
        sum("med2").as("sm2"), sum("n_gaps").as("tot_gaps"))
      .select(col("bucket"), col("n_customers"), col("tot_gaps"),
        r4(expr("CAST(sm2 AS DOUBLE) / (2.0 * n_customers)"))
          .as("avg_median_gap_days"))
      .orderBy("bucket")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m139_friedman" -> m139Friedman,
    "q43_interpurchase_gap" -> q43InterpurchaseGap)

  val oracleSql: Map[String, String] = Map(
    "m139_friedman" ->
      s"""WITH weekly AS (
        |  SELECT CAST(floor(CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) / 7.0) AS BIGINT) AS wk,
        |    o_orderpriority AS pr, CAST(count(*) AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |complete AS (
        |  SELECT wk FROM weekly GROUP BY 1 HAVING count(*) = 5),
        |ranked AS (
        |  SELECT w.wk, w.pr, w.v,
        |    CAST(rank() OVER (PARTITION BY w.wk ORDER BY w.v) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY w.wk, w.v) AS BIGINT) AS ties
        |  FROM weekly w JOIN complete c ON c.wk = w.wk),
        |ar AS (
        |  SELECT wk, pr, 2 * rnk + ties - 1 AS ar2 FROM ranked),
        |per_pr AS (
        |  SELECT pr, CAST(sum(ar2) AS BIGINT) AS r2 FROM ar GROUP BY 1),
        |consts AS (
        |  SELECT CAST(count(*) / 5 AS BIGINT) AS b,
        |    CAST(sum(ar2 * ar2) AS BIGINT) AS sa2
        |  FROM ar),
        |agg AS (
        |  SELECT b, sa2,
        |    sum($frTerm) AS sum_t,
        |    max(CAST(r2 AS DOUBLE) / (2.0 * b)) AS max_rbar,
        |    min(CAST(r2 AS DOUBLE) / (2.0 * b)) AS min_rbar
        |  FROM per_pr CROSS JOIN consts
        |  GROUP BY 1, 2)
        |SELECT b AS n_blocks,
        |  round($frChi2, 4) AS chi2,
        |  round(max_rbar, 4) AS max_mean_rank,
        |  round(min_rbar, 4) AS min_mean_rank
        |FROM agg""".stripMargin,
    "q43_interpurchase_gap" ->
      """WITH gaps AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', lag(CAST(o_orderdate AS DATE), 1)
        |        OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)),
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS gap
        |  FROM orders),
        |med AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(quantile_cont(2 * gap, 0.5) AS BIGINT) AS med2
        |  FROM gaps WHERE gap IS NOT NULL GROUP BY 1),
        |bucketed AS (
        |  SELECT CAST(floor(med2 / 60.0) AS BIGINT) AS bucket,
        |    n_gaps, med2
        |  FROM med)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(n_gaps) AS BIGINT) AS tot_gaps,
        |  round(CAST(sum(med2) AS DOUBLE) / (2.0 * count(*)), 4) AS avg_median_gap_days
        |FROM bucketed GROUP BY 1 ORDER BY 1""".stripMargin)
}
