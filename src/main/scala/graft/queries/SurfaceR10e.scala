package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 5: small exact analytics operators rounding
  * out the robust-statistics / data-audit family — winsorization (the
  * clipping sibling of m27/m28's robust scaling/fencing), the Benford
  * first-digit audit, and the per-group Gini concentration index.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.4 (aggregations), §2.13 (robust statistics).
  */
object SurfaceR10e extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M72: WINSORIZATION — clip account balances to the exact [p05, p95]
    * percentile band (interpolated `percentile`, the a8-verified exact
    * aggregate). Two-pass shape: one percentile aggregate broadcast as
    * a scalar pair, then a narrow clip — the same shape as m36's
    * Imputer at any scale. */
  val m72Winsorize: Q = (s, d) => {
    val bounds = customer(s, d).agg(
      expr("percentile(c_acctbal, 0.05)").as("lo"),
      expr("percentile(c_acctbal, 0.95)").as("hi"))
    customer(s, d).crossJoin(broadcast(bounds))
      .select(col("c_custkey"),
        r4(least(greatest(col("c_acctbal"), col("lo")), col("hi")))
          .as("bal_w"))
      .orderBy("c_custkey")
  }

  /** Q34: BENFORD FIRST-DIGIT AUDIT — the fraud/data-quality screen:
    * first significant digit distribution of order totals vs the
    * Benford expectation log10(1 + 1/d), with the chi-square distance.
    * One hash aggregate over a narrow projection. */
  val q34Benford: Q = (s, d) => {
    val digits = orders(s, d)
      .where(col("o_totalprice") >= 1)
      .select(substring(col("o_totalprice").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    // scalar total via broadcast cross join, not a partition-less
    // window (the registry plan audit rightly rejects WindowExec with
    // no partition spec even over this bounded 9-row histogram)
    val tot = digits.agg(sum(col("n")).as("total"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        r4(col("n").cast("double") / col("total")).as("obs_p"),
        r4(log(10.0, lit(1.0) + lit(1.0) / col("digit"))).as("benford_p"))
      .orderBy("digit")
  }

  /** A33: GINI CONCENTRATION INDEX per market segment — exact formula
    * G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n over positive balances, with
    * ranks from a PER-GROUP window (partitioned by segment — no global
    * sort; a single-series Gini at scale would ride GlobalRowId/
    * PrefixSum instead). Deterministic total order: balance then key. */
  val a33Gini: Q = (s, d) => {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    customer(s, d)
      .where(col("c_acctbal") > 0)
      .select(col("c_mktsegment"), col("c_acctbal"),
        row_number().over(w).cast("double").as("rk"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        r4(lit(2.0) * sum(col("rk") * col("c_acctbal"))
          / (count(lit(1)) * sum(col("c_acctbal")))
          - (count(lit(1)) + lit(1.0)) / count(lit(1))).as("gini"))
      .orderBy("c_mktsegment")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m72_winsorize" -> m72Winsorize,
    "q34_benford" -> q34Benford,
    "a33_gini" -> a33Gini)

  val oracleSql: Map[String, String] = Map(
    "m72_winsorize" ->
      """WITH b AS (
        |  SELECT quantile_cont(c_acctbal, 0.05) AS lo,
        |         quantile_cont(c_acctbal, 0.95) AS hi
        |  FROM customer)
        |SELECT c_custkey,
        |  round(least(greatest(c_acctbal, lo), hi), 4) AS bal_w
        |FROM customer CROSS JOIN b ORDER BY c_custkey""".stripMargin,
    "q34_benford" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS digit,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM d)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / total, 4) AS obs_p,
        |  round(log10(1.0 + 1.0 / digit), 4) AS benford_p
        |FROM d CROSS JOIN t ORDER BY digit""".stripMargin,
    "a33_gini" ->
      """WITH r AS (
        |  SELECT c_mktsegment, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS rk
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  round(2.0 * sum(rk * c_acctbal) / (count(*) * sum(c_acctbal))
        |        - (count(*) + 1.0) / count(*), 4) AS gini
        |FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
}
