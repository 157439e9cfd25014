package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 79: record statistics — count the RECORD
  * HIGHS of the daily order series (days strictly above every earlier
  * day) and compare to the i.i.d. expectation H_n = Σ 1/k. Records
  * theory gives a distribution-free stationarity probe: a trending
  * series smashes records far above H_n, an exchangeable one tracks
  * it — no parameters, no moments, just counting (complements lt37's
  * runs test, which looks at one-step moves rather than all-time
  * highs). The record count is exact off one running-max window; the
  * harmonic number is an ordered 1/k cumsum (order-pinned floats).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (series statistics), sibling lt37/m123.
  */
object SurfaceR10ca extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M164: RECORD COUNTS — observed record highs vs H_n, with the
    * last record day. First day counts as a record (k=1 term of H_n
    * likewise). */
  val m164RecordCounts: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    val wOrd = Windows.bounded(col("t"))
    val wCum = Windows.bounded(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    daily
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("prevmax",
        max("y").over(Windows.bounded(col("t")).rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("is_rec",
        when(col("prevmax").isNull || col("y") > col("prevmax"), 1L)
          .otherwise(0L))
      .withColumn("hterm", expr("1e0 / rn"))
      .withColumn("hcum", sum("hterm").over(wCum))
      .agg(
        count(lit(1)).as("n_days"),
        sum("is_rec").as("n_records"),
        max(when(col("is_rec") === 1, col("t"))).as("last_record_t"),
        max("hcum").as("h_n"))
      .select(col("n_days"), col("n_records"), col("last_record_t"),
        r4(col("h_n")).as("expected_records"),
        r4(expr("CAST(n_records AS DOUBLE) / h_n")).as("excess_ratio"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m164_record_counts" -> m164RecordCounts)

  val oracleSql: Map[String, String] = Map(
    "m164_record_counts" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |marked AS (
        |  SELECT t, y,
        |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rn,
        |    max(y) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING) AS prevmax
        |  FROM daily),
        |cums AS (
        |  SELECT t,
        |    CASE WHEN prevmax IS NULL OR y > prevmax THEN 1 ELSE 0 END AS is_rec,
        |    sum(1e0 / rn) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS hcum
        |  FROM marked)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(is_rec) AS BIGINT) AS n_records,
        |  CAST(max(CASE WHEN is_rec = 1 THEN t END) AS BIGINT) AS last_record_t,
        |  round(max(hcum), 4) AS expected_records,
        |  round(CAST(sum(is_rec) AS DOUBLE) / max(hcum), 4) AS excess_ratio
        |FROM cums""".stripMargin)
}
