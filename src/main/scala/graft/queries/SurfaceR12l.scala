package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-12 surface batch 12: one-sample Kolmogorov–Smirnov
  * goodness-of-fit against a FITTED exponential.
  *
  * Contrast: m46 is the TWO-sample KS (do two cohorts differ?); lt85
  * asks the monitoring question no other row covers — "are this
  * type's inter-event gaps exponential (Poisson arrivals)?" — by
  * fitting λ̂ = n/Σgap and testing D = sup|ECDF − (1 − e^{−λ̂g})|
  * against the 1.36/√n asymptotic 95% band. Bursty or scheduled
  * traffic rejects; memoryless traffic passes.
  *
  * Determinism: both one-sided deviations D⁺ = i/n − F(g₍ᵢ₎) and
  * D⁻ = F(g₍ᵢ₎) − (i−1)/n per sorted gap, with each row's CDF value
  * quantized to the 1e-9 grid BEFORE the max (exp is 1–2 ulp
  * engine-split; expected boundary flips ≈ rows × ulp/grid ≪ 1 —
  * the §5.3 ln/exp rule); the max of quantized integers is exact.
  * λ̂ is one exact-integer division.
  *
  * Scale shape: per-type lag + rank windows (partitioned), one
  * broadcast param row, hash-agg max — the m46 discipline with the
  * fitted-CDF row term instead of the second sample.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (drift/monitoring family).
  */
object SurfaceR12l extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val lt85KsExponential: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
    val gaps = events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev", lag("us", 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("event_type"), (col("us") - col("prev")).as("g"))
    val params = gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("g").as("sg"))
    val ranked = gaps
      .withColumn("i", row_number().over(
        Window.partitionBy("event_type").orderBy(col("g"))).cast("long"))
      .join(params, "event_type")
      // qF = round(1e9 · (1 − exp(−(n/Σg)·g))): the fitted CDF on the
      // 1e-9 integer grid; the deviations then compare exact integers
      .withColumn("qF", expr("CAST(floor((1 - exp(-(CAST(n AS DOUBLE) / sg)" +
        " * g)) * 1000000000 + 0.5) AS BIGINT)"))
      .select(col("event_type"), col("n"),
        greatest(
          expr("CAST(floor(CAST(i AS DOUBLE) / n * 1000000000 + 0.5)" +
            " AS BIGINT) - qF"),
          expr("qF - CAST(floor(CAST(i - 1 AS DOUBLE) / n * 1000000000" +
            " + 0.5) AS BIGINT)")).as("qd"))
    ranked.groupBy("event_type", "n")
      .agg(max("qd").as("qdmax"))
      .select(col("event_type"), col("n"),
        Orc.r4(col("qdmax").cast("double") / 1000000000.0d).as("ks_d"),
        Orc.r4(expr("1.36 / sqrt(CAST(n AS DOUBLE))")).as("crit_95"),
        (col("qdmax").cast("double") / 1000000000.0d >
          expr("1.36 / sqrt(CAST(n AS DOUBLE))")).as("reject_exponential"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt85_ks_exponential" -> lt85KsExponential)

  val oracleSql: Map[String, String] = Map(
    "lt85_ks_exponential" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        |  FROM events),
        |gaps AS (
        |  SELECT event_type, us - prev AS g
        |  FROM (SELECT event_type, us, event_id,
        |          lag(us) OVER (PARTITION BY event_type
        |                        ORDER BY us, event_id) AS prev
        |        FROM ev)
        |  WHERE prev IS NOT NULL),
        |params AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(g) AS BIGINT) AS sg
        |  FROM gaps GROUP BY 1),
        |ranked AS (
        |  SELECT g.event_type, p.n,
        |    CAST(row_number() OVER (PARTITION BY g.event_type ORDER BY g.g)
        |      AS BIGINT) AS i,
        |    CAST(floor((1 - exp(-(CAST(p.n AS DOUBLE) / p.sg) * g.g))
        |      * 1000000000 + 0.5) AS BIGINT) AS qF
        |  FROM gaps g JOIN params p USING (event_type)),
        |devs AS (
        |  SELECT event_type, n,
        |    greatest(
        |      CAST(floor(CAST(i AS DOUBLE) / n * 1000000000 + 0.5)
        |        AS BIGINT) - qF,
        |      qF - CAST(floor(CAST(i - 1 AS DOUBLE) / n * 1000000000 + 0.5)
        |        AS BIGINT)) AS qd
        |  FROM ranked)
        |SELECT event_type, n,
        |  round(CAST(max(qd) AS DOUBLE) / 1000000000.0, 4) AS ks_d,
        |  round(1.36 / sqrt(CAST(min(n) AS DOUBLE)), 4) AS crit_95,
        |  CAST(max(qd) AS DOUBLE) / 1000000000.0
        |    > 1.36 / sqrt(CAST(min(n) AS DOUBLE)) AS reject_exponential
        |FROM devs GROUP BY 1, 2 ORDER BY event_type""".stripMargin)
}
