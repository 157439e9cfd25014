package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 66: sparse-demand forecasting + multi-scale
  * energy — CROSTON'S METHOD (the standard intermittent-demand
  * forecaster: separate EWMAs of demand SIZE and inter-arrival GAP,
  * forecast = size/gap, with the Syntetos–Boylan bias correction —
  * what plain EWMA (t15) gets wrong on mostly-zero series), and a
  * HAAR WAVELET energy decomposition of the daily series (which time
  * scale carries the variance? — the multi-resolution complement to
  * lt45's single-frequency periodogram). Croston's closed-form EWMA
  * weights run as ordered nonnegative cumsums (order-pinned floats);
  * every Haar detail coefficient is an EXACT integer block-sum
  * difference, with absent days correctly contributing zero demand.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (forecasting/series), siblings t15/lt17/lt45.
  */
object SurfaceR10bn extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT46: Croston ----

  /** LT46: CROSTON — daily demand for the deterministic sparse SKU
    * set partkey % 997 = 1 (a handful of parts → intermittent daily
    * series). Demand events (day, quantity) and gaps feed two
    * α = 0.2 EWMAs via the closed form z_n = Σ w_i·q_i with
    * w_i = α(1−α)^{n−i} (w_1 = (1−α)^{n−1}): the weighted terms are
    * nonnegative, so ordered cumsum + last-row pickoff pins the float
    * order. Forecast = z/p; SBA = (1−α/2)·z/p. */
  val lt46Croston: Q = (s, d) => {
    val demand = lineitem(s, d)
      .where(col("l_partkey") % 997 === 1)
      .join(orders(s, d).select(col("o_orderkey").as("l_orderkey"),
        col("o_orderdate")), "l_orderkey")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"),
        col("l_quantity"))
      .groupBy("t")
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
    val wOrd = Windows.bounded(col("t"))
    val events = demand
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("gap",
        coalesce(col("t") - lag("t", 1).over(wOrd), lit(0L)))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key)
    val weighted = events
      .withColumn("n", count(lit(1)).over(wAll))
      // first demand seeds the EWMA; first gap is undefined -> seeded
      // by the SECOND event's gap (standard convention: z1=q1, p2=x2).
      .withColumn("wz", expr(
        "CASE WHEN rn = 1 THEN pow(8e-1, n - 1) ELSE 2e-1 * pow(8e-1, n - rn) END"))
      .withColumn("wp", expr(
        "CASE WHEN rn = 1 THEN 0e0 WHEN rn = 2 THEN pow(8e-1, n - 2) ELSE 2e-1 * pow(8e-1, n - rn) END"))
    val wCum = Windows.bounded(col("rn"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    weighted
      .withColumn("cz", sum(expr("wz * q")).over(wCum))
      .withColumn("cp", sum(expr("wp * gap")).over(wCum))
      .groupBy("n")
      .agg(sum("q").as("total_q"),
        max("cz").as("z"), max("cp").as("p"))
      .select(col("n").as("n_demands"), col("total_q"),
        r4(col("z")).as("size_ewma"),
        r4(col("p")).as("gap_ewma"),
        r4(expr("z / p")).as("croston"),
        r4(expr("(1e0 - 1e-1) * z / p")).as("sba"))
  }

  // ---- LT47: Haar energy ----

  /** LT47: HAAR ENERGY — unnormalized Haar detail energy of the daily
    * order count over the dyadic window t ∈ [0, 2048): at level j the
    * detail for block k is the difference of the two level-(j−1)
    * half-block sums, an EXACT integer (days with no orders enter as
    * true zeros because block sums simply omit them); energy
    * E_j = Σ_k d²/2^j. The level carrying the biggest share is the
    * dominant time scale. One conditional explode (6 levels) + two
    * hash aggs — scale-stable. */
  val lt47HaarEnergy: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .where(col("t") >= 0 && col("t") < 2048)
      .groupBy("t").agg(count(lit(1)).as("y"))
    val details = daily
      .select(col("t"), col("y"),
        explode(expr("sequence(1, 6)")).as("j"))
      .select(col("j"),
        expr("t DIV CAST(pow(2, j) AS BIGINT)").as("blk"),
        expr("CASE WHEN (t DIV CAST(pow(2, j - 1) AS BIGINT)) % 2 = 0 THEN y ELSE -y END")
          .as("sgn"))
      .groupBy("j", "blk")
      .agg(sum("sgn").as("dd"))
    val energies = details
      .groupBy("j")
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("dd") * col("dd")).as("ss"))
      .withColumn("energy",
        expr("CAST(ss AS DOUBLE) / CAST(pow(2, j) AS BIGINT)"))
    val wCum = Windows.bounded(col("j"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = energies
      .withColumn("ce", sum("energy").over(wCum))
      .agg(max("ce").as("etot"))
    energies.crossJoin(broadcast(tot))
      .select(col("j").cast("long").as("level"), col("n_blocks"), col("ss"),
        r4(col("energy")).as("energy"),
        r4(expr("energy / etot")).as("share"))
      .orderBy("level")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt46_croston" -> lt46Croston,
    "lt47_haar_energy" -> lt47HaarEnergy)

  val oracleSql: Map[String, String] = Map(
    "lt46_croston" ->
      """WITH demand AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o.o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE l.l_partkey % 997 = 1
        |  GROUP BY 1),
        |events AS (
        |  SELECT t, q,
        |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rn,
        |    CAST(coalesce(t - lag(t, 1) OVER (ORDER BY t), 0) AS BIGINT) AS gap,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM demand),
        |weighted AS (
        |  SELECT *,
        |    CASE WHEN rn = 1 THEN pow(8e-1, n - 1) ELSE 2e-1 * pow(8e-1, n - rn) END AS wz,
        |    CASE WHEN rn = 1 THEN 0e0 WHEN rn = 2 THEN pow(8e-1, n - 2) ELSE 2e-1 * pow(8e-1, n - rn) END AS wp
        |  FROM events),
        |cums AS (
        |  SELECT n, q,
        |    sum(wz * q) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cz,
        |    sum(wp * gap) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cp
        |  FROM weighted),
        |agg AS (
        |  SELECT n, CAST(sum(q) AS BIGINT) AS total_q,
        |    max(cz) AS z, max(cp) AS p
        |  FROM cums GROUP BY n)
        |SELECT n AS n_demands, total_q,
        |  round(z, 4) AS size_ewma,
        |  round(p, 4) AS gap_ewma,
        |  round(z / p, 4) AS croston,
        |  round((1e0 - 1e-1) * z / p, 4) AS sba
        |FROM agg""".stripMargin,
    "lt47_haar_energy" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders
        |  WHERE CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) BETWEEN 0 AND 2047
        |  GROUP BY 1),
        |details AS (
        |  SELECT j,
        |    t // CAST(pow(2, j) AS BIGINT) AS blk,
        |    CAST(sum(CASE WHEN (t // CAST(pow(2, j - 1) AS BIGINT)) % 2 = 0
        |      THEN y ELSE -y END) AS BIGINT) AS dd
        |  FROM daily CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6]) AS j) jj
        |  GROUP BY 1, 2),
        |energies AS (
        |  SELECT j, CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(dd * dd) AS BIGINT) AS ss,
        |    CAST(sum(dd * dd) AS BIGINT) / CAST(CAST(pow(2, j) AS BIGINT) AS DOUBLE) AS energy
        |  FROM details GROUP BY 1),
        |tot AS (
        |  SELECT max(ce) AS etot FROM (
        |    SELECT sum(energy) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS ce
        |    FROM energies) c)
        |SELECT CAST(j AS BIGINT) AS level, n_blocks, ss,
        |  round(energy, 4) AS energy,
        |  round(energy / etot, 4) AS share
        |FROM energies CROSS JOIN tot
        |ORDER BY level""".stripMargin)
}
