package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-8 batch 10: market-basket lift and score calibration.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11 (M family / association mining), §2.13 analytics.
  */
object SurfaceR8j extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Q30: association rules for part pairs — support, confidence, and
    * lift of {a} → {b} over order baskets, the oracle-checked exact
    * counterpart to m21's FP-Growth (law-spec only). Pair candidates
    * come from a self-join on the order key, so the fanout is bounded
    * by basket size (≈ 7 items ⇒ ≤ 21 pairs per order) — never by the
    * catalog; min-support 3 (the fixture baskets are sparse: max pair co-occurrence is 5 at sf0.01) prunes before any division. All counts
    * integer; the three ratios are single double divisions. Top-20 by
    * lift (ties → part ids). */
  val q30BasketLift: Q = (s, d) => {
    val items = lineitem(s, d).select(col("l_orderkey").as("o"),
      col("l_partkey").as("p")).distinct()
    val nOrders = items.select("o").distinct().count()
    val single = items.groupBy("p").agg(count(lit(1)).as("np"))
    val pairs = items.toDF("o", "a")
      .join(items.toDF("o", "b"), "o")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("nab"))
      .where(col("nab") >= 3L)
    val lift = col("nab").cast("double") * lit(nOrders.toDouble) /
      (col("na").cast("double") * col("nb").cast("double"))
    pairs
      .join(single.toDF("a", "na"), "a")
      .join(single.toDF("b", "nb"), "b")
      .select(col("a"), col("b"), col("nab"),
        Orc.r4(col("nab").cast("double") / lit(nOrders.toDouble)).as("support"),
        Orc.r4(col("nab").cast("double") / col("na").cast("double")).as("confidence"),
        Orc.r4(lift).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(20)
  }

  /** M33: calibration (reliability) bins — a score binned into deciles
    * of its value range, each bin reporting predicted mean vs observed
    * outcome rate. The score is the md5-uniform of the event id (the
    * lp10 gate family — reproducible on both engines), the outcome is
    * `event_type = 'purchase'`; a well-calibrated random score shows a
    * flat observed rate at the base rate, which is exactly what the
    * fixture should produce. Fixed-width bins need no sort at all —
    * one hash agg over facts; means derive from integer sums (the
    * md5-uniform is a 2-hex-digit integer / 256). */
  val m33CalibrationBins: Q = (s, d) => {
    val e = events(s, d).select(
      expr("""((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
             | (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1))
             |""".stripMargin.replaceAll("\n", "")).as("s256"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    e.withColumn("bin", least(expr("(s256 * 10) div 256"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("s256").as("ssum"), sum("y").as("npos"))
      .select(col("bin"), col("n"),
        Orc.r4(col("ssum").cast("double") / col("n").cast("double") / lit(256.0))
          .as("mean_score"),
        Orc.r4(col("npos").cast("double") / col("n").cast("double"))
          .as("obs_rate"))
      .orderBy("bin")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q30_basket_lift" -> q30BasketLift,
    "m33_calibration_bins" -> m33CalibrationBins)

  val oracleSql: Map[String, String] = Map(
    "q30_basket_lift" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM items),
        |single AS (
        |  SELECT p, CAST(count(*) AS BIGINT) AS np FROM items GROUP BY p),
        |pairs AS (
        |  SELECT ia.p AS a, ib.p AS b, CAST(count(*) AS BIGINT) AS nab
        |  FROM items ia JOIN items ib ON ia.o = ib.o AND ia.p < ib.p
        |  GROUP BY ia.p, ib.p HAVING count(*) >= 3)
        |SELECT a, b, nab,
        |  round(CAST(nab AS DOUBLE) / CAST(n_orders AS DOUBLE), 4) AS support,
        |  round(CAST(nab AS DOUBLE) / CAST(sa.np AS DOUBLE), 4) AS confidence,
        |  round(CAST(nab AS DOUBLE) * CAST(n_orders AS DOUBLE) /
        |    (CAST(sa.np AS DOUBLE) * CAST(sb.np AS DOUBLE)), 4) AS lift
        |FROM pairs JOIN single sa ON sa.p = a JOIN single sb ON sb.p = b
        |     CROSS JOIN n
        |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin,
    "m33_calibration_bins" ->
      """WITH e AS (
        |  SELECT ((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1)) AS s256,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |b AS (
        |  SELECT least(CAST(s256 * 10 // 256 AS BIGINT), 9) AS bin, s256, y FROM e)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(CAST(sum(s256) AS BIGINT) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE) / 256e0, 4) AS mean_score,
        |  round(CAST(CAST(sum(y) AS BIGINT) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE), 4) AS obs_rate
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin)
}
