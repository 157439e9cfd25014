package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-11 surface batch 4: classical seasonal decomposition (the
  * trend/seasonal/residual SPLIT of a daily series) and MLlib's
  * TargetEncoder with a hash-checked model oracle.
  *
  * Contrast with near-siblings: lt12 MEASURES seasonal strength (one
  * variance ratio per series), lt69 FORECASTS with a seasonal state —
  * lt71 decomposes the observed series itself into the three additive
  * components (centered moving-average trend, day-of-week seasonal
  * means of the detrended series, residual remainder), the
  * classical-decomposition first pass of STL and the standard
  * "why did the metric move" analyst view. m1 StringIndexer encodes
  * category IDENTITY, m132 LOO-encodes with own-row exclusion — m203
  * is the smoothed GLOBAL-prior mean encoding (and, with a binary
  * target, integer-exact enough to oracle-check an MLlib MODEL).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.13 (time-series ops), §2.14 (MLlib parity).
  */
object SurfaceR11d extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LT71: CLASSICAL SEASONAL DECOMPOSITION — per event type's daily
    * means: trend = centered 7-day moving average (defined only where
    * the full window exists, the textbook edge rule), detrended = v −
    * trend, seasonal = day-of-week mean of the detrended values,
    * residual = detrended − seasonal. Each stage passes through the r4
    * grid BEFORE the next subtraction (quantize-before-subtract, §5.3)
    * so both engines difference identical values. Scale: two bounded
    * per-type windows + one (type, dow) hash agg — series length is
    * bounded by distinct days, the daily pre-agg is the distributed
    * pass. */
  val lt71StlDecompose: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val idx = daily.select(col("event_type"), col("day"),
      col("v").cast("double").as("v"),
      row_number().over(wOrd).cast("long").as("j"),
      count(lit(1)).over(Window.partitionBy("event_type")).as("n"),
      dayofweek(col("day")).cast("long").as("dow"))
    val de = idx
      .withColumn("trend",
        when(col("j") >= 4 && col("j") <= col("n") - 3,
          r4(avg("v").over(wOrd.rowsBetween(-3, 3)))))
      .where(col("trend").isNotNull)
      .withColumn("detr", r4(col("v") - col("trend")))
    // seasonal mean through exact integers: detr is already on the 1e-4
    // grid, so sum its integer image and divide ONCE (quantize-before-
    // sum, §5.3) — a raw avg() of the doubles sat on a rounding
    // knife-edge at sf0.01
    val se = de.groupBy("event_type", "dow")
      .agg(r4(sum(floor(col("detr") * 10000d + 0.5d).cast("long"))
        .cast("double") / (count(lit(1)) * 10000L)).as("seasonal"))
    de.join(se, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), r4(col("v")).as("v"),
        col("trend"), col("seasonal"),
        r4(col("detr") - col("seasonal")).as("residual"))
      .orderBy("event_type", "day")
  }

  /** M203: TARGET ENCODER — MLlib's smoothed mean encoding (Spark 4's
    * `TargetEncoder`): each category's code is the shrinkage blend
    * enc = w·catMean + (1−w)·globalMean with w = n/(n+smoothing) —
    * the supervised cousin of m1's StringIndexer (which encodes
    * IDENTITY, not signal) and the GLOBAL-prior counterpart of m132's
    * leave-one-out encoding (LOO excludes the own row to fight
    * leakage; TargetEncoder shrinks toward the prior instead).
    * Category = customer nation, target = binary order-finalized flag,
    * smoothing = 10. The blend formula was pinned against the fitted
    * model bit-for-bit (probe in SurfaceR11dSpec); with a 0/1 target
    * every sum is integer-exact, so the oracle recomputes the same
    * blend relationally and the row hash-checks the MODEL's encodings.
    * Scale: the fit is one groupBy over (category) — the model is a
    * category-sized table, broadcast on transform. */
  val m203TargetEncoder: Q = (s, d) => {
    import org.apache.spark.ml.feature.TargetEncoder
    val base = orders(s, d).join(customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("double").as("nk"),
        when(col("o_orderstatus") === "F", 1.0d).otherwise(0.0d).as("y"))
    val te = new TargetEncoder().setInputCols(Array("nk"))
      .setOutputCols(Array("enc")).setLabelCol("y")
      .setTargetType("binary").setSmoothing(10.0)
    te.fit(base).transform(base)
      .groupBy(col("nk").cast("long").as("nation_key"))
      .agg(count(lit(1)).as("n_orders"), r4(first("enc")).as("enc"))
      .orderBy("nation_key")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt71_stl_decompose" -> lt71StlDecompose,
    "m203_target_encoder" -> m203TargetEncoder)

  val oracleSql: Map[String, String] = Map(
    // the blend text mirrors the pinned model formula exactly:
    // w*catMean + (1-w)*globalMean, w = n/(n+10); 0/1 sums are
    // integer-exact so only the final blend touches fp
    "m203_target_encoder" ->
      """WITH base AS (
        |  SELECT c.c_nationkey AS nk,
        |    CASE WHEN o.o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT CAST(sum(y) AS DOUBLE) AS gs,
        |             CAST(count(*) AS DOUBLE) AS gn FROM base),
        |cat AS (
        |  SELECT nk, CAST(sum(y) AS DOUBLE) AS cs,
        |         CAST(count(*) AS DOUBLE) AS cn,
        |         CAST(count(*) AS BIGINT) AS n_orders
        |  FROM base GROUP BY nk)
        |SELECT CAST(nk AS BIGINT) AS nation_key, n_orders,
        |  round((cn / (cn + 10.0)) * (cs / cn)
        |        + (1 - cn / (cn + 10.0)) * (gs / gn), 4) AS enc
        |FROM cat CROSS JOIN g
        |ORDER BY nation_key""".stripMargin,
    // DuckDB dayofweek is Sunday=0; Spark's is Sunday=1 — the +1 aligns
    "lt71_stl_decompose" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    avg(value) AS v
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, day, CAST(v AS DOUBLE) AS v,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS j,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(dayofweek(day) + 1 AS BIGINT) AS dow
        |  FROM daily),
        |de AS (
        |  SELECT * FROM (
        |    SELECT *, round(v - trend, 4) AS detr FROM (
        |      SELECT *, CASE WHEN j >= 4 AND j <= n - 3 THEN
        |          round(avg(v) OVER (PARTITION BY event_type ORDER BY j
        |            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) END AS trend
        |      FROM idx))
        |  WHERE trend IS NOT NULL),
        |se AS (
        |  SELECT event_type, dow,
        |    round(CAST(sum(CAST(floor(detr * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
        |          / (count(*) * 10000), 4) AS seasonal
        |  FROM de GROUP BY 1, 2)
        |SELECT d.event_type, d.day, round(d.v, 4) AS v, d.trend, s.seasonal,
        |  round(d.detr - s.seasonal, 4) AS residual
        |FROM de d JOIN se s ON s.event_type = d.event_type AND s.dow = d.dow
        |ORDER BY d.event_type, d.day""".stripMargin)
}
