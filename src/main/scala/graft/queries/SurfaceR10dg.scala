package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 111: restricted mean survival time and
  * offline changepoint by binary segmentation.
  *
  * Contrast with near-siblings: the survival family so far reports
  * the CURVE (m71 Kaplan–Meier), DISCRIMINATION (m114 C-index) and a
  * TEST (m75's screen); none reports an effect SIZE. m190 is the
  * restricted mean survival time — the area under KM up to a horizon
  * τ, "expected days survived within τ" — the estimand methodologists
  * recommend when proportional hazards fails, and the number a
  * business reads directly. lt66 vs lt13/m142: CUSUM and Page–
  * Hinkley are SEQUENTIAL monitors (detect a break as data stream
  * in, tuned by drift/threshold); binary segmentation is the OFFLINE
  * retrospective estimator — scan every split point, take the one
  * whose two-segment fit maximally reduces SSE, with the exact gain
  * decomposition from prefix sums. Monitors answer "alarm now?";
  * segmentation answers "where WAS the break?".
  *
  * Float discipline: RMST rides m71's verified exp(Σln) survival
  * chain, then quantizes each interval area S·Δt to micro-days
  * before the per-group sum (quantize-before-sum). Segmentation
  * gains are a shared closing text over exact prefix integers
  * (S₁²/n₁ + S₂²/n₂ − S²/n); both engines rank identical doubles,
  * ties broken by the earlier split day.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13; siblings m71/m114 (SurfaceR10d/…), lt13
  * (SurfaceR9), m142 (SurfaceR10bi-family).
  */
object SurfaceR10dg extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val TAU = 365L // RMST horizon, days

  /** M190: RMST — per order priority, the area under the m71 KM curve
    * up to τ=365 days: Σ S(tᵢ₋₁)·(tᵢ−tᵢ₋₁) over event times ≤ τ plus
    * the terminal strip S(t_last)·(τ−t_last), every strip micro-day-
    * quantized before summing. One row per priority.
    *
    * Scale shape: identical bounded grids to m71 (distinct durations
    * per group); two ordered windows over that grid and one hash agg.
    */
  val m190Rmst: Q = (s, d) => {
    val base = orders(s, d).select(
      col("o_orderpriority").as("grp"),
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"))
    val perT = base.groupBy("grp", "dur")
      .agg(sum("ev").as("d"), count(lit(1)).as("c"))
    val w = Window.partitionBy("grp").orderBy("dur")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("grp")
    val curve = perT
      .withColumn("n_total", sum(col("c")).over(tot))
      .withColumn("left_before", sum(col("c")).over(wCum) - col("c"))
      .withColumn("n_risk", col("n_total") - col("left_before"))
      .where(col("d") > 0 && col("d") < col("n_risk"))
      .withColumn("surv",
        exp(sum(log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .over(wCum)))
      .select(col("grp"), col("dur"), col("surv"))
    val strips = curve
      .withColumn("prev_t", coalesce(lag(col("dur"), 1).over(w), lit(0L)))
      .withColumn("prev_s", coalesce(lag(col("surv"), 1).over(w), lit(1.0)))
      .where(col("dur") <= TAU)
      .select(col("grp"),
        expr("CAST(floor(prev_s * (dur - prev_t) * 1e6 + 0.5) AS BIGINT)")
          .as("aq"),
        col("dur"), col("surv"))
    val wLast = Window.partitionBy("grp").orderBy(col("dur").desc)
    val term = strips
      .withColumn("rn", row_number().over(wLast))
      .where(col("rn") === 1)
      .select(col("grp"),
        expr(s"CAST(floor(surv * ($TAU - dur) * 1e6 + 0.5) AS BIGINT)")
          .as("aq"))
    strips.select(col("grp"), col("aq")).union(term)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_strips"), sum("aq").as("sq"))
      .select(col("grp"), col("n_strips"),
        lit(TAU).as("tau"),
        r4(expr("CAST(sq AS DOUBLE) / 1e6")).as("rmst_days"))
      .orderBy("grp")
  }

  /** Split gain from exact prefix integers; both engines rank the
    * identical doubles. */
  private val segGain =
    "(CAST(s1 AS DOUBLE) * s1 / n1 + CAST(s2 AS DOUBLE) * s2 / n2 - " +
      "CAST(st AS DOUBLE) * st / nt)"

  /** LT66: BINARY SEGMENTATION — per event_type over the daily count
    * series: evaluate every split point k (both sides nonempty), pick
    * the k maximizing the two-segment SSE reduction (ties → earliest
    * day). Emits the split day, segment sizes/means, and the gain.
    *
    * Scale shape: prefix sums over the calendar-bounded daily grid
    * (one partitioned window), then a bounded per-type argmax — the
    * corpus-scaled work is the first daily hash agg.
    */
  val lt66BinarySegmentation: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("event_type")
    val pref = daily
      .withColumn("n1", count(lit(1)).over(wCum))
      .withColumn("s1", sum("x").over(wCum))
      .withColumn("nt", count(lit(1)).over(tot))
      .withColumn("st", sum("x").over(tot))
      .where(col("n1") < col("nt"))
      .withColumn("n2", col("nt") - col("n1"))
      .withColumn("s2", col("st") - col("s1"))
      .withColumn("gain", expr(segGain))
    val wBest = Window.partitionBy("event_type")
      .orderBy(col("gain").desc, col("day").asc)
    pref.withColumn("rn", row_number().over(wBest))
      .where(col("rn") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("n1").as("n_left"), col("n2").as("n_right"),
        r4(expr("CAST(s1 AS DOUBLE) / n1")).as("mean_left"),
        r4(expr("CAST(s2 AS DOUBLE) / n2")).as("mean_right"),
        r4(col("gain")).as("gain"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m190_rmst" -> m190Rmst,
    "lt66_binary_segmentation" -> lt66BinarySegmentation)

  val oracleSql: Map[String, String] = Map(
    "m190_rmst" ->
      s"""WITH base AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      DATE '1998-12-31') AS BIGINT) AS dur,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
        |  FROM orders),
        |pert AS (
        |  SELECT grp, dur, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |curve AS MATERIALIZED (
        |  SELECT grp, dur, surv FROM (
        |    SELECT grp, dur, d, n_risk,
        |      exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n_risk))
        |        OVER (PARTITION BY grp ORDER BY dur)) AS surv
        |    FROM (
        |      SELECT grp, dur, d, c,
        |        sum(c) OVER (PARTITION BY grp) -
        |          (sum(c) OVER (PARTITION BY grp ORDER BY dur) - c)
        |          AS n_risk
        |      FROM pert)
        |    WHERE d > 0 AND d < n_risk)),
        |strips AS MATERIALIZED (
        |  SELECT * FROM (
        |    SELECT grp, dur, surv,
        |      CAST(floor(coalesce(lag(surv) OVER
        |          (PARTITION BY grp ORDER BY dur), 1.0) *
        |        (dur - coalesce(lag(dur) OVER
        |          (PARTITION BY grp ORDER BY dur), 0)) * 1e6 + 0.5) AS BIGINT)
        |        AS aq
        |    FROM curve)
        |  WHERE dur <= $TAU),
        |term AS (
        |  SELECT grp,
        |    CAST(floor(surv * ($TAU - dur) * 1e6 + 0.5) AS BIGINT) AS aq
        |  FROM (SELECT grp, dur, surv,
        |          row_number() OVER (PARTITION BY grp ORDER BY dur DESC)
        |            AS rn
        |        FROM strips)
        |  WHERE rn = 1),
        |allq AS (
        |  SELECT grp, aq FROM strips UNION ALL SELECT grp, aq FROM term)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_strips,
        |  CAST($TAU AS BIGINT) AS tau,
        |  round(CAST(sum(aq) AS DOUBLE) / 1e6, 4) AS rmst_days
        |FROM allq GROUP BY grp ORDER BY grp""".stripMargin,
    "lt66_binary_segmentation" ->
      s"""WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |pref AS (
        |  SELECT event_type, day,
        |    CAST(count(*) OVER wc AS BIGINT) AS n1,
        |    CAST(sum(x) OVER wc AS BIGINT) AS s1,
        |    CAST(count(*) OVER wt AS BIGINT) AS nt,
        |    CAST(sum(x) OVER wt AS BIGINT) AS st
        |  FROM daily
        |  WINDOW wc AS (PARTITION BY event_type ORDER BY day),
        |    wt AS (PARTITION BY event_type)),
        |gains AS (
        |  SELECT event_type, day, n1, nt - n1 AS n2, s1, st - s1 AS s2,
        |    nt, st
        |  FROM pref WHERE n1 < nt),
        |scored AS (
        |  SELECT event_type, day, n1, n2, s1, s2,
        |    $segGain AS gain,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY $segGain DESC, day ASC) AS rn
        |  FROM gains)
        |SELECT event_type, day AS split_day, n1 AS n_left, n2 AS n_right,
        |  round(CAST(s1 AS DOUBLE) / n1, 4) AS mean_left,
        |  round(CAST(s2 AS DOUBLE) / n2, 4) AS mean_right,
        |  round(gain, 4) AS gain
        |FROM scored WHERE rn = 1 ORDER BY event_type""".stripMargin)
}
