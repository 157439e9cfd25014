package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 35: Harrell's concordance index — the
  * standard discrimination metric for survival models, completing the
  * family's evaluator the way m32/m83 complete classification: KM
  * (m71) and Nelson–Aalen (m73) describe, AFT (m69) fits, log-rank
  * (m75) tests — the C-index is what says whether a RISK SCORE
  * actually orders the events.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13 (survival statistics).
  */
object SurfaceR10ai extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M114: C-INDEX of a 10-bucket price risk score predicting time to
    * finalization (event = 'F', others censored at the admin date).
    * A pair is comparable when the EVENT subject's duration is
    * strictly shorter; it is concordant when the shorter-lived subject
    * carries the HIGHER risk score, ties in score scoring ½. The
    * naive pair space is O(n²); the scalable form runs entirely on
    * the BOUNDED duration×score grid: per-score cumulative counts
    * (windows over #durations rows), monotone-fill for grid holes
    * (cumulatives are non-decreasing, so a running max IS the
    * last-known fill), at-risk counts by subtraction, and one join of
    * the event cells onto the grid. Everything is exact integers —
    * the ½ tie credit is carried as 2A+N over 2T, so the single
    * division at the end is the only float op. */
  val m114SurvivalCindex: Q = (s, d) => {
    val base = orders(s, d).select(
      datediff(lit("1998-12-31").cast("date"),
        col("o_orderdate").cast("date")).cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"),
      least(floor(col("o_totalprice") / 50000).cast("long"), lit(9L))
        .as("score"))
    val cnt = base.groupBy("dur", "score").agg(count(lit(1)).as("n"))
    val evCells = base.where(col("ev") === 1L)
      .groupBy("dur", "score").agg(count(lit(1)).as("n_e"))
    val durs = base.select("dur").distinct()
    val scores = s.range(0, 10).select(col("id").as("score"))
    val grid = durs.crossJoin(broadcast(scores))
    val wCumDur = Window.partitionBy("score").orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totPerScore = cnt.groupBy("score").agg(sum("n").as("tot_s"))
    val filled = grid
      .join(cnt, Seq("dur", "score"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("cum", sum("n").over(wCumDur))
      .join(broadcast(totPerScore), Seq("score"), "left")
      .na.fill(0L, Seq("tot_s"))
      .withColumn("n_risk", col("tot_s") - col("cum"))
    val wScore = Window.partitionBy("dur").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDurAll = Window.partitionBy("dur")
    val enriched = filled
      .withColumn("a_le", sum("n_risk").over(wScore))
      .withColumn("aa", col("a_le") - col("n_risk"))
      .withColumn("tt", sum("n_risk").over(wDurAll))
    enriched.join(evCells, Seq("dur", "score"))
      .agg(sum("n_e").as("n_events"),
        sum(expr("n_e * (2 * aa + n_risk)")).as("num2"),
        sum(expr("n_e * 2 * tt")).as("den2"))
      .select(col("n_events"), (col("den2") / 2).cast("long").as("n_comparable"),
        r4(expr("CAST(num2 AS DOUBLE) / den2")).as("c_index"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m114_survival_cindex" -> m114SurvivalCindex)

  val oracleSql: Map[String, String] = Map(
    "m114_survival_cindex" ->
      """WITH base AS (
        |  SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |           DATE '1998-12-31') AS BIGINT) AS dur,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
        |    least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS score
        |  FROM orders),
        |cnt AS (SELECT dur, score, CAST(count(*) AS BIGINT) AS n
        |        FROM base GROUP BY 1, 2),
        |ev_cells AS (
        |  SELECT dur, score, CAST(count(*) AS BIGINT) AS n_e
        |  FROM base WHERE ev = 1 GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.dur, s.score
        |  FROM (SELECT DISTINCT dur FROM base) d
        |  CROSS JOIN (SELECT unnest(range(10)) AS score) s),
        |filled AS (
        |  SELECT g.dur, g.score, coalesce(cnt.n, 0) AS n
        |  FROM grid g LEFT JOIN cnt ON cnt.dur = g.dur AND cnt.score = g.score),
        |cum_t AS (
        |  SELECT dur, score,
        |    sum(n) OVER (PARTITION BY score ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n) OVER (PARTITION BY score) AS tot_s
        |  FROM filled),
        |risk AS (
        |  SELECT dur, score, CAST(tot_s - cum AS BIGINT) AS n_risk
        |  FROM cum_t),
        |enr AS (
        |  SELECT dur, score, n_risk,
        |    sum(n_risk) OVER (PARTITION BY dur ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_risk AS aa,
        |    sum(n_risk) OVER (PARTITION BY dur) AS tt
        |  FROM risk)
        |SELECT CAST(sum(n_e) AS BIGINT) AS n_events,
        |  CAST(sum(n_e * 2 * tt) / 2 AS BIGINT) AS n_comparable,
        |  round(CAST(sum(n_e * (2 * aa + n_risk)) AS DOUBLE)
        |        / sum(n_e * 2 * tt), 4) AS c_index
        |FROM enr JOIN ev_cells USING (dur, score)""".stripMargin)
}
