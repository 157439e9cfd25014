package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-8 batch 7: audience accumulation and cohort value curves.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13 (product analytics family).
  */
object SurfaceR8g extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Q28: daily new users and cumulative distinct reach. Running
    * COUNT(DISTINCT) is the textbook trap — the distinct state grows
    * with the corpus; the scalable identity is cumulative-reach(day) =
    * Σ new-users(day' ≤ day), so the plan is: first-seen day per user
    * (one hash agg), new-user counts per day (second hash agg, output
    * = #days), and a running sum over the tiny day relation. Nothing
    * bigger than #days ever reaches a window. */
  val q28CumulativeReach: Q = (s, d) => {
    val firsts = events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("user_id").agg(min("day").as("first_day"))
    val daily = firsts.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = graft.Windows.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("reach", sum("new_users").over(w))
      .select("day", "new_users", "reach")
      .orderBy("day")
  }

  /** Q29: cohort LTV curves — for each signup cohort (first-seen day),
    * the cumulative per-user value through day offsets 0..7. Revenue
    * is 1e-4-quantized per event and summed as integers (exact ⇒
    * engine-identical ⇒ safely partial-aggregated), cumulated over the
    * tiny (cohort × offset) grid, and normalized by cohort size — the
    * curve a growth team reads to see whether later cohorts monetize
    * faster. Facts are touched by exactly two hash aggregations. */
  val q29CohortLtv: Q = (s, d) => {
    val e = events(s, d).select(col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      expr("CAST(floor(value * 1e4 + 5e-1) AS BIGINT)").as("qv"))
    val firsts = e.groupBy("user_id").agg(min("day").as("cohort"))
    val sized = firsts.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    val cells = e.join(firsts, "user_id")
      .withColumn("day_offset", col("day") - col("cohort"))
      .where(col("day_offset") <= 7)
      .groupBy("cohort", "day_offset")
      .agg(sum("qv").as("qrev"))
    val w = Window.partitionBy("cohort").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_qrev", sum("qrev").over(w))
      .join(sized, "cohort")
      .select(col("cohort"), col("day_offset"), col("cohort_users"),
        Orc.r4(col("cum_qrev").cast("double") / lit(1e4)).as("cum_revenue"),
        Orc.r4(col("cum_qrev").cast("double") /
          col("cohort_users").cast("double") / lit(1e4)).as("ltv_per_user"))
      .orderBy("cohort", "day_offset")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q28_cumulative_reach" -> q28CumulativeReach,
    "q29_cohort_ltv" -> q29CohortLtv)

  val oracleSql: Map[String, String] = Map(
    "q28_cumulative_reach" ->
      """WITH f AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS first_day
        |  FROM events GROUP BY user_id),
        |d AS (
        |  SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
        |  FROM f GROUP BY first_day)
        |SELECT day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS reach
        |FROM d ORDER BY day""".stripMargin,
    "q29_cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 1e4 + 5e-1) AS BIGINT) AS qv
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id),
        |sz AS (
        |  SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
        |  FROM f GROUP BY cohort),
        |cells AS (
        |  SELECT f.cohort, e.day - f.cohort AS day_offset,
        |    CAST(sum(e.qv) AS BIGINT) AS qrev
        |  FROM e JOIN f USING (user_id)
        |  WHERE e.day - f.cohort <= 7
        |  GROUP BY f.cohort, e.day - f.cohort),
        |c AS (
        |  SELECT cohort, day_offset, qrev,
        |    CAST(sum(qrev) OVER (PARTITION BY cohort ORDER BY day_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_qrev
        |  FROM cells)
        |SELECT c.cohort, c.day_offset, sz.cohort_users,
        |  round(CAST(cum_qrev AS DOUBLE) / 1e4, 4) AS cum_revenue,
        |  round(CAST(cum_qrev AS DOUBLE) / CAST(sz.cohort_users AS DOUBLE) / 1e4, 4)
        |    AS ltv_per_user
        |FROM c JOIN sz ON sz.cohort = c.cohort
        |ORDER BY c.cohort, c.day_offset""".stripMargin)
}
