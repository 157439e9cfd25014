package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-8 batch 14: PSI drift monitoring and week-over-week growth.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11 (M monitoring) and §2.13 (product analytics).
  */
object SurfaceR8n extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M35: Population Stability Index of the m33 score between the two
    * md5 corpus halves — THE production model-monitoring metric (PSI
    * < 0.1 stable, > 0.25 action). Ten fixed-width score bins, counts
    * per (bin, half) from one hash agg; PSI terms (p−q)·ln(p/q) are
    * per-bin non-negative, computed from exact integer counts with
    * single double divisions — bit-identical on both engines. The
    * fixture's two halves draw from the same distribution, so total
    * PSI must read as noise-level stable (spec asserts < 0.1). */
  val m35Psi: Q = (s, d) => {
    val e = events(s, d).select(col("event_id"),
      expr("""((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
             | (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1))
             |""".stripMargin.replaceAll("\n", "")).as("s256"),
      expr("""((instr('0123456789abcdef', substr(md5(event_id || 'drift'), 1, 1)) - 1) * 16 +
             | (instr('0123456789abcdef', substr(md5(event_id || 'drift'), 2, 1)) - 1)) % 100 < 50
             |""".stripMargin.replaceAll("\n", "")).as("in_a"))
    val bins = e
      .withColumn("bin", least(expr("(s256 * 10) div 256"), lit(9L)))
      .groupBy("bin")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("nb"))
    val tot = bins.agg(sum("na").as("ta"), sum("nb").as("tb"))
    val p = col("na").cast("double") / col("ta").cast("double")
    val q = col("nb").cast("double") / col("tb").cast("double")
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), col("na"), col("nb"),
        Orc.r4((p - q) * log(p / q)).as("psi_term"))
      .orderBy("bin")
  }

  /** Q32: week-over-week revenue growth — weekly quantized-integer
    * revenue totals (one hash agg; facts never reach a window), then
    * lag over the tiny week relation for absolute and percentage
    * growth. The null first-week growth stays null on both engines. */
  val q32WowGrowth: Q = (s, d) => {
    val weekly = lineitem(s, d)
      .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 604800000000")
        .as("week"),
        expr("CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4 + 5e-1) AS BIGINT)")
          .as("qrev"))
      .groupBy("week").agg(sum("qrev").as("rev"))
    val w = graft.Windows.bounded(col("week"))
    weekly
      .withColumn("prev", lag("rev", 1).over(w))
      .select(col("week"),
        Orc.r4(col("rev").cast("double") / lit(1e4)).as("revenue"),
        Orc.r4((col("rev") - col("prev")).cast("double") / lit(1e4)).as("wow_abs"),
        Orc.r4((col("rev") - col("prev")).cast("double") /
          col("prev").cast("double") * lit(100.0)).as("wow_pct"))
      .orderBy("week")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m35_psi" -> m35Psi,
    "q32_wow_growth" -> q32WowGrowth)

  val oracleSql: Map[String, String] = Map(
    "m35_psi" ->
      """WITH e AS (
        |  SELECT ((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1)) AS s256,
        |    ((instr('0123456789abcdef', substr(md5(event_id || 'drift'), 1, 1)) - 1) * 16 +
        |     (instr('0123456789abcdef', substr(md5(event_id || 'drift'), 2, 1)) - 1)) % 100 < 50
        |      AS in_a
        |  FROM events),
        |b AS (
        |  SELECT least(CAST(s256 * 10 // 256 AS BIGINT), 9) AS bin,
        |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
        |  FROM e GROUP BY 1),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
        |             CAST(sum(nb) AS BIGINT) AS tb FROM b)
        |SELECT bin, na, nb,
        |  round((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)
        |         - CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)) *
        |        ln((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)) /
        |           (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))), 4) AS psi_term
        |FROM b CROSS JOIN t ORDER BY bin""".stripMargin,
    "q32_wow_growth" ->
      """WITH w AS (
        |  SELECT epoch_us(l_shipdate) // 604800000000 AS week,
        |    CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4 + 5e-1)
        |                  AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1)
        |SELECT week,
        |  round(CAST(rev AS DOUBLE) / 1e4, 4) AS revenue,
        |  round(CAST(rev - lag(rev) OVER (ORDER BY week) AS DOUBLE) / 1e4, 4)
        |    AS wow_abs,
        |  round(CAST(rev - lag(rev) OVER (ORDER BY week) AS DOUBLE) /
        |        CAST(lag(rev) OVER (ORDER BY week) AS DOUBLE) * 1e2, 4) AS wow_pct
        |FROM w ORDER BY week""".stripMargin)
}
