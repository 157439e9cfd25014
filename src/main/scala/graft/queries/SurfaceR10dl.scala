package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}
import graft.operators.GlobalRowId

/** Round-10 surface batch 116: the Lorenz curve and the Fisher-z
  * correlation confidence interval.
  *
  * Contrast with near-siblings: a33 reduces concentration to ONE
  * number (Gini) and a42 to a welfare index; a43 emits the CURVE
  * those scalars integrate — per value-decile, the cumulative
  * population share against the cumulative value share, the readout
  * an analyst actually plots (and the Gini is twice the area between
  * its diagonal). Deciles come from a GlobalRowId ordinal —
  * (rowid·10) DIV n is exact integer bucketing, immune to the
  * interpolated-cut-point ulp trap a percentile-based binning would
  * carry. m193 vs m18/a7: those report correlation POINTS; m193
  * wraps the daily count↔volume correlation in the Fisher-z interval
  * (atanh spelled as ½ln((1+r)/(1−r)) — one shared text), the same
  * estimate→interval completion m156 gave AUC. m89 intervals a
  * RATIO metric, not a correlation.
  *
  * Float discipline: Lorenz is exact integers end to end (ordinal
  * bucketing, cent sums, bounded 10-row cumsum) with single-division
  * r4 shares; Fisher-z consumes the exact moment sums of the
  * calendar-bounded daily grid and closes in one shared text.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.4 and §2.13; siblings a33/a42, m18/m155/m156.
  */
object SurfaceR10dl extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** A43: LORENZ CURVE — orders sorted by (dollars, key) into ten
    * exact ordinal deciles; per decile: count, cent mass, and the
    * cumulative population/value shares. The curve behind a33's Gini.
    *
    * Scale shape: one GlobalRowId range exchange (the only
    * single-task step is its numPartitions-row offset cumsum), one
    * hash agg to 10 rows, one bounded cumsum.
    */
  val a43LorenzCurve: Q = (s, d) => {
    val rows = orders(s, d).select(col("o_orderkey"),
      expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val ranked = GlobalRowId.withRowIdCols(rows, Seq("cents", "o_orderkey"),
      numPartitions = 32, outCol = "rid")
    val n = ranked.agg(count(lit(1)).as("n"), sum("cents").as("tot"))
    val byDec = ranked.crossJoin(broadcast(n))
      .withColumn("decile", expr("(rid * 10) DIV n"))
      .groupBy("decile", "n", "tot")
      .agg(count(lit(1)).as("n_d"), sum("cents").as("c_d"))
    val wCum = Windows.bounded(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    byDec
      .withColumn("cum_n", sum("n_d").over(wCum))
      .withColumn("cum_c", sum("c_d").over(wCum))
      .select(col("decile"), col("n_d"),
        r4(expr("CAST(cum_n AS DOUBLE) / n")).as("cum_pop_share"),
        r4(expr("CAST(cum_c AS DOUBLE) / tot")).as("cum_value_share"))
      .orderBy("decile")
  }

  /** Fisher z closing texts: r from exact moments, z = ½ln((1+r)/(1−r)),
    * CI = tanh(z ± 1.96/√(n−3)). */
  private val fzR =
    "((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / " +
      "(sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * " +
      "sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)))"
  private val fzZ = s"(0.5 * ln((1e0 + $fzR) / (1e0 - $fzR)))"
  /** tanh spelled via exp — DuckDB ships no tanh; one shared text. */
  private def fzTanh(a: String): String =
    s"((exp(2 * $a) - 1e0) / (exp(2 * $a) + 1e0))"
  private val fzLo = fzTanh(s"($fzZ - 1.96 / sqrt(CAST(n - 3 AS DOUBLE)))")
  private val fzHi = fzTanh(s"($fzZ + 1.96 / sqrt(CAST(n - 3 AS DOUBLE)))")

  /** M193: FISHER-Z CI — per event_type, the daily count↔cent-volume
    * Pearson r with its 95% interval; excludes_zero flags the
    * correlations the interval certifies.
    *
    * Scale shape: one daily hash agg, one per-type moment agg over
    * the calendar-bounded grid, a 5-row closing formula.
    */
  val m193FisherZCi: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"), sum("c").as("y"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("x * y")).as("sxy"))
      .select(col("event_type"), col("n").as("n_days"),
        r4(expr(fzR)).as("r"),
        r4(expr(fzLo)).as("ci_lo"),
        r4(expr(fzHi)).as("ci_hi"),
        expr(s"$fzLo > 0 OR $fzHi < 0").as("excludes_zero"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "a43_lorenz_curve" -> a43LorenzCurve,
    "m193_fisher_z_ci" -> m193FisherZCi)

  val oracleSql: Map[String, String] = Map(
    "a43_lorenz_curve" ->
      """WITH ranked AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    row_number() OVER (
        |      ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
        |        o_orderkey) - 1 AS rid
        |  FROM orders),
        |n AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS tot FROM ranked),
        |bydec AS (
        |  SELECT (rid * 10) // n.n AS decile, n.n, n.tot,
        |    CAST(count(*) AS BIGINT) AS n_d,
        |    CAST(sum(cents) AS BIGINT) AS c_d
        |  FROM ranked CROSS JOIN n GROUP BY 1, 2, 3)
        |SELECT decile, n_d,
        |  round(CAST(sum(n_d) OVER w AS DOUBLE) / n, 4) AS cum_pop_share,
        |  round(CAST(sum(c_d) OVER w AS DOUBLE) / tot, 4)
        |    AS cum_value_share
        |FROM bydec
        |WINDOW w AS (ORDER BY decile)
        |ORDER BY decile""".stripMargin,
    "m193_fisher_z_ci" ->
      s"""WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |  round($fzR, 4) AS r,
        |  round($fzLo, 4) AS ci_lo,
        |  round($fzHi, 4) AS ci_hi,
        |  $fzLo > 0 OR $fzHi < 0 AS excludes_zero
        |FROM m ORDER BY event_type""".stripMargin)
}
