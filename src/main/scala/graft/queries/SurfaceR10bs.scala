package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 71: conditional dependence — PARTIAL
  * CORRELATION (is daily order count related to daily revenue AFTER
  * removing the shared time trend? the raw Pearson (a7) conflates
  * the two), and LAGGED MUTUAL INFORMATION (how much does yesterday's
  * volume bin tell you about today's, in nats — sees nonlinear
  * day-to-day structure the linear ACF (lt11) cannot). Partial r is a
  * closed form over ten exact integer sums (kilodollar totals, the
  * m118 overflow discipline); MI runs on a 4×4 exact contingency
  * table of SAX-style volume bins with the 16 p·ln terms pinned by an
  * ordered cumsum.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (statistics/series), siblings a7/lt11/lt48.
  */
object SurfaceR10bs extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private def daily(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"),
        expr("CAST(floor(o_totalprice / 1000) AS BIGINT)").as("kd"))
      .groupBy("t")
      .agg(count(lit(1)).as("y"), sum("kd").as("z"))

  // ---- M155: partial correlation ----

  private def r(u: String, v: String, uv: String) =
    s"((n * CAST($uv AS DOUBLE) - CAST(s$u AS DOUBLE) * s$v) / " +
      s"(sqrt(n * CAST(s$u$u AS DOUBLE) - CAST(s$u AS DOUBLE) * s$u) * " +
      s"sqrt(n * CAST(s$v$v AS DOUBLE) - CAST(s$v AS DOUBLE) * s$v)))"
  private val rYZ = r("y", "z", "syz")
  private val rYT = r("y", "t", "sty")
  private val rZT = r("z", "t", "stz")
  private val partial =
    s"(($rYZ - $rYT * $rZT) / sqrt((1e0 - $rYT * $rYT) * (1e0 - $rZT * $rZT)))"

  /** M155: PARTIAL CORRELATION — r(count, kilodollars | day). All ten
    * sums exact BIGINT in ONE hash-agg pass over the bounded daily
    * table; partial r via the standard recursion formula, one shared
    * text. */
  val m155PartialCorrelation: Q = (s, d) =>
    daily(s, d).agg(
      count(lit(1)).as("n"),
      sum("t").as("st"), sum("y").as("sy"), sum("z").as("sz"),
      sum(expr("t * t")).as("stt"),
      sum(expr("y * y")).as("syy"),
      sum(expr("z * z")).as("szz"),
      sum(expr("t * y")).as("sty"),
      sum(expr("t * z")).as("stz"),
      sum(expr("y * z")).as("syz"))
      .select(col("n").as("n_days"),
        r4(expr(rYZ)).as("r_count_revenue"),
        r4(expr(rYT)).as("r_count_time"),
        r4(expr(rZT)).as("r_revenue_time"),
        r4(expr(partial)).as("partial_r"))

  // ---- LT49: lagged mutual information ----

  private val miMu = "(CAST(s1 AS DOUBLE) / nd)"
  private val miSd =
    "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nd) / (nd - 1))"
  private val miZ = s"((y - $miMu) / $miSd)"
  private val miBin =
    s"(CASE WHEN $miZ < -6745e-4 THEN 0 WHEN $miZ < 0e0 THEN 1 " +
      s"WHEN $miZ < 6745e-4 THEN 2 ELSE 3 END)"

  /** LT49: LAGGED MI — bin the standardized daily count into 4 SAX
    * bins (shared z formula), build the exact (bin_today,
    * bin_yesterday) 4×4 table over consecutive present days, and
    * report MI = Σ (c/N)·ln(c·N/(r·s)) with margins from exact
    * counts, the signed cell terms accumulated in bin order and read
    * off the last cell (pinned). */
  val lt49LaggedMi: Q = (s, d) => {
    val dl = daily(s, d)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key)
    val wOrd = Windows.bounded(col("t"))
    val binned = dl
      .withColumn("nd", count(lit(1)).over(wAll))
      .withColumn("s1", sum("y").over(wAll))
      .withColumn("s2", sum(col("y") * col("y")).over(wAll))
      .withColumn("b", expr(miBin))
      .withColumn("bp", lag("b", 1).over(wOrd))
      .where(col("bp").isNotNull)
    val cells = binned.groupBy("b", "bp").agg(count(lit(1)).as("c"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key, col("b"))
    val wBp = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key, col("bp"))
    val wCum = Windows.bounded(col("b"), col("bp"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cells
      .withColumn("nn", sum("c").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key)))
      .withColumn("rm", sum("c").over(wB))
      .withColumn("cm", sum("c").over(wBp))
      .withColumn("term", expr(
        "(CAST(c AS DOUBLE) / nn) * ln(CAST(c AS DOUBLE) * nn / (CAST(rm AS DOUBLE) * cm))"))
      .withColumn("cterm", sum("term").over(wCum))
      // MI cell terms are signed: pick the LAST cumsum value (cell
      // order pins the addition order), not the max.
      .agg(max("nn").as("n_pairs"),
        expr("max_by(cterm, b * 4 + bp)").as("mi"),
        count(lit(1)).as("n_cells"))
      .select(col("n_pairs"), col("n_cells"),
        r4(col("mi")).as("mi_nats"),
        r4(expr("mi / ln(4e0)")).as("mi_normalized"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m155_partial_correlation" -> m155PartialCorrelation,
    "lt49_lagged_mi" -> lt49LaggedMi)

  private val dailySql =
    """SELECT CAST(date_diff('day', DATE '1992-01-01',
      |    CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
      |  CAST(count(*) AS BIGINT) AS y,
      |  CAST(sum(CAST(floor(o_totalprice / 1000) AS BIGINT)) AS BIGINT) AS z
      |FROM orders GROUP BY 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "m155_partial_correlation" ->
      s"""WITH daily AS ($dailySql),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(z) AS BIGINT) AS sz,
        |    CAST(sum(t * t) AS BIGINT) AS stt,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(z * z) AS BIGINT) AS szz,
        |    CAST(sum(t * y) AS BIGINT) AS sty,
        |    CAST(sum(t * z) AS BIGINT) AS stz,
        |    CAST(sum(y * z) AS BIGINT) AS syz
        |  FROM daily)
        |SELECT n AS n_days,
        |  round($rYZ, 4) AS r_count_revenue,
        |  round($rYT, 4) AS r_count_time,
        |  round($rZT, 4) AS r_revenue_time,
        |  round($partial, 4) AS partial_r
        |FROM sums""".stripMargin,
    "lt49_lagged_mi" ->
      s"""WITH daily AS ($dailySql),
        |tot AS (
        |  SELECT t, y,
        |    CAST(count(*) OVER () AS BIGINT) AS nd,
        |    CAST(sum(y) OVER () AS BIGINT) AS s1,
        |    CAST(sum(y * y) OVER () AS BIGINT) AS s2
        |  FROM daily),
        |binned AS (
        |  SELECT t, $miBin AS b,
        |    lag($miBin, 1) OVER (ORDER BY t) AS bp
        |  FROM tot),
        |cells AS (
        |  SELECT b, bp, CAST(count(*) AS BIGINT) AS c
        |  FROM binned WHERE bp IS NOT NULL GROUP BY 1, 2),
        |marged AS (
        |  SELECT b, bp, c,
        |    CAST(sum(c) OVER () AS BIGINT) AS nn,
        |    CAST(sum(c) OVER (PARTITION BY b) AS BIGINT) AS rm,
        |    CAST(sum(c) OVER (PARTITION BY bp) AS BIGINT) AS cm
        |  FROM cells),
        |cums AS (
        |  SELECT nn, b, bp,
        |    sum((CAST(c AS DOUBLE) / nn) * ln(CAST(c AS DOUBLE) * nn / (CAST(rm AS DOUBLE) * cm)))
        |      OVER (ORDER BY b, bp ROWS UNBOUNDED PRECEDING) AS cterm
        |  FROM marged)
        |SELECT CAST(max(nn) AS BIGINT) AS n_pairs,
        |  CAST(count(*) AS BIGINT) AS n_cells,
        |  round(max_by(cterm, b * 4 + bp), 4) AS mi_nats,
        |  round(max_by(cterm, b * 4 + bp) / ln(4e0), 4) AS mi_normalized
        |FROM cums""".stripMargin)
}
