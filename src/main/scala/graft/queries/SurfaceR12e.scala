package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-12 surface batch 5: two ROBUST estimators the registry lacked —
  *
  *  - m209 HUBER REGRESSION by IRLS, exact-replay-oracled: m60/m210 fit
  *    plain OLS (every point weighs its squared error), m207 adds L1
  *    sparsity, lt78 is robust but for SERIES trend only; m209 is the
  *    robust TABULAR regression — Huber's loss downweights each row by
  *    δ/|r| beyond the threshold, fitted by 2 reweighted-least-squares
  *    rounds. The entire iteration is replayed by the oracle: weights
  *    are exact INTEGER ratios (⌊δ·10⁴/|r|⌋ — no float weight exists at
  *    all), weighted moments are 128-bit integer sums, and each round's
  *    slope/intercept re-enter on the 1e-4 fixed-point grid (the
  *    m204/m207 discipline, here with the cleaner all-integer weight).
  *  - lt82 HAMPEL FILTER: the standard robust series CLEANER — rolling
  *    window (±3 days), replace a point farther than 3 MADs from the
  *    window median. w11's moving median SMOOTHS everything; m28's MAD
  *    fence is GLOBAL per group; only the Hampel form localizes the
  *    fence, which is what de-spiking telemetry actually uses. All
  *    medians are DOUBLED integer order statistics (sum of the two
  *    middle elements), so the outlier test 2·|2x−dmed| > 3·dmad is
  *    exact integer arithmetic with no halves anywhere.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (robust statistics; time series).
  */
object SurfaceR12e extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M209: Huber IRLS, shared-text SQL ----

  /** δ = 2000 dollars in residual units (1e-6 dollars): beyond this
    * absolute residual a row's weight falls off as δ/|r|. */
  private val QDELTA = 2000000000L
  private val ROUNDS = 2

  /** The whole IRLS chain as ONE SQL text, shared verbatim between
    * engines except three dialect tokens: {BIG} (DECIMAL(38,0) vs
    * HUGEINT — BIGINT moment products overflow past sf0.1 and the
    * double form risks §5.3 FMA contraction), {IDIV} (`div` vs `//`),
    * and {MAT} (DuckDB-only CTE materialization — each round's 1-row
    * param CTE is re-referenced and must not re-expand the scan
    * chain). */
  private def huberSql(table: String, big: String, idiv: String,
      mat: String): String = {
    def params(src: String, n: String, sx: String, sy: String,
        sxy: String, sxx: String): String =
      s"""SELECT qb,
         |  CAST(floor(CAST(CAST($sy AS $big) * 10000 - CAST(qb AS $big) * $sx
         |    AS DOUBLE) / $n + 0.5) AS BIGINT) AS qa
         |FROM (SELECT
         |  CAST(floor(CAST(CAST($n AS $big) * $sxy
         |      - CAST($sx AS $big) * CAST($sy AS $big) AS DOUBLE)
         |    / CAST(CAST($n AS $big) * CAST($sxx AS $big)
         |      - CAST($sx AS $big) * CAST($sx AS $big) AS DOUBLE)
         |    * 10000 + 0.5) AS BIGINT) AS qb,
         |  $sy, $sx, $n FROM $src)""".stripMargin
    val rounds = (1 to ROUNDS).map { t =>
      s"""w$t AS (
         |  SELECT b.l_returnflag, b.x, b.y2,
         |    CASE WHEN abs(b.y2 * 10000 - (p.qa + p.qb * b.x)) <= $QDELTA
         |      THEN CAST(10000 AS BIGINT)
         |      ELSE ${QDELTA}0000 $idiv abs(b.y2 * 10000 - (p.qa + p.qb * b.x))
         |    END AS qw
         |  FROM base b CROSS JOIN p${t - 1} p),
         |wm$t AS (
         |  SELECT CAST(sum(qw) AS BIGINT) AS sw,
         |    CAST(sum(qw * x) AS BIGINT) AS swx,
         |    CAST(sum(qw * y2) AS BIGINT) AS swy,
         |    sum(CAST(qw AS $big) * x * y2) AS swxy,
         |    CAST(sum(qw * x * x) AS BIGINT) AS swxx
         |  FROM w$t),
         |p$t AS $mat(
         |${params(s"wm$t", "sw", "swx", "swy", "swxy", "swxx")})""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
       |    CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS y2
       |  FROM $table),
       |mom0 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y2) AS BIGINT) AS sy, CAST(sum(x * y2) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM base),
       |p0 AS $mat(
       |${params("mom0", "n", "sx", "sy", "sxy", "sxx")}),
       |$rounds,
       |fin AS (
       |  SELECT b.l_returnflag,
       |    abs(b.y2 * 10000 - (p.qa + p.qb * b.x)) AS a,
       |    CASE WHEN abs(b.y2 * 10000 - (p.qa + p.qb * b.x)) <= $QDELTA
       |      THEN 1 ELSE 0 END AS full_weight,
       |    p.qb, p.qa
       |  FROM base b CROSS JOIN p$ROUNDS p)
       |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       |  round(CAST(count(*) - sum(full_weight) AS DOUBLE) / count(*), 4)
       |    AS frac_downweighted,
       |  round(CAST(min(qb) AS DOUBLE) / 1000000.0, 4) AS slope,
       |  round(CAST(min(qa) AS DOUBLE) / 1000000.0, 4) AS intercept,
       |  round(CAST(sum(a) AS DOUBLE) / (count(*) * 1000000.0), 4)
       |    AS mean_abs_resid
       |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val m209HuberIrls: Q = (s, d) => {
    lineitem(s, d).createOrReplaceTempView("graft_r12_lineitem")
    s.sql(huberSql("graft_r12_lineitem", "DECIMAL(38,0)", "div", ""))
  }

  // ---- LT82: Hampel filter ----

  /** Doubled median of a sorted integer array expression (1-based
    * element_at on Spark): sa[(n+1) div 2] + sa[(n+2) div 2]. */
  val lt82Hampel: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))" +
        " AS DOUBLE) / count(*) + 0.5) AS BIGINT)").as("qv"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    daily
      .withColumn("arr", sort_array(collect_list(col("qv")).over(w)))
      .withColumn("nw", size(col("arr")).cast("long"))
      .withColumn("dmed",
        expr("element_at(arr, CAST((nw + 1) div 2 AS INT))" +
          " + element_at(arr, CAST((nw + 2) div 2 AS INT))"))
      .withColumn("dv",
        expr("sort_array(transform(arr, e -> abs(2 * e - dmed)))"))
      .withColumn("dmad",
        expr("element_at(dv, CAST((nw + 1) div 2 AS INT))" +
          " + element_at(dv, CAST((nw + 2) div 2 AS INT))"))
      .withColumn("is_outlier",
        expr("2 * abs(2 * qv - dmed) > 3 * dmad"))
      .select(col("event_type"), col("day"),
        r4(col("qv").cast("double") / 1000000.0d).as("value"),
        r4(col("dmed").cast("double") / 2000000.0d).as("window_median"),
        col("is_outlier"),
        r4(when(col("is_outlier"), col("dmed").cast("double") / 2000000.0d)
          .otherwise(col("qv").cast("double") / 1000000.0d)).as("cleaned"))
      .orderBy("event_type", "day")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m209_huber_irls" -> m209HuberIrls,
    "lt82_hampel" -> lt82Hampel)

  val oracleSql: Map[String, String] = Map(
    "m209_huber_irls" ->
      huberSql("lineitem", "HUGEINT", "//", "MATERIALIZED "),
    "lt82_hampel" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
        |      AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS qv
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, day, qv,
        |    list_sort(list(qv) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
        |  FROM daily),
        |med AS (
        |  SELECT event_type, day, qv, arr,
        |    arr[(len(arr) + 1) // 2] + arr[(len(arr) + 2) // 2] AS dmed
        |  FROM win),
        |mad AS (
        |  SELECT event_type, day, qv, dmed,
        |    list_sort(list_transform(arr, e -> abs(2 * e - dmed))) AS dv
        |  FROM med),
        |fin AS (
        |  SELECT event_type, day, qv, dmed,
        |    dv[(len(dv) + 1) // 2] + dv[(len(dv) + 2) // 2] AS dmad
        |  FROM mad)
        |SELECT event_type, day,
        |  round(CAST(qv AS DOUBLE) / 1000000.0, 4) AS value,
        |  round(CAST(dmed AS DOUBLE) / 2000000.0, 4) AS window_median,
        |  2 * abs(2 * qv - dmed) > 3 * dmad AS is_outlier,
        |  round(CASE WHEN 2 * abs(2 * qv - dmed) > 3 * dmad
        |    THEN CAST(dmed AS DOUBLE) / 2000000.0
        |    ELSE CAST(qv AS DOUBLE) / 1000000.0 END, 4) AS cleaned
        |FROM fin ORDER BY event_type, day""".stripMargin)
}
