package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 75: checksum-grade PII filtering +
  * count-model diagnostics — the LUHN CHECK (lt15 redacts by regex
  * SHAPE; production PII scanners validate the checksum before
  * flagging a 16-digit string as a real card number — this is that
  * digit-doubling mod-10 validation as a higher-order function over
  * deterministic candidates), and the POISSON DISPERSION TEST (is
  * daily order volume really Poisson, or overdispersed? m158's rate
  * test ASSUMES Poisson; this measures the assumption: D = s²/x̄ and
  * the χ² index Σ(y−ȳ)²/ȳ, both exact-integer closed forms). The
  * Luhn fold is integer arithmetic per row; the oracle states the
  * same fold in DuckDB list algebra — same math, independently
  * expressed.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.9 (text/PII ops), §2.13 (statistics).
  */
object SurfaceR10bw extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT50: Luhn check ----

  private val luhnDigit =
    "CAST(substring(cc, j + 1, 1) AS INT)"
  private val luhnSum =
    s"aggregate(sequence(0, 15), 0, (acc, j) -> acc + " +
      s"CASE WHEN j % 2 = 0 THEN IF(2 * $luhnDigit > 9, 2 * $luhnDigit - 9, 2 * $luhnDigit) " +
      s"ELSE $luhnDigit END)"

  /** LT50: LUHN CHECK — zero-pad each order key to a 16-digit
    * candidate and validate the Luhn mod-10 checksum (double every
    * second digit from the right, subtract 9 above 9, sum ≡ 0).
    * Per priority: candidates, checksum-valid count (≈10% by number
    * theory), and the rate. Narrow per-row integer fold. */
  val lt50LuhnCheck: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr("lpad(CAST(o_orderkey AS STRING), 16, '0')").as("cc"))
      .withColumn("ok",
        when(expr(s"$luhnSum % 10") === 0, 1L).otherwise(0L))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("ok").as("n_valid"))
      .select(col("grp"), col("n"), col("n_valid"),
        r4(expr("CAST(n_valid AS DOUBLE) / n")).as("valid_rate"))
      .orderBy("grp")

  // ---- M159: Poisson dispersion ----

  private val dspChi2 =
    "((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) / s1)"
  private val dspD =
    "((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) / ((CAST(n AS DOUBLE) - 1) * s1))"

  /** M159: POISSON DISPERSION — χ² index Σ(y−ȳ)²/ȳ (≈ n−1 under
    * Poisson) and the variance-to-mean ratio D of the daily counts,
    * from three exact integer sums. D ≫ 1 means m158-style Poisson
    * inference understates uncertainty. */
  val m159DispersionTest: Q = (s, d) =>
    orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .agg(count(lit(1)).as("n"), sum("y").as("s1"),
        sum(col("y") * col("y")).as("s2"))
      .select(col("n").as("n_days"),
        r4(expr(dspChi2)).as("chi2"),
        (col("n") - 1L).as("df"),
        r4(expr(dspD)).as("dispersion"),
        expr(s"CAST(CASE WHEN $dspD > 12e-1 THEN 1 ELSE 0 END AS BIGINT)")
          .as("overdispersed_flag"))

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt50_luhn_check" -> lt50LuhnCheck,
    "m159_dispersion_test" -> m159DispersionTest)

  val oracleSql: Map[String, String] = Map(
    "lt50_luhn_check" ->
      """WITH cands AS (
        |  SELECT o_orderpriority AS grp,
        |    lpad(CAST(o_orderkey AS VARCHAR), 16, '0') AS cc
        |  FROM orders),
        |checked AS (
        |  SELECT grp,
        |    CASE WHEN list_sum(list_transform(range(0, 16), j ->
        |      CASE WHEN j % 2 = 0 THEN
        |        CASE WHEN 2 * CAST(substring(cc, CAST(j + 1 AS INT), 1) AS INT) > 9
        |          THEN 2 * CAST(substring(cc, CAST(j + 1 AS INT), 1) AS INT) - 9
        |          ELSE 2 * CAST(substring(cc, CAST(j + 1 AS INT), 1) AS INT) END
        |      ELSE CAST(substring(cc, CAST(j + 1 AS INT), 1) AS INT) END)) % 10 = 0
        |    THEN 1 ELSE 0 END AS ok
        |  FROM cands)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(ok) AS BIGINT) AS n_valid,
        |  round(CAST(sum(ok) AS DOUBLE) / count(*), 4) AS valid_rate
        |FROM checked
        |GROUP BY grp
        |ORDER BY grp""".stripMargin,
    "m159_dispersion_test" ->
      s"""WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS s1,
        |    CAST(sum(y * y) AS BIGINT) AS s2
        |  FROM daily)
        |SELECT n AS n_days,
        |  round($dspChi2, 4) AS chi2,
        |  CAST(n - 1 AS BIGINT) AS df,
        |  round($dspD, 4) AS dispersion,
        |  CAST(CASE WHEN $dspD > 12e-1 THEN 1 ELSE 0 END AS BIGINT) AS overdispersed_flag
        |FROM sums""".stripMargin)
}
