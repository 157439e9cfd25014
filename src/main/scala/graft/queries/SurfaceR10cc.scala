package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 81: Mood's median test (k-group location via
  * dichotomy at the grand median) and temperature-scaled source mixing
  * weights (the multilingual/multi-source alpha-sampling formula).
  *
  * Contrast with near-siblings: Kruskal–Wallis (m138) compares FULL
  * rank distributions — powerful but sensitive to any shape
  * difference; Mood's test reduces each value to one bit (above the
  * grand median or not), trading power for robustness to outliers and
  * censoring — a genuinely different statistic (a k×2 chi-square on
  * counts), not a reparameterization. lp42's curriculum mix REPORTS
  * the quality×language composition; lp67 COMPUTES the sampling
  * weights w_s ∝ p_s^α that flatten a skewed source distribution —
  * the knob a trainer actually sets (α=1 proportional, α→0 uniform).
  *
  * Float discipline: counts and cent-quantized balances are exact
  * BIGINT; the grand median arrives as ONE broadcast scalar on the
  * DOUBLED axis (2·cents keeps the .5 interpolation exact); chi-square
  * terms and pow() shares ride ordered cumsums over the bounded group
  * axis (5 segments / 20 sources), never an unordered float sum.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (tests) and §2.11 (curation), siblings
  * m138/lp42.
  */
object SurfaceR10cc extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M167: MOOD'S MEDIAN TEST — is the account-balance median the
    * same across the five market segments? Dichotomize every customer
    * at the grand median (strictly above vs not, on the exact doubled
    * cents axis), then chi-square the k×2 contingency table. Expected
    * counts are fixed double formulas over exact integers; the 5 group
    * terms accumulate on one ordered cumsum. */
  val m167MoodMedian: Q = (s, d) => {
    val cust = customer(s, d).select(col("c_mktsegment").as("seg"),
      expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 2").as("q2"))
    val med = cust.agg(expr("percentile(q2, 0.5)").as("med2"))
    val grp = cust.crossJoin(broadcast(med))
      .groupBy("seg")
      .agg(count(lit(1)).as("ni"),
        sum(when(col("q2") > col("med2"), 1L).otherwise(0L)).as("ai"))
    val tot = grp.agg(sum("ni").as("nn"), sum("ai").as("aa"))
    val wCum = Windows.bounded(col("seg")).rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    grp.crossJoin(broadcast(tot))
      .withColumn("term", expr(
        "(ai - CAST(ni AS DOUBLE) * aa / nn) * (ai - CAST(ni AS DOUBLE) * aa / nn)" +
          " / (CAST(ni AS DOUBLE) * aa / nn)" +
          " + ((ni - ai) - CAST(ni AS DOUBLE) * (nn - aa) / nn)" +
          " * ((ni - ai) - CAST(ni AS DOUBLE) * (nn - aa) / nn)" +
          " / (CAST(ni AS DOUBLE) * (nn - aa) / nn)"))
      .withColumn("cterm", sum("term").over(wCum))
      .agg(count(lit(1)).as("k_groups"),
        max("nn").as("n_total"), max("aa").as("n_above"),
        r4(max("cterm")).as("mood_chi2"))
  }

  /** LP67: TEMPERATURE-SCALED MIXING WEIGHTS — per-source char-mass
    * shares p_s flattened to sampling weights w_s = p_s^α / Σ p_s^α at
    * α = 0.3 (the mT5-style temperature), plus the implied upsampling
    * factor w_s/p_s — how many effective epochs of each source one
    * proportional epoch of the mix consumes. Shares are exact-integer
    * divisions; the pow() normalizer is an ordered cumsum over the 20
    * bounded sources. */
  val lp67TemperatureMix: Q = (s, d) => {
    val mass = documents(s, d)
      .groupBy(col("source"))
      .agg(sum("n_chars").as("m"))
    val tot = mass.agg(sum("m").as("mt"))
    val wCum = Windows.bounded(col("source")).rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val cum = mass.crossJoin(broadcast(tot))
      .withColumn("p", expr("CAST(m AS DOUBLE) / mt"))
      .withColumn("pa", expr("pow(CAST(m AS DOUBLE) / mt, 0.3)"))
      .withColumn("cpa", sum("pa").over(wCum))
    val z = cum.agg(max("cpa").as("z"))
    cum.crossJoin(broadcast(z))
      .select(col("source"), col("m").as("char_mass"),
        r4(col("p")).as("share"),
        r4(expr("pa / z")).as("weight"),
        r4(expr("pa / z / p")).as("upsample"))
      .orderBy("source")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m167_mood_median" -> m167MoodMedian,
    "lp67_temperature_mix" -> lp67TemperatureMix)

  val oracleSql: Map[String, String] = Map(
    "m167_mood_median" ->
      """WITH cust AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 2 AS q2
        |  FROM customer),
        |med AS (SELECT quantile_cont(q2, 0.5) AS med2 FROM cust),
        |grp AS (
        |  SELECT seg, CAST(count(*) AS BIGINT) AS ni,
        |    CAST(sum(CASE WHEN q2 > med2 THEN 1 ELSE 0 END) AS BIGINT) AS ai
        |  FROM cust CROSS JOIN med GROUP BY seg),
        |tot AS (
        |  SELECT CAST(sum(ni) AS BIGINT) AS nn,
        |    CAST(sum(ai) AS BIGINT) AS aa FROM grp),
        |terms AS (
        |  SELECT seg, ni, ai, nn, aa,
        |    (ai - CAST(ni AS DOUBLE) * aa / nn) * (ai - CAST(ni AS DOUBLE) * aa / nn)
        |      / (CAST(ni AS DOUBLE) * aa / nn)
        |      + ((ni - ai) - CAST(ni AS DOUBLE) * (nn - aa) / nn)
        |      * ((ni - ai) - CAST(ni AS DOUBLE) * (nn - aa) / nn)
        |      / (CAST(ni AS DOUBLE) * (nn - aa) / nn) AS term
        |  FROM grp CROSS JOIN tot),
        |cum AS (
        |  SELECT nn, aa,
        |    sum(term) OVER (ORDER BY seg ROWS UNBOUNDED PRECEDING) AS cterm
        |  FROM terms)
        |SELECT CAST(count(*) AS BIGINT) AS k_groups,
        |  max(nn) AS n_total, max(aa) AS n_above,
        |  round(max(cterm), 4) AS mood_chi2
        |FROM cum""".stripMargin,
    "lp67_temperature_mix" ->
      """WITH mass AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS m
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(m) AS BIGINT) AS mt FROM mass),
        |terms AS (
        |  SELECT source, m,
        |    CAST(m AS DOUBLE) / mt AS p,
        |    pow(CAST(m AS DOUBLE) / mt, 0.3) AS pa
        |  FROM mass CROSS JOIN tot),
        |cum AS (
        |  SELECT source, m, p, pa,
        |    sum(pa) OVER (ORDER BY source ROWS UNBOUNDED PRECEDING) AS cpa
        |  FROM terms),
        |z AS (SELECT max(cpa) AS z FROM cum)
        |SELECT source, m AS char_mass,
        |  round(p, 4) AS share,
        |  round(pa / z, 4) AS weight,
        |  round(pa / z / p, 4) AS upsample
        |FROM cum CROSS JOIN z
        |ORDER BY source""".stripMargin)
}
