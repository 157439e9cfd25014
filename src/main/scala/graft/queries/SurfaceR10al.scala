package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 38: scorecard + importance-sampling
  * diagnostics — weight of evidence / information value (the
  * credit-scorecard feature screen) and the effective sample size of
  * an importance-weighted corpus.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.12–§2.13.
  */
object SurfaceR10al extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M117: weight of evidence / information value ----

  private val woeSql =
    "ln(((CAST(ng AS DOUBLE) + 0.5) / (ng_tot + 0.5)) / ((CAST(nb AS DOUBLE) + 0.5) / (nb_tot + 0.5)))"
  private val ivTermSql =
    s"(((CAST(ng AS DOUBLE) + 0.5) / (ng_tot + 0.5) - (CAST(nb AS DOUBLE) + 0.5) / (nb_tot + 0.5)) * $woeSql)"

  /** M117: WoE + IV — per price bucket, the weight of evidence of the
    * finalized outcome (add-½ smoothed so empty cells stay finite,
    * smoothing stated in the output convention), and the information
    * value summed as a TOTAL row. m78's mutual information measures
    * the same association symmetrically; WoE is the per-bucket,
    * signed, scorecard-native form (IV < 0.02 = drop the feature,
    * > 0.3 = strong — the banker's rule of thumb). Exact counts; one
    * ln per bucket. */
  val m117WoeIv: Q = (s, d) => {
    val cells = orders(s, d)
      .select(least(floor(col("o_totalprice") / 50000).cast("long"), lit(9L))
        .as("bucket"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("g"))
      .groupBy("bucket")
      .agg(sum("g").as("ng"), sum(expr("1 - g")).as("nb"))
    val tot = cells.agg(sum("ng").as("ng_tot"), sum("nb").as("nb_tot"))
    val perBucket = cells.crossJoin(broadcast(tot))
      .select(col("bucket").cast("string").as("bucket"),
        col("ng"), col("nb"),
        r4(expr(woeSql)).as("woe"))
    val iv = cells.crossJoin(broadcast(tot))
      .agg(sum("ng").as("ng"), sum("nb").as("nb"),
        sum(expr(ivTermSql)).as("iv_raw"))
      .select(lit("TOTAL_IV").as("bucket"), col("ng"), col("nb"),
        r4(col("iv_raw")).as("woe"))
    perBucket.unionAll(iv).orderBy("bucket")
  }

  // ---- LP54: effective sample size ----

  private val essSql =
    "((CAST(s1 AS DOUBLE) * s1) / s2)"

  /** LP54: EFFECTIVE SAMPLE SIZE — if documents are sampled with
    * probability proportional to length (the w=n_chars importance
    * scheme lp20 draws from), Kish's ESS = (Σw)²/Σw² says how many
    * equally-weighted documents the weighted corpus is actually worth
    * — the number that decides whether a weighting scheme has
    * quietly collapsed the corpus onto its longest docs. Integer
    * weights, two exact power sums, one division. */
  val lp54EffectiveSampleSize: Q = (s, d) =>
    documents(s, d)
      .select(col("n_chars").cast("long").as("w"))
      .agg(count(lit(1)).as("n"), sum("w").as("s1"),
        sum(expr("w * w")).as("s2"))
      .select(col("n"),
        r4(expr(essSql)).as("ess"),
        r4(expr(s"$essSql / n")).as("ess_ratio"))

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m117_woe_iv" -> m117WoeIv,
    "lp54_effective_sample_size" -> lp54EffectiveSampleSize)

  val oracleSql: Map[String, String] = Map(
    "m117_woe_iv" ->
      s"""WITH cells AS (
        |  SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS ng,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS nb
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS ng_tot,
        |               CAST(sum(nb) AS BIGINT) AS nb_tot FROM cells)
        |SELECT CAST(bucket AS VARCHAR) AS bucket, ng, nb,
        |  round($woeSql, 4) AS woe
        |FROM cells CROSS JOIN tot
        |UNION ALL
        |SELECT 'TOTAL_IV', CAST(sum(ng) AS BIGINT), CAST(sum(nb) AS BIGINT),
        |  round(sum($ivTermSql), 4)
        |FROM cells CROSS JOIN tot
        |ORDER BY bucket""".stripMargin,
    "lp54_effective_sample_size" ->
      s"""WITH agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS s1,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
        |  FROM documents)
        |SELECT n, round($essSql, 4) AS ess,
        |  round($essSql / n, 4) AS ess_ratio
        |FROM agg""".stripMargin)
}
