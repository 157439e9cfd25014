package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.TextOps

/** Round-10 surface batch 20: equivalence/power inference + pipeline
  * audits — TOST equivalence (the "prove it did NOT change" test),
  * language-ID confusion matrix (evaluating lg's heuristic against
  * fixture truth), shard-skew report (is the output layout balanced),
  * statistical power requirement, and template-prefix detection
  * (boilerplate families by shared document head).
  *
  * Float discipline per SurfaceR10l.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11–§2.13.
  */
object SurfaceR10t extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M91: TOST equivalence test ----

  private val seSql = "sqrt(v1 / n1 + v2 / n2)"
  private val diffSql = "(m1 - m2)"

  /** M91: TOST EQUIVALENCE — two one-sided tests against a ±5000
    * margin on the F-vs-O order-total means: a significant m74 t-test
    * says "different"; TOST is the only way to conclude "equivalent
    * within the margin" (both one-sided t's must clear the 5%
    * critical value 1.645). The test every no-regression gate on a
    * metric actually needs. Same single-aggregate plan as m74. */
  val m91Tost: Q = (s, d) =>
    orders(s, d)
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n1"),
        count(when(col("o_orderstatus") === "O", 1)).as("n2"),
        avg(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("m1"),
        avg(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("m2"),
        var_samp(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("v1"),
        var_samp(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("v2"))
      .select(col("n1"), col("n2"),
        r4(expr(diffSql)).as("mean_diff"),
        r4(expr(s"($diffSql + 5000.0) / $seSql")).as("t_lower"),
        r4(expr(s"(5000.0 - $diffSql) / $seSql")).as("t_upper"),
        expr(s"($diffSql + 5000.0) / $seSql > 1.645 AND " +
          s"(5000.0 - $diffSql) / $seSql > 1.645").as("equivalent"))

  // ---- LT29: language-ID confusion matrix ----

  private val recallSql = "(CAST(n AS DOUBLE) / n_actual)"

  /** LT29: LANGID CONFUSION MATRIX — lg's stopword-argmax heuristic
    * evaluated against the fixture's true language label: (actual,
    * predicted) counts with per-actual recall share. The evaluation
    * row that belongs next to any heuristic classifier in production —
    * lg tells you the prediction, this tells you when to trust it
    * (zh has no stopword list, so it should land in 'und' or false
    * hits — the matrix shows exactly where). Two hash aggs. */
  val lt29LangidConfusion: Q = (s, d) => {
    val pred = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("lang"), TextOps.langIdPredict(col("toks")).as("predicted"))
    val cells = pred.groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
    val act = cells.groupBy("lang").agg(sum("n").as("n_actual"))
    cells.join(broadcast(act), "lang")
      .select(col("lang"), col("predicted"), col("n"),
        r4(expr(recallSql)).as("share"))
      .orderBy("lang", "predicted")
  }

  // ---- LP41: shard-skew report ----

  private val skewCvSql =
    "(sqrt(CAST(ns AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) / s1)"
  private val skewMaxMeanSql =
    "(CAST(mx AS DOUBLE) * ns / s1)"

  /** LP41: SHARD-SKEW REPORT — for the lp6 md5-nibble sharding, one
    * audit row: shard count, min/max/mean sizes, max/mean ratio and
    * the coefficient of variation from exact power sums. The check
    * run after every large write: a layout whose max/mean creeps past
    * ~1.5 has a straggler shard, and the fix (salting, finer nibbles)
    * happens BEFORE the next job reads it. Aggregate-of-aggregate,
    * all counts exact. */
  val lp41ShardSkew: Q = (s, d) => {
    val sizes = documents(s, d)
      .select(substring(md5(col("text")), 1, 1).as("shard"))
      .groupBy("shard").agg(count(lit(1)).as("sz"))
    sizes.agg(count(lit(1)).as("ns"), sum("sz").as("s1"),
        sum(expr("sz * sz")).as("s2"),
        min("sz").as("mn"), max("sz").as("mx"))
      .select(col("ns").as("n_shards"), col("s1").as("n_docs"),
        col("mn").as("min_sz"), col("mx").as("max_sz"),
        r4(expr(skewMaxMeanSql)).as("max_over_mean"),
        r4(expr(skewCvSql)).as("cv"))
  }

  // ---- M93: power analysis ----

  private val pooledVarSql =
    "(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))"
  private val powerNSql =
    s"(2.0 * (1.96 + 0.8416) * (1.96 + 0.8416) * $pooledVarSql / (2500.0 * 2500.0))"

  /** M93: POWER ANALYSIS — per-group sample size required to detect a
    * 2500-unit difference in mean order total at α=0.05 (two-sided)
    * with 80% power: n = 2(z₀.₉₇₅+z₀.₈)²σ̂²/Δ², σ̂² pooled from the two
    * status groups. The planning number quoted before launching any
    * experiment; reported as the raw float requirement (the ⌈·⌉ is the
    * caller's — an integer output could flip ±1 on a last-ulp
    * boundary, violating §5.3). Same one-aggregate plan as m74. */
  val m93PowerAnalysis: Q = (s, d) =>
    orders(s, d)
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n1"),
        count(when(col("o_orderstatus") === "O", 1)).as("n2"),
        var_samp(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("v1"),
        var_samp(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("v2"))
      .select(col("n1"), col("n2"),
        r4(expr(pooledVarSql)).as("pooled_var"),
        r4(expr(powerNSql)).as("n_required"))

  // ---- LT30: template-prefix detection ----

  /** LT30: TEMPLATE PREFIXES — families of documents sharing their
    * first five tokens (the "generated from one boilerplate header"
    * signal lt23 sees per-doc; this groups the families and counts how
    * many sources each spans — a family spanning many sources is a
    * syndicated template, not a site quirk). One narrow projection +
    * hash agg keyed by the prefix string. */
  val lt30TemplatePrefix: Q = (s, d) =>
    documents(s, d)
      .withColumn("tk", split(col("text"), " "))
      .where(size(col("tk")) >= 5)
      .select(expr("concat_ws(' ', tk[0], tk[1], tk[2], tk[3], tk[4])")
        .as("prefix"), col("source"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"))
      .where(col("n_docs") >= 2)
      .orderBy("prefix")

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m91_tost" -> m91Tost,
    "lt29_langid_confusion" -> lt29LangidConfusion,
    "lp41_shard_skew" -> lp41ShardSkew,
    "m93_power_analysis" -> m93PowerAnalysis,
    "lt30_template_prefix" -> lt30TemplatePrefix)

  val oracleSql: Map[String, String] = Map(
    "m91_tost" ->
      s"""WITH a AS (
        |  SELECT
        |    CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n1,
        |    CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n2,
        |    avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS m1,
        |    avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS m2,
        |    var_samp(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS v1,
        |    var_samp(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS v2
        |  FROM orders)
        |SELECT n1, n2, round($diffSql, 4) AS mean_diff,
        |  round(($diffSql + 5000.0) / $seSql, 4) AS t_lower,
        |  round((5000.0 - $diffSql) / $seSql, 4) AS t_upper,
        |  ($diffSql + 5000.0) / $seSql > 1.645 AND
        |  (5000.0 - $diffSql) / $seSql > 1.645 AS equivalent
        |FROM a""".stripMargin,
    "lt29_langid_confusion" ->
      s"""WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
        |h AS (SELECT lang,
        |  len(list_intersect(toks, ['the','a','of','and','to'])) AS h_en,
        |  len(list_intersect(toks, ['der','die','das','und','zu'])) AS h_de,
        |  len(list_intersect(toks, ['el','la','de','y','que'])) AS h_es,
        |  len(list_intersect(toks, ['le','la','de','et','que'])) AS h_fr
        | FROM t),
        |p AS (SELECT lang,
        |  CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
        |       WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
        |       WHEN h_de = greatest(h_en, h_de, h_es, h_fr) THEN 'de'
        |       WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
        |       ELSE 'fr' END AS predicted
        | FROM h),
        |cells AS (
        |  SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
        |  FROM p GROUP BY 1, 2),
        |act AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_actual
        |        FROM cells GROUP BY lang)
        |SELECT lang, predicted, n, round($recallSql, 4) AS share
        |FROM cells JOIN act USING (lang)
        |ORDER BY lang, predicted""".stripMargin,
    "lp41_shard_skew" ->
      s"""WITH sizes AS (
        |  SELECT substr(md5(text), 1, 1) AS shard,
        |    CAST(count(*) AS BIGINT) AS sz
        |  FROM documents GROUP BY shard),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS ns, CAST(sum(sz) AS BIGINT) AS s1,
        |    CAST(sum(sz * sz) AS BIGINT) AS s2,
        |    CAST(min(sz) AS BIGINT) AS mn, CAST(max(sz) AS BIGINT) AS mx
        |  FROM sizes)
        |SELECT ns AS n_shards, s1 AS n_docs, mn AS min_sz, mx AS max_sz,
        |  round($skewMaxMeanSql, 4) AS max_over_mean,
        |  round($skewCvSql, 4) AS cv
        |FROM agg""".stripMargin,
    "m93_power_analysis" ->
      s"""WITH a AS (
        |  SELECT
        |    CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n1,
        |    CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n2,
        |    var_samp(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS v1,
        |    var_samp(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS v2
        |  FROM orders)
        |SELECT n1, n2, round($pooledVarSql, 4) AS pooled_var,
        |  round($powerNSql, 4) AS n_required
        |FROM a""".stripMargin,
    "lt30_template_prefix" ->
      """WITH p AS (
        |  SELECT tk[1] || ' ' || tk[2] || ' ' || tk[3] || ' ' || tk[4]
        |      || ' ' || tk[5] AS prefix, source
        |  FROM (SELECT string_split(text, ' ') AS tk, source FROM documents
        |        WHERE len(string_split(text, ' ')) >= 5))
        |SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM p GROUP BY prefix HAVING count(*) >= 2
        |ORDER BY prefix""".stripMargin)
}
