package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.PrefixSum

/** Round-10 surface batch 72: web-corpus string surface + ranking
  * uncertainty — the URL FUNCTION family (parse_url HOST/PATH/QUERY
  * and per-parameter extraction — the first thing a web-scrape
  * pipeline does to every document URL; Spark's parse_url is
  * exercised against a regex-stated oracle), and the HANLEY–McNEIL
  * CONFIDENCE INTERVAL for ROC-AUC (m32 reports the point estimate;
  * this adds the SE and 95% CI every model-eval report actually
  * ships). The AUC inherits m32's exact tie-handled Mann–Whitney
  * pipeline (PrefixSum cumulative counts — no fact-table ranking);
  * Q1/Q2 and the CI are one shared closed form on top.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.7 (functions), §2.13 (evaluation), sibling m32.
  */
object SurfaceR10bt {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- F30: URL functions ----

  /** F30: URL FUNCTIONS — build deterministic shop URLs from order
    * fields, then recover host, path, and the id query parameter via
    * parse_url. The oracle states the same extractions as anchored
    * regexes, so any parse_url semantic drift fails loudly. Narrow
    * per-row string ops — trivially scale-stable. */
  val f30UrlFunctions: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
        expr("concat('https://shop.example.com/', replace(lower(o_orderpriority), ' ', '-'), " +
          "'/item?id=', o_orderkey, '&st=', o_orderstatus)").as("url"))
      .select(col("o_orderpriority"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("CAST(parse_url(url, 'QUERY', 'id') AS BIGINT)").as("id"))
      .groupBy("o_orderpriority", "host", "path")
      .agg(count(lit(1)).as("n"), min("id").as("min_id"), max("id").as("max_id"))
      .orderBy("o_orderpriority")

  // ---- M156: AUC with Hanley–McNeil CI ----

  private val hmA =
    "((CAST(s2 AS DOUBLE) - CAST(npos AS DOUBLE) * (npos + 1)) / (2e0 * npos * nneg))"
  private val hmQ1 = s"($hmA / (2e0 - $hmA))"
  private val hmQ2 = s"(2e0 * $hmA * $hmA / (1e0 + $hmA))"
  private val hmSe =
    s"sqrt(($hmA * (1e0 - $hmA) + (npos - 1) * ($hmQ1 - $hmA * $hmA) + (nneg - 1) * ($hmQ2 - $hmA * $hmA)) / (CAST(npos AS DOUBLE) * nneg))"

  /** M156: AUC ± HANLEY–McNEIL — the m32 exact U-statistic AUC of
    * `value` scoring purchases, plus its analytic SE and the 95%
    * normal CI. Integer to the last division; SE/CI one shared
    * formula. */
  val m156AucCi: Q = (s, d) => {
    val e = events(s, d).select(col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val byV = e.groupBy("value")
      .agg(count(lit(1)).as("nv"), sum("y").as("posv"))
    val terms = PrefixSum
      .withRunningTotal(byV, Seq("value"), "nv", numPartitions = 16,
        outCol = "cumincl")
      .withColumn("cumprev", col("cumincl") - col("nv"))
      .select(
        (col("posv") * (lit(2L) * col("cumprev") + col("nv") + 1L)).as("t"),
        col("posv"), col("nv"))
    terms.agg(
      sum("t").as("s2"), sum("posv").as("npos"),
      (sum("nv") - sum("posv")).as("nneg"))
      .select(col("npos"), col("nneg"),
        r4(expr(hmA)).as("auc"),
        r4(expr(hmSe)).as("se"),
        r4(expr(s"$hmA - 196e-2 * $hmSe")).as("ci_lo"),
        r4(expr(s"$hmA + 196e-2 * $hmSe")).as("ci_hi"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "f30_url_functions" -> f30UrlFunctions,
    "m156_auc_ci" -> m156AucCi)

  val oracleSql: Map[String, String] = Map(
    "f30_url_functions" ->
      """WITH urls AS (
        |  SELECT o_orderpriority,
        |    'https://shop.example.com/' || replace(lower(o_orderpriority), ' ', '-') ||
        |      '/item?id=' || o_orderkey || '&st=' || o_orderstatus AS url
        |  FROM orders),
        |parsed AS (
        |  SELECT o_orderpriority,
        |    regexp_extract(url, 'https://([^/]+)/', 1) AS host,
        |    regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |    CAST(regexp_extract(url, 'id=([0-9]+)', 1) AS BIGINT) AS id
        |  FROM urls)
        |SELECT o_orderpriority, host, path,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(id) AS BIGINT) AS min_id,
        |  CAST(max(id) AS BIGINT) AS max_id
        |FROM parsed
        |GROUP BY o_orderpriority, host, path
        |ORDER BY o_orderpriority""".stripMargin,
    "m156_auc_ci" ->
      s"""WITH byv AS (
        |  SELECT value, CAST(count(*) AS BIGINT) AS nv,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS posv
        |  FROM events GROUP BY value),
        |cums AS (
        |  SELECT posv, nv,
        |    CAST(sum(nv) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |      - nv AS BIGINT) AS cumprev
        |  FROM byv),
        |sums AS (
        |  SELECT
        |    CAST(sum(posv * (2 * cumprev + nv + 1)) AS BIGINT) AS s2,
        |    CAST(sum(posv) AS BIGINT) AS npos,
        |    CAST(sum(nv) - sum(posv) AS BIGINT) AS nneg
        |  FROM cums)
        |SELECT npos, nneg,
        |  round($hmA, 4) AS auc,
        |  round($hmSe, 4) AS se,
        |  round($hmA - 196e-2 * $hmSe, 4) AS ci_lo,
        |  round($hmA + 196e-2 * $hmSe, 4) AS ci_hi
        |FROM sums""".stripMargin)
}
