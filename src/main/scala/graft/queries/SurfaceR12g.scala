package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 surface batch 7: two engine-surface gaps —
  *
  *  - f30 URL FUNCTIONS: `parse_url` (HOST / PATH / QUERY / keyed
  *    query param) — the web-corpus curation primitive (domain-level
  *    stats, blocklists, dedup-by-path) absent from the f-family. URLs
  *    are CONSTRUCTED from fixture columns, so the oracle verifies the
  *    parser against the construction itself (the f27 XML-roundtrip
  *    pattern) without inventing data.
  *  - x20 OBSERVE METRICS: `Dataset.observe` + `Observation` — the
  *    production observability hook (row counts / checksums collected
  *    AS THE QUERY RUNS, via CollectMetricsExec, with zero extra
  *    passes). x14 proves cache lifecycle, x25 join-size profiling by
  *    re-aggregation; x20 is the in-flight accumulator route — the
  *    observed scan-level metrics ride alongside the aggregate result
  *    and the oracle recomputes both, so a metrics/data divergence
  *    fails the hash.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.8 (scalar functions), §2.12 (engine surface).
  */
object SurfaceR12g extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** F30: parse_url over constructed document URLs. Host aggregation
    * keeps the output compact while every doc contributes: a single
    * mis-parsed row shifts its host's counts. */
  val f30ParseUrl: Q = (s, d) => {
    val urls = documents(s, d).select(col("doc_id"), col("lang"),
      concat(lit("https://"), col("source"), lit(".example.com/docs/"),
        col("doc_id"), lit("?lang="), col("lang"), lit("&ver=2")).as("url"))
    urls.select(
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"),
        expr("parse_url(url, 'QUERY', 'ver')").as("q_ver"),
        col("doc_id"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("q_lang").as("n_langs"),
        min("path").as("min_path"),
        sum(when(col("q_ver") === "2", 1L).otherwise(0L)).as("n_ver2"))
      .orderBy("host")
  }

  /** X20: observe + Observation — revenue by return flag computed while
    * the SAME pass observes scan-level totals; the observed scalars are
    * joined back onto every result row. The `require` makes the
    * CollectMetrics node's presence part of the query's contract. */
  val x20ObserveMetrics: Q = (s, d) => {
    val obs = org.apache.spark.sql.Observation(
      "x20_" + java.util.UUID.randomUUID().toString.take(8))
    val li = lineitem(s, d).select(col("l_returnflag"),
      col("l_quantity"),
      expr("CAST(floor(l_extendedprice * 1e4 + 5e-1) AS BIGINT)").as("qprice"))
    val observed = li.observe(obs,
      count(lit(1)).as("rows_seen"),
      sum(col("l_quantity").cast("long")).as("qty_seen"))
    require(observed.queryExecution.analyzed.toString.contains("CollectMetrics"),
      "x20: observe() did not plant a CollectMetrics node")
    val agg = observed.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("qprice").as("qrev"))
    val rows = agg.collect().toSeq // action completes => observation is set
    val m = obs.get
    val base = s.createDataFrame(s.sparkContext.parallelize(rows, 1), agg.schema)
    base.select(col("l_returnflag"), col("n"),
        graft.Orc.r4(col("qrev").cast("double") / lit(1e4)).as("revenue"),
        lit(m("rows_seen").asInstanceOf[Long]).as("rows_seen"),
        lit(m("qty_seen").asInstanceOf[Long]).as("qty_seen"))
      .orderBy("l_returnflag")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "f30_parse_url" -> f30ParseUrl,
    "x20_observe_metrics" -> x20ObserveMetrics)

  val oracleSql: Map[String, String] = Map(
    // the oracle derives host/path/params from the CONSTRUCTION —
    // equality proves parse_url inverted the concat correctly
    "f30_parse_url" ->
      """SELECT source || '.example.com' AS host,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  min('/docs/' || doc_id) AS min_path,
        |  CAST(count(*) AS BIGINT) AS n_ver2
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "x20_observe_metrics" ->
      """WITH tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS rows_seen,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_seen
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(CAST(sum(CAST(floor(l_extendedprice * 1e4 + 5e-1)
        |    AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e4, 4) AS revenue,
        |  min(rows_seen) AS rows_seen, min(qty_seen) AS qty_seen
        |FROM lineitem CROSS JOIN tot
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
