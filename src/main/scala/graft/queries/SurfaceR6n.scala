package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 wave 11: the curation ladder as ONE integrated query —
  * quality gate → exact dedup → per-language funnel report. Each stage
  * is individually oracle-checked elsewhere (lq/l12, l1/q8, l14); this
  * entry hash-checks their COMPOSITION, which is what a production
  * pipeline actually ships (and what the bench's curation probe times).
  *
  * Shape at scale: the gate is a narrow projection; dedup is one
  * shuffle keyed by content hash; the funnel is three cheap hash aggs
  * on lang. Nothing materializes between stages — Catalyst fuses the
  * gate into the dedup's scan.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.9 (LLM pipeline ops).
  */
object SurfaceR6n extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val lp17CurationFunnel: Q = (s, d) => {
    val docs = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("nw", size(col("toks")).cast("long"))
      .withColumn("uniq", size(array_distinct(col("toks"))).cast("long"))
    val quality = docs.where(col("nw") >= 50 &&
      (col("uniq").cast("double") / col("nw").cast("double")) >= 0.3)
    val kept = quality
      .withColumn("h", md5(col("text").cast("binary")))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .join(documents(s, d).select("doc_id", "lang"), "doc_id")
    val raw = documents(s, d).groupBy("lang")
      .agg(count(lit(1)).as("n_raw"))
    val q = quality.groupBy("lang").agg(count(lit(1)).as("n_quality"))
    val k = kept.groupBy("lang").agg(count(lit(1)).as("n_deduped"))
    raw.join(q, Seq("lang"), "left")
      .join(k, Seq("lang"), "left")
      .select(col("lang"), col("n_raw"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_deduped"), lit(0L)).as("n_deduped"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map(
    "lp17_curation_funnel" -> lp17CurationFunnel)

  val oracleSql: Map[String, String] = Map(
    "lp17_curation_funnel" ->
      """WITH t AS (
        |  SELECT doc_id, lang, text,
        |    len(string_split(text, ' ')) AS nw,
        |    len(list_distinct(string_split(text, ' '))) AS uniq
        |  FROM documents),
        |quality AS (
        |  SELECT * FROM t
        |  WHERE nw >= 50 AND CAST(uniq AS DOUBLE) / CAST(nw AS DOUBLE) >= 0.3),
        |kept AS (
        |  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
        |kl AS (
        |  SELECT d.lang FROM kept JOIN documents d USING (doc_id))
        |SELECT r.lang,
        |  count(*) AS n_raw,
        |  coalesce(q.n, 0) AS n_quality,
        |  coalesce(k.n, 0) AS n_deduped
        |FROM documents r
        |LEFT JOIN (SELECT lang, count(*) AS n FROM quality GROUP BY lang) q
        |  ON r.lang = q.lang
        |LEFT JOIN (SELECT lang, count(*) AS n FROM kl GROUP BY lang) k
        |  ON r.lang = k.lang
        |GROUP BY r.lang, q.n, k.n
        |ORDER BY r.lang""".stripMargin)
}
