package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 44: retrieval evaluation tail + readability
  * scoring — precision@k / recall@k on the ls3 retrieval stack (the
  * plain-language companions to m83 AP / m99 NDCG / lt35 MRR: "of the
  * 3 results, how many were right; of everything right, how much did
  * we find") and Flesch–Kincaid readability (the curation signal that
  * separates encyclopedic text from listicles before training-mix
  * decisions).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (retrieval evaluation), §2.12 (text quality).
  */
object SurfaceR10ar extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M126: precision/recall @3 ----

  /** M126: P@3 / R@3 — per ls3 query doc, relevance = same-language
    * candidates (the m99 ground-truth convention). Precision divides
    * hits by the fixed cutoff 3; recall divides by the query's TOTAL
    * relevant pool (same-lang corpus count minus self), which comes
    * from a 5-row language histogram broadcast onto the top-k table —
    * exact integers end to end, divisions in one shared formula.
    * Rides ls3's inverted-index candidates: nothing here rescans the
    * corpus. */
  val m126PrecisionRecall: Q = (s, d) => {
    val langs = documents(s, d).select(col("doc_id"), col("lang"))
    val langTot = langs.groupBy("lang").agg(count(lit(1)).as("lang_n"))
    val top = SurfaceR8.ls3TfidfTopk(s, d)
      .join(langs.select(col("doc_id").as("q_id"), col("lang").as("q_lang")),
        "q_id")
      .join(langs.select(col("doc_id").as("c_id"), col("lang").as("c_lang")),
        "c_id")
      .select(col("q_id"), col("q_lang"),
        when(col("q_lang") === col("c_lang"), 1L).otherwise(0L).as("rel"))
    top.groupBy("q_id", "q_lang")
      .agg(sum("rel").as("n_hits"))
      .join(broadcast(langTot.withColumnRenamed("lang", "q_lang")), "q_lang")
      .select(col("q_id"), col("n_hits"),
        r4(expr("CAST(n_hits AS DOUBLE) / 3.0")).as("p_at_3"),
        r4(expr("CAST(n_hits AS DOUBLE) / (lang_n - 1)")).as("r_at_3"))
      .orderBy("q_id")
  }

  // ---- LT38: Flesch–Kincaid readability ----

  private val fkSql =
    "(0.39 * (CAST(n_words AS DOUBLE) / n_sent) + 11.8 * (CAST(n_syll AS DOUBLE) / n_words) - 15.59)"

  /** LT38: READABILITY — Flesch–Kincaid grade per document from three
    * exact regex counts: sentences ([.!?]+ runs, floored at 1), words
    * ([a-z]+ runs on the lowercased text), syllable proxy (vowel
    * groups [aeiouy]+ — the standard cheap estimator). Counts are
    * integers from identical RE2-and-Java-compatible patterns; the
    * grade formula is one shared text. Narrow per-row work that
    * pushes column pruning to the scan — the classic embarrassingly
    * parallel curation score (pairs with lq quality / lg langid in a
    * filtering funnel). */
  val lt38Readability: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"),
        greatest(lit(1),
          size(expr("regexp_extract_all(text, '[.!?]+', 0)"))).cast("long")
          .as("n_sent"),
        greatest(lit(1),
          size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))).cast("long")
          .as("n_words"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")).cast("long")
          .as("n_syll"))
      .select(col("doc_id"), col("n_sent"), col("n_words"), col("n_syll"),
        r4(expr(fkSql)).as("fk_grade"))
      .orderBy("doc_id")

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m126_precision_recall" -> m126PrecisionRecall,
    "lt38_readability" -> lt38Readability)

  val oracleSql: Map[String, String] = Map(
    "m126_precision_recall" -> {
      val ls3 = SurfaceR8.oracleSql("ls3_tfidf_topk")
      s"""WITH base AS ($ls3),
        |lt AS (SELECT lang, CAST(count(*) AS BIGINT) AS lang_n
        |       FROM documents GROUP BY 1),
        |j AS (
        |  SELECT b.q_id, dq.lang AS q_lang,
        |    CASE WHEN dq.lang = dc.lang THEN 1 ELSE 0 END AS rel
        |  FROM base b
        |  JOIN documents dq ON dq.doc_id = b.q_id
        |  JOIN documents dc ON dc.doc_id = b.c_id),
        |agg AS (
        |  SELECT q_id, q_lang, CAST(sum(rel) AS BIGINT) AS n_hits
        |  FROM j GROUP BY 1, 2)
        |SELECT q_id, n_hits,
        |  round(CAST(n_hits AS DOUBLE) / 3.0, 4) AS p_at_3,
        |  round(CAST(n_hits AS DOUBLE) / (lang_n - 1), 4) AS r_at_3
        |FROM agg JOIN lt ON lt.lang = agg.q_lang
        |ORDER BY q_id""".stripMargin
    },
    "lt38_readability" ->
      s"""WITH c AS (
        |  SELECT doc_id,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+', 0))) AS n_sent,
        |    greatest(1, len(regexp_extract_all(lower(text), '[a-z]+', 0))) AS n_words,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS n_syll
        |  FROM documents)
        |SELECT doc_id, CAST(n_sent AS BIGINT) AS n_sent,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_syll AS BIGINT) AS n_syll,
        |  round($fkSql, 4) AS fk_grade
        |FROM c ORDER BY doc_id""".stripMargin)
}
