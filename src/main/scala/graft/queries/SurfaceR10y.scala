package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 25: evaluator completions — log loss (the
  * proper scoring rule the m8/m32/m83/m90 family still lacked),
  * NDCG@3 over the ls3 retrieval output (the graded ranking metric),
  * and the trimmed mean (the robust location estimate between plain
  * mean and median).
  *
  * Float discipline per SurfaceR10l.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.13–§2.14.
  */
object SurfaceR10y extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M98: log loss ----

  private val pSql = "((s256 + 0.5) / 256.0)"
  private val llTermSql =
    s"(CASE WHEN y = 1 THEN -ln($pSql) ELSE -ln(1.0 - $pSql) END)"

  /** M98: LOG LOSS — the proper scoring rule over the m33 score
    * construction (p = (s256+½)/256, strictly inside (0,1) so neither
    * ln can blow up; the ½ offset is the determinism guard, not a
    * smoothing choice). Accuracy ignores confidence, AUC ignores
    * calibration; log loss punishes both — the metric a model
    * registry actually gates on. One conditional aggregate over exact
    * integer scores. */
  val m98LogLoss: Q = (s, d) =>
    events(s, d).select(
      expr("""((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
             | (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1))
             |""".stripMargin.replaceAll("\n", "")).as("s256"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .agg(count(lit(1)).as("n"), sum("y").as("npos"),
        sum(expr(llTermSql)).as("ll_raw"))
      .select(col("n"), col("npos"),
        r4(expr("ll_raw / n")).as("log_loss"))

  // ---- M99: NDCG@3 ----

  private val dcgTermSql = "(CAST(rel AS DOUBLE) / log2(rn + 1.0))"
  private val idcgSql =
    "(CASE WHEN k >= 1 THEN 1.0 ELSE 0.0 END + " +
      "CASE WHEN k >= 2 THEN 1.0 / log2(3.0) ELSE 0.0 END + " +
      "CASE WHEN k >= 3 THEN 1.0 / log2(4.0) ELSE 0.0 END)"

  /** M99: NDCG@3 — graded ranking quality of the ls3 tf-idf retrieval,
    * with same-language-as-query as the binary relevance label (a
    * deterministic proxy: a retrieval that crosses languages on this
    * corpus is topically lost). DCG discounts by log₂(rank+1); the
    * ideal DCG follows from the relevant-hit count alone (binary
    * labels), so the whole metric is a closed form on the ls3 top-3
    * table joined twice to the language column. Queries with zero
    * relevant hits report NDCG 0 (stated convention). */
  val m99Ndcg: Q = (s, d) => {
    val langs = documents(s, d).select(col("doc_id"), col("lang"))
    val top = SurfaceR8.ls3TfidfTopk(s, d)
      .join(langs.select(col("doc_id").as("q_id"), col("lang").as("q_lang")),
        "q_id")
      .join(langs.select(col("doc_id").as("c_id"), col("lang").as("c_lang")),
        "c_id")
      .select(col("q_id"), col("rn"),
        when(col("q_lang") === col("c_lang"), 1L).otherwise(0L).as("rel"))
    top.groupBy("q_id")
      .agg(sum("rel").as("k"), sum(expr(dcgTermSql)).as("dcg"))
      .select(col("q_id"), col("k"),
        r4(when(col("k") > 0, expr(s"dcg / $idcgSql")).otherwise(0.0))
          .as("ndcg"))
      .orderBy("q_id")
  }

  // ---- A38: trimmed mean ----

  /** A38: TRIMMED MEAN — mean of order totals strictly between the
    * exact 5th and 95th percentiles, per order priority: the robust
    * location estimate dashboards quote when outliers poison the mean
    * but the median wastes too much data. Thresholds are two broadcast
    * scalars per group (the q41 window-free discipline) on exact
    * integer cents; the trimmed aggregate is a conditional sum, so the
    * final division is the only float op. */
  val a38TrimmedMean: Q = (s, d) => {
    val rows = orders(s, d).select(col("o_orderpriority").as("grp"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
    val bp = rows.groupBy("grp").agg(
      expr("percentile(cents, 0.05)").as("lo"),
      expr("percentile(cents, 0.95)").as("hi"))
    rows.join(broadcast(bp), "grp")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_total"),
        count(when(col("cents") > col("lo") && col("cents") < col("hi"), 1))
          .as("n_kept"),
        sum(when(col("cents") > col("lo") && col("cents") < col("hi"),
          col("cents")).otherwise(0L)).as("kept_cents"))
      .select(col("grp"), col("n_total"), col("n_kept"),
        r4(expr("CAST(kept_cents AS DOUBLE) / (100.0 * n_kept)"))
          .as("trimmed_mean"))
      .orderBy("grp")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m98_log_loss" -> m98LogLoss,
    "m99_ndcg" -> m99Ndcg,
    "a38_trimmed_mean" -> a38TrimmedMean)

  val oracleSql: Map[String, String] = Map(
    "m98_log_loss" ->
      s"""WITH e AS (
        |  SELECT ((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1)) AS s256,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS npos,
        |  round(sum($llTermSql) / count(*), 4) AS log_loss
        |FROM e""".stripMargin,
    "m99_ndcg" -> {
      val ls3 = SurfaceR8.oracleSql("ls3_tfidf_topk")
      s"""WITH base AS ($ls3),
        |labeled AS (
        |  SELECT b.q_id, b.rn,
        |    CASE WHEN ql.lang = cl.lang THEN 1 ELSE 0 END AS rel
        |  FROM base b
        |  JOIN documents ql ON ql.doc_id = b.q_id
        |  JOIN documents cl ON cl.doc_id = b.c_id),
        |per_q AS (
        |  SELECT q_id, CAST(sum(rel) AS BIGINT) AS k,
        |    sum($dcgTermSql) AS dcg
        |  FROM labeled GROUP BY q_id)
        |SELECT q_id, k,
        |  round(CASE WHEN k > 0 THEN dcg / $idcgSql ELSE 0.0 END, 4) AS ndcg
        |FROM per_q ORDER BY q_id""".stripMargin
    },
    "a38_trimmed_mean" ->
      """WITH rows_t AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |bp AS (
        |  SELECT grp, quantile_cont(cents, 0.05) AS lo,
        |    quantile_cont(cents, 0.95) AS hi
        |  FROM rows_t GROUP BY grp)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(CASE WHEN cents > lo AND cents < hi THEN 1 END) AS BIGINT)
        |    AS n_kept,
        |  round(CAST(sum(CASE WHEN cents > lo AND cents < hi THEN cents
        |                      ELSE 0 END) AS DOUBLE) /
        |        (100.0 * count(CASE WHEN cents > lo AND cents < hi THEN 1 END)),
        |        4) AS trimmed_mean
        |FROM rows_t JOIN bp USING (grp)
        |GROUP BY grp ORDER BY grp""".stripMargin)
}
