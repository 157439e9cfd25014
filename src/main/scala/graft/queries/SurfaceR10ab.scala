package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 28: two evaluator closers — mean reciprocal
  * rank (the first-relevant-hit metric quoted alongside NDCG) and the
  * Murphy decomposition of the Brier score (reliability − resolution +
  * uncertainty, the forecast-verification identity).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.14 (evaluators).
  */
object SurfaceR10ab extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT35: mean reciprocal rank ----

  /** LT35: MRR — over the ls3 retrieval with same-language relevance
    * (m99's label), the reciprocal rank of each query's FIRST relevant
    * hit (0 when the top-3 has none — stated convention), plus the
    * corpus MRR as a TOTAL row. Where NDCG grades the whole ranked
    * list, MRR answers "how far down is the first useful result" — the
    * navigational-query metric. Closed form on the joined top-3 table:
    * min relevant rank per query, one reciprocal. */
  val lt35Mrr: Q = (s, d) => {
    val langs = documents(s, d).select(col("doc_id"), col("lang"))
    val top = SurfaceR8.ls3TfidfTopk(s, d)
      .join(langs.select(col("doc_id").as("q_id"), col("lang").as("q_lang")),
        "q_id")
      .join(langs.select(col("doc_id").as("c_id"), col("lang").as("c_lang")),
        "c_id")
      .select(col("q_id"), col("rn"),
        (col("q_lang") === col("c_lang")).as("rel"))
    val perQ = top.groupBy("q_id")
      .agg(min(when(col("rel"), col("rn"))).as("fr0"))
      .select(col("q_id").cast("string").as("q_id"),
        coalesce(col("fr0"), lit(0L)).as("first_rel"),
        r4(when(col("fr0").isNotNull, lit(1.0) / col("fr0"))
          .otherwise(lit(0.0))).as("rr"))
    val total = perQ.agg(count(lit(1)).as("nq"), sum("rr").as("rr_sum"))
      .select(lit("TOTAL").as("q_id"), lit(0L).as("first_rel"),
        r4(expr("rr_sum / nq")).as("rr"))
    perQ.unionAll(total).orderBy("q_id")
  }

  // ---- M102: Brier decomposition ----

  /** M102: BRIER DECOMPOSITION — Murphy's identity over the m33 bin
    * construction: BS = REL − RES + UNC, where REL penalizes
    * miscalibration (bin confidence vs bin accuracy), RES rewards
    * bins that separate outcomes from the base rate, and UNC is the
    * irreducible base-rate variance. The spec pins the identity
    * against the directly-computed Brier score. All terms are ratios
    * of exact integers (the md5 2-hex score and its square are both
    * exact), so the only float work is the shared closed form. */
  val m102BrierDecomposition: Q = (s, d) => {
    val e = events(s, d).select(
      expr("""((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
             | (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1))
             |""".stripMargin.replaceAll("\n", "")).as("s256"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val bins = e.withColumn("bin", least(expr("(s256 * 10) div 256"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("s256").as("ssum"),
        sum(expr("s256 * s256")).as("ssum2"), sum("y").as("npos"))
    val tot = bins.agg(sum("n").as("nn"), sum("npos").as("ptot"),
      sum("ssum").as("stot"), sum("ssum2").as("stot2"))
    val sy = e.agg(sum(expr("s256 * y")).as("sy_raw"))
    val relres = bins.crossJoin(broadcast(tot))
      .agg(
        sum(expr(
          "(CAST(n AS DOUBLE) / nn) * " +
            "(CAST(ssum AS DOUBLE) / (256.0 * n) - CAST(npos AS DOUBLE) / n) * " +
            "(CAST(ssum AS DOUBLE) / (256.0 * n) - CAST(npos AS DOUBLE) / n)"))
          .as("rel_raw"),
        sum(expr(
          "(CAST(n AS DOUBLE) / nn) * " +
            "(CAST(npos AS DOUBLE) / n - CAST(ptot AS DOUBLE) / nn) * " +
            "(CAST(npos AS DOUBLE) / n - CAST(ptot AS DOUBLE) / nn)"))
          .as("res_raw"),
        first("nn").as("nn"), first("ptot").as("ptot"),
        first("stot").as("stot"), first("stot2").as("stot2"))
    relres.crossJoin(broadcast(sy))
      .select(col("nn").as("n_events"),
        r4(col("rel_raw")).as("reliability"),
        r4(col("res_raw")).as("resolution"),
        r4(expr(
          "(CAST(ptot AS DOUBLE) / nn) * (1.0 - CAST(ptot AS DOUBLE) / nn)"))
          .as("uncertainty"),
        r4(expr(
          "(CAST(stot2 AS DOUBLE) / (65536.0 * nn)) - " +
            "2.0 * CAST(sy_raw AS DOUBLE) / (256.0 * nn) + " +
            "CAST(ptot AS DOUBLE) / nn"))
          .as("brier"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt35_mrr" -> lt35Mrr,
    "m102_brier_decomposition" -> m102BrierDecomposition)

  val oracleSql: Map[String, String] = Map(
    "lt35_mrr" -> {
      val ls3 = SurfaceR8.oracleSql("ls3_tfidf_topk")
      s"""WITH base AS ($ls3),
        |labeled AS (
        |  SELECT b.q_id, b.rn, ql.lang = cl.lang AS rel
        |  FROM base b
        |  JOIN documents ql ON ql.doc_id = b.q_id
        |  JOIN documents cl ON cl.doc_id = b.c_id),
        |per_q AS (
        |  SELECT CAST(q_id AS VARCHAR) AS q_id,
        |    CAST(coalesce(min(CASE WHEN rel THEN rn END), 0) AS BIGINT)
        |      AS first_rel,
        |    round(coalesce(1.0 / min(CASE WHEN rel THEN rn END), 0.0), 4) AS rr
        |  FROM labeled GROUP BY q_id)
        |SELECT q_id, first_rel, rr FROM per_q
        |UNION ALL
        |SELECT 'TOTAL', CAST(0 AS BIGINT), round(sum(rr) / count(*), 4)
        |FROM per_q
        |ORDER BY q_id""".stripMargin
    },
    "m102_brier_decomposition" ->
      """WITH e AS (
        |  SELECT ((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1)) AS s256,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |bins AS (
        |  SELECT least((s256 * 10) // 256, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(s256) AS BIGINT) AS ssum,
        |    CAST(sum(s256 * s256) AS BIGINT) AS ssum2,
        |    CAST(sum(y) AS BIGINT) AS npos
        |  FROM e GROUP BY bin),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(npos) AS BIGINT) AS ptot,
        |    CAST(sum(ssum2) AS BIGINT) AS stot2
        |  FROM bins),
        |sy AS (SELECT CAST(sum(s256 * y) AS BIGINT) AS sy_raw FROM e),
        |relres AS (
        |  SELECT
        |    sum((CAST(n AS DOUBLE) / nn) *
        |        (CAST(ssum AS DOUBLE) / (256.0 * n) - CAST(npos AS DOUBLE) / n) *
        |        (CAST(ssum AS DOUBLE) / (256.0 * n) - CAST(npos AS DOUBLE) / n))
        |      AS rel_raw,
        |    sum((CAST(n AS DOUBLE) / nn) *
        |        (CAST(npos AS DOUBLE) / n - CAST(ptot AS DOUBLE) / nn) *
        |        (CAST(npos AS DOUBLE) / n - CAST(ptot AS DOUBLE) / nn))
        |      AS res_raw,
        |    any_value(nn) AS nn, any_value(ptot) AS ptot,
        |    any_value(stot2) AS stot2
        |  FROM bins CROSS JOIN tot)
        |SELECT nn AS n_events,
        |  round(rel_raw, 4) AS reliability,
        |  round(res_raw, 4) AS resolution,
        |  round((CAST(ptot AS DOUBLE) / nn) * (1.0 - CAST(ptot AS DOUBLE) / nn), 4)
        |    AS uncertainty,
        |  round((CAST(stot2 AS DOUBLE) / (65536.0 * nn)) -
        |        2.0 * CAST(sy_raw AS DOUBLE) / (256.0 * nn) +
        |        CAST(ptot AS DOUBLE) / nn, 4) AS brier
        |FROM relres CROSS JOIN sy""".stripMargin)
}
