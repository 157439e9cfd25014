package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 85: ROUGE-1/2 micro-averaged overlap scoring
  * over candidate↔reference document pairs, and Lin's concordance
  * correlation coefficient on paired measurements.
  *
  * Contrast with near-siblings: lj/lj2 score SET overlap (Jaccard on
  * distinct shingles — symmetric, dedup-oriented); ROUGE is the
  * summarization/generation EVAL primitive — clipped MULTISET n-gram
  * overlap, asymmetric by design (precision against the candidate
  * length, recall against the reference length), micro-averaged so the
  * per-language readout is a ratio of exact integer totals rather than
  * a float mean of per-pair ratios. m18's Pearson r measures PRECISION
  * only (invariant to scale/location shifts), m148's Deming fits the
  * structural line, m149's Bland–Altman reports bias + limits; Lin's
  * CCC is the single agreement index r·C_b that penalizes any
  * departure from the exact 45° line — the "does the cheap measurement
  * reproduce the expensive one" number.
  *
  * Float discipline: ROUGE overlaps and gram totals are exact BIGINTs;
  * each readout is one division (micro-F1 = 2·ov/(clen+rlen) — the
  * micro identity avoids the 0/0 harmonic form entirely). CCC follows
  * the m148 idiom: exact BIGINT moments, then a fixed shared
  * double formula (products routed through CAST(... AS DOUBLE) before
  * multiplying, since n·Σx² overflows BIGINT at sf0.1).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.9 (text eval) and §2.13 (agreement); siblings
  * lj_ngram_jaccard (LlmOps), m148/m149 (SurfaceR10bk), m150 ICC.
  */
object SurfaceR10cg extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Token n-gram array of a text column; n=2 guards the short-text
    * case to DuckDB `range` semantics (empty list, not a wrap-around
    * sequence). */
  private def gramExpr(tcol: String, n: Int): Column =
    if (n == 1) expr(s"split($tcol, ' ')")
    else expr(
      s"CASE WHEN size(split($tcol, ' ')) < 2 THEN slice(split($tcol, ' '), 1, 0) " +
      s"ELSE transform(sequence(0, size(split($tcol, ' ')) - 2), " +
      s"i -> concat(split($tcol, ' ')[i], ' ', split($tcol, ' ')[i + 1])) END")

  /** LT52: ROUGE-1/2 — each document is scored as a "candidate" against
    * the next doc id in the same language as its "reference" (the
    * deterministic pairing; in production the pair table is
    * (generation, gold) keyed by prompt id). Per (lang, gram_n):
    * micro precision Σmin-overlap/Σcand-grams, micro recall over
    * Σref-grams, micro F1 = 2·ov/(clen+rlen).
    *
    * Scale shape: pairing is an equi-join on (id, lang); counting is
    * explode → hash agg keyed by (pair, gram); the clipped overlap is
    * an equi-join of the two count relations on (pair, gram) — the
    * postings-join pattern, never a cross of texts. All shuffles keyed
    * by pair id / gram; readout is bounded (#langs × 2 rows).
    */
  val lt52Rouge: Q = (s, d) => {
    val docs = documents(s, d)
    val pairs = docs.select(col("doc_id").as("pid"), col("lang"),
        col("text").as("ctext"))
      .join(docs.select((col("doc_id") - 1).as("pid"), col("lang"),
        col("text").as("rtext")), Seq("pid", "lang"))

    def scored(n: Int): DataFrame = {
      val g = pairs.select(col("pid"), col("lang"),
        gramExpr("ctext", n).as("cg"), gramExpr("rtext", n).as("rg"))
      val lens = g.groupBy("lang").agg(
        count(lit(1)).as("n_pairs"),
        sum(size(col("cg")).cast("long")).as("clen"),
        sum(size(col("rg")).cast("long")).as("rlen"))
      val cc = g.select(col("pid"), col("lang"), explode(col("cg")).as("tok"))
        .groupBy("pid", "lang", "tok").agg(count(lit(1)).as("cc"))
      val rc = g.select(col("pid"), explode(col("rg")).as("tok"))
        .groupBy("pid", "tok").agg(count(lit(1)).as("rc"))
      val ov = cc.join(rc, Seq("pid", "tok"))
        .groupBy("lang").agg(sum(least(col("cc"), col("rc"))).as("ov"))
      lens.join(ov, Seq("lang"), "left")
        .select(col("lang"), lit(n.toLong).as("gram_n"), col("n_pairs"),
          coalesce(col("ov"), lit(0L)).as("overlap"),
          col("clen"), col("rlen"))
    }

    scored(1).unionAll(scored(2))
      .select(col("lang"), col("gram_n"), col("n_pairs"), col("overlap"),
        r4(expr("CAST(overlap AS DOUBLE) / clen")).as("rouge_p"),
        r4(expr("CAST(overlap AS DOUBLE) / rlen")).as("rouge_r"),
        r4(expr("2.0 * overlap / (clen + rlen)")).as("rouge_f1"))
      .orderBy("lang", "gram_n")
  }

  // ---- M169: Lin's concordance correlation ----

  private val ccSxx = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)"
  private val ccSyy = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)"
  private val ccSxy = "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)"
  private val ccShift = "(CAST(sx - sy AS DOUBLE) * (sx - sy) / n)"
  private val ccCcc = s"(2.0 * $ccSxy / ($ccSxx + $ccSyy + $ccShift))"
  private val ccR = s"($ccSxy / sqrt($ccSxx * $ccSyy))"

  /** M169: LIN'S CCC — agreement between the gross and net per-line
    * dollar measurements (the m148/m149 instrument pair, so the three
    * agreement views share one data contract): CCC = 2S_xy /
    * (S_xx + S_yy + n(x̄−ȳ)²), reported with Pearson r and the
    * bias-correction factor C_b = CCC/r (C_b < 1 quantifies the
    * systematic shift Bland–Altman shows as bias). One exact-integer
    * moment pass; divide-by-n convention (Lin 1989). */
  val m169LinCcc: Q = (s, d) =>
    SurfaceR10bk.paired(s, d).agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("x * x")).as("sxx"),
      sum(expr("y * y")).as("syy"),
      sum(expr("x * y")).as("sxy"))
      .select(col("n"),
        r4(expr(ccCcc)).as("ccc"),
        r4(expr(ccR)).as("pearson_r"),
        r4(expr(s"$ccCcc / $ccR")).as("c_b"))

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt52_rouge" -> lt52Rouge,
    "m169_lin_ccc" -> m169LinCcc)

  private val bigramsSql = (t: String) =>
    s"""list_transform(range(len(string_split($t, ' ')) - 1),
       |   i -> string_split($t, ' ')[CAST(i + 1 AS INT)] || ' ' ||
       |        string_split($t, ' ')[CAST(i + 2 AS INT)])""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "lt52_rouge" ->
      s"""WITH p AS (
         |  SELECT c.doc_id AS pid, c.lang, c.text AS ctext, r.text AS rtext
         |  FROM documents c JOIN documents r
         |    ON r.doc_id = c.doc_id + 1 AND r.lang = c.lang),
         |g AS (
         |  SELECT CAST(1 AS BIGINT) AS gram_n, pid, lang,
         |    string_split(ctext, ' ') AS cg, string_split(rtext, ' ') AS rg
         |  FROM p
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), pid, lang,
         |    ${bigramsSql("ctext")},
         |    ${bigramsSql("rtext")}
         |  FROM p),
         |lens AS (
         |  SELECT lang, gram_n, CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(len(cg)) AS BIGINT) AS clen,
         |    CAST(sum(len(rg)) AS BIGINT) AS rlen
         |  FROM g GROUP BY 1, 2),
         |cc AS (
         |  SELECT gram_n, pid, lang, tok, count(*) AS cc
         |  FROM (SELECT gram_n, pid, lang, unnest(cg) AS tok FROM g)
         |  GROUP BY 1, 2, 3, 4),
         |rc AS (
         |  SELECT gram_n, pid, tok, count(*) AS rc
         |  FROM (SELECT gram_n, pid, unnest(rg) AS tok FROM g)
         |  GROUP BY 1, 2, 3),
         |ov AS (
         |  SELECT lang, gram_n, CAST(sum(least(cc, rc)) AS BIGINT) AS ov
         |  FROM cc JOIN rc USING (gram_n, pid, tok) GROUP BY 1, 2)
         |SELECT lens.lang, lens.gram_n, n_pairs,
         |  coalesce(ov, 0) AS overlap,
         |  round(CAST(coalesce(ov, 0) AS DOUBLE) / clen, 4) AS rouge_p,
         |  round(CAST(coalesce(ov, 0) AS DOUBLE) / rlen, 4) AS rouge_r,
         |  round(2.0 * coalesce(ov, 0) / (clen + rlen), 4) AS rouge_f1
         |FROM lens LEFT JOIN ov
         |  ON lens.lang = ov.lang AND lens.gram_n = ov.gram_n
         |ORDER BY lens.lang, lens.gram_n""".stripMargin,
    "m169_lin_ccc" ->
      s"""WITH pr AS (
         |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100
         |      AS x,
         |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
         |      AS BIGINT) // 100 AS y
         |  FROM lineitem),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM pr)
         |SELECT n,
         |  round($ccCcc, 4) AS ccc,
         |  round($ccR, 4) AS pearson_r,
         |  round($ccCcc / $ccR, 4) AS c_b
         |FROM m""".stripMargin)
}
