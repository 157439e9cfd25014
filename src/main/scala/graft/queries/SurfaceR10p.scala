package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 16: model-comparison statistics + data
  * selection — McNemar's paired-classifier test, the odds ratio with
  * its log-scale confidence interval, Moore–Lewis cross-entropy
  * difference selection (the canonical "pick in-domain training data"
  * scorer), and sequence-packing padding-waste analysis.
  *
  * Float discipline per SurfaceR10l: exact integer counts into ONE
  * shared formula text per closed-form.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.10–§2.13.
  */
object SurfaceR10p extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // classifier A: rule on priority; classifier B: rule on price;
  // ground truth: finalized status — shared by m87/m88
  private def labeled(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("pa"),
      (col("o_totalprice") > 150000.0).as("pb"),
      (col("o_orderstatus") === "F").as("y"))

  // ---- M87: McNemar's test ----

  private val mcnemarSql =
    "((CAST(b AS DOUBLE) - c) * (CAST(b AS DOUBLE) - c) / (CAST(b AS DOUBLE) + c))"

  /** M87: McNEMAR'S TEST — do two classifiers (rule-on-priority vs
    * rule-on-price, truth = finalized status) disagree more than
    * chance? Only the DISCORDANT pairs matter: b = A right ∧ B wrong,
    * c = A wrong ∧ B right, χ² = (b−c)²/(b+c) (uncorrected form,
    * stated). This is the right test when both models score the SAME
    * rows — m74/m86 assume independent samples. One conditional
    * aggregate; exact counts. */
  val m87Mcnemar: Q = (s, d) =>
    labeled(s, d)
      .agg(
        count(when(col("pa") === col("y") && col("pb") =!= col("y"), 1))
          .as("b"),
        count(when(col("pa") =!= col("y") && col("pb") === col("y"), 1))
          .as("c"))
      .select(col("b"), col("c"), r4(expr(mcnemarSql)).as("chi2"))

  // ---- M88: odds ratio with CI ----

  private val orSql =
    "((CAST(a AS DOUBLE) * dd) / (CAST(b AS DOUBLE) * c))"
  private val orSeSql =
    "sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd)"

  /** M88: ODDS RATIO — association of the priority flag with the
    * finalized status on the 2×2 table, with the Woolf log-scale 95%
    * interval: exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)). The effect-size
    * readout behind every "is this cohort converting differently"
    * question (m77's Cramér's V is the symmetric-table cousin). One
    * aggregate; exact cell counts. */
  val m88OddsRatio: Q = (s, d) =>
    labeled(s, d)
      .agg(
        count(when(col("pa") && col("y"), 1)).as("a"),
        count(when(col("pa") && !col("y"), 1)).as("b"),
        count(when(!col("pa") && col("y"), 1)).as("c"),
        count(when(!col("pa") && !col("y"), 1)).as("dd"))
      .select(col("a"), col("b"), col("c"), col("dd"),
        r4(expr(orSql)).as("odds_ratio"),
        r4(expr(s"exp(ln($orSql) - 1.96 * $orSeSql)")).as("ci_lo"),
        r4(expr(s"exp(ln($orSql) + 1.96 * $orSeSql)")).as("ci_hi"))

  // ---- LP38: Moore–Lewis data selection ----

  private val mlTermSql =
    "ln((CAST(cin + 1 AS DOUBLE) * (nall + vv)) / (CAST(call + 1 AS DOUBLE) * (nin + vv)))"

  /** LP38: MOORE–LEWIS SELECTION — per-document cross-entropy
    * difference between an in-domain unigram LM (here: the English
    * slice) and the general-corpus LM, add-one smoothed over the
    * shared vocabulary. Positive score = "looks more like the target
    * domain than like the average" — the canonical cheap scorer for
    * harvesting domain-relevant training data from a web-scale crawl.
    * Plan: two vocab aggregates + three broadcast scalars; the scoring
    * join is the same broadcast-vocab shape as l15, so the per-doc
    * pass stays a single narrow scan at any corpus size. */
  val lp38MooreLewis: Q = (s, d) => {
    val toks = documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
    val vocabAll = toks.groupBy("tok").agg(count(lit(1)).as("call"))
    val vocabIn = toks.where(col("lang") === "en")
      .groupBy("tok").agg(count(lit(1)).as("cin"))
    val scal = vocabAll
      .agg(sum("call").as("nall"), count(lit(1)).as("vv"))
      .crossJoin(broadcast(
        vocabIn.agg(sum("cin").as("nin"))))
    toks.join(broadcast(vocabAll), "tok")
      .join(broadcast(vocabIn), Seq("tok"), "left")
      .na.fill(0L, Seq("cin"))
      .crossJoin(broadcast(scal))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        avg(expr(mlTermSql)).as("ml_raw"))
      .select(col("doc_id"), col("n_toks"),
        r4(col("ml_raw")).as("ml_score"),
        (col("ml_raw") > 0.0).as("selected"))
      .orderBy("doc_id")
  }

  // ---- LP39: padding-waste analysis ----

  private val wasteSql =
    "(CAST(sum_padded - sum_tokens AS DOUBLE) / sum_padded)"

  /** LP39: PADDING WASTE — if every document is padded up to the next
    * bucket boundary (16/32/64/128 tokens, the fixed-shape batches an
    * accelerator wants), how many pad tokens does each bucket burn?
    * The number that decides between bucketing granularities and
    * length-grouped batching (lp4 packs greedily; this measures the
    * cost of NOT packing). Integer-exact: one narrow token count, a
    * CASE ladder, one agg. */
  val lp39PaddingWaste: Q = (s, d) => {
    val bucketExpr =
      "CASE WHEN n_toks <= 16 THEN 16 WHEN n_toks <= 32 THEN 32 " +
        "WHEN n_toks <= 64 THEN 64 ELSE 128 END"
    documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("n_toks"))
      .withColumn("bucket", expr(bucketExpr))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("sum_tokens"),
        sum("bucket").as("sum_padded"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        col("sum_padded"), r4(expr(wasteSql)).as("waste_frac"))
      .orderBy("bucket")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m87_mcnemar" -> m87Mcnemar,
    "m88_odds_ratio" -> m88OddsRatio,
    "lp38_moore_lewis" -> lp38MooreLewis,
    "lp39_padding_waste" -> lp39PaddingWaste)

  val oracleSql: Map[String, String] = Map(
    "m87_mcnemar" ->
      s"""WITH l AS (
        |  SELECT o_orderpriority IN ('1-URGENT', '2-HIGH') AS pa,
        |    o_totalprice > 150000.0 AS pb,
        |    o_orderstatus = 'F' AS y
        |  FROM orders),
        |agg AS (
        |  SELECT
        |    CAST(count(CASE WHEN pa = y AND pb <> y THEN 1 END) AS BIGINT) AS b,
        |    CAST(count(CASE WHEN pa <> y AND pb = y THEN 1 END) AS BIGINT) AS c
        |  FROM l)
        |SELECT b, c, round($mcnemarSql, 4) AS chi2 FROM agg""".stripMargin,
    "m88_odds_ratio" ->
      s"""WITH l AS (
        |  SELECT o_orderpriority IN ('1-URGENT', '2-HIGH') AS pa,
        |    o_orderstatus = 'F' AS y
        |  FROM orders),
        |agg AS (
        |  SELECT
        |    CAST(count(CASE WHEN pa AND y THEN 1 END) AS BIGINT) AS a,
        |    CAST(count(CASE WHEN pa AND NOT y THEN 1 END) AS BIGINT) AS b,
        |    CAST(count(CASE WHEN NOT pa AND y THEN 1 END) AS BIGINT) AS c,
        |    CAST(count(CASE WHEN NOT pa AND NOT y THEN 1 END) AS BIGINT) AS dd
        |  FROM l)
        |SELECT a, b, c, dd, round($orSql, 4) AS odds_ratio,
        |  round(exp(ln($orSql) - 1.96 * $orSeSql), 4) AS ci_lo,
        |  round(exp(ln($orSql) + 1.96 * $orSeSql), 4) AS ci_hi
        |FROM agg""".stripMargin,
    "lp38_moore_lewis" ->
      s"""WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab_all AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS call FROM toks GROUP BY tok),
        |vocab_in AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cin FROM toks
        |  WHERE lang = 'en' GROUP BY tok),
        |scal AS (
        |  SELECT (SELECT CAST(sum(call) AS BIGINT) FROM vocab_all) AS nall,
        |         (SELECT CAST(count(*) AS BIGINT) FROM vocab_all) AS vv,
        |         (SELECT CAST(sum(cin) AS BIGINT) FROM vocab_in) AS nin)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  round(avg($mlTermSql), 4) AS ml_score,
        |  avg($mlTermSql) > 0.0 AS selected
        |FROM (
        |  SELECT t.doc_id, va.call, coalesce(vi.cin, 0) AS cin
        |  FROM toks t
        |  JOIN vocab_all va USING (tok)
        |  LEFT JOIN vocab_in vi USING (tok)) j
        |CROSS JOIN scal
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "lp39_padding_waste" ->
      s"""WITH per AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_toks,
        |    CASE WHEN n_toks <= 16 THEN 16 WHEN n_toks <= 32 THEN 32
        |         WHEN n_toks <= 64 THEN 64 ELSE 128 END AS bucket
        |  FROM per),
        |agg AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
        |    CAST(sum(bucket) AS BIGINT) AS sum_padded
        |  FROM b GROUP BY bucket)
        |SELECT CAST(bucket AS INT) AS bucket, n_docs, sum_tokens, sum_padded,
        |  round($wasteSql, 4) AS waste_frac
        |FROM agg ORDER BY bucket""".stripMargin)
}
