package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-11 surface batch 7: the BPE ENCODE step (applying learned
  * merges) and Kneser–Ney smoothed bigram probabilities.
  *
  * Contrast with near-siblings: lt10 counts candidate pairs, lt14
  * LEARNS the merge table — lp79 is the production side of that
  * artifact: the per-word tokenization after the merges are applied,
  * i.e. what the tokenizer actually emits at encode time (lp40's
  * fertility is a statistic OF this table). l16 is the maximum-
  * likelihood bigram LM and lt20 smooths UNIGRAM counts by
  * Good–Turing — lt76 is absolute discounting with CONTINUATION
  * counts (Kneser–Ney), the standard n-gram smoother: "glasses"
  * follows many contexts, "Francisco" only one, and only KN's
  * backoff term distinguishes them.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.12–2.13 (tokenization, language modeling).
  * Kneser & Ney 1995; Chen & Goodman 1999 for the fixed-discount
  * (D = 0.75) interpolated form used here.
  */
object SurfaceR11g extends QueryBatch {
  import Orc.rN
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LP79: BPE APPLY — the vocabulary table after lt14's three learned
    * merges, read off per word: (word, its token sequence, token count,
    * corpus frequency). Greedy left-to-right application is inherited
    * from the trainer loop itself (lp79 consumes the SAME final state
    * lt14's merges came from, so train/encode consistency holds by
    * construction — the property real tokenizers get wrong when encode
    * reimplements merge order). Scale: the table is vocabulary-sized;
    * the oracle replays the identical three unrolled rounds. */
  val lp79BpeApply: Q = (s, d) => {
    val sep = ""
    val (wc, _) = SurfaceR10.bpeLearn(s, d)
    wc.select(col("w").as("word"),
        array_join(filter(split(col("ws"), sep), x => length(x) > 0), " ")
          .as("tokens"),
        size(filter(split(col("ws"), sep), x => length(x) > 0)).cast("long")
          .as("n_tokens"),
        col("n"))
      .orderBy("word")
  }

  /** LT76: KNESER–NEY BIGRAM PROBABILITIES — interpolated absolute
    * discounting with fixed D = 0.75 over within-document adjacent
    * token pairs: P(w2|w1) = max(c12−D,0)/c1 + (D·N1+(w1·)/c1)·
    * N1+(·w2)/N1+(··). Every count is an exact integer; the probability
    * is a three-division closed form shared textually with the oracle
    * and read out on the r8 grid. Reported for bigrams with c12 ≥ 5.
    * Scale: two hash aggs over the bigram table (forward and
    * continuation fan-outs) + one broadcast scalar — the same shape as
    * l16's MLE LM. */
  val lt76KneserNey: Q = (s, d) => {
    documents(s, d).createOrReplaceTempView("graft_documents")
    s.sql(
      """WITH toks AS (
        |  SELECT doc_id, tok,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY p) AS i
        |  FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (p, tok)
        |        FROM graft_documents)
        |  WHERE length(tok) > 0),
        |bg AS (
        |  SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |               CAST(count(*) AS BIGINT) AS n1p_fwd FROM bg GROUP BY 1),
        |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bwd FROM bg GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bg)
        |SELECT bg.w1, bg.w2, bg.c12,
        |  round((CASE WHEN c12 - 0.75 > 0 THEN c12 - 0.75 ELSE 0 END) / c1
        |    + (0.75 * n1p_fwd / c1) * (CAST(n1p_bwd AS DOUBLE) / n_types), 8)
        |    AS p_kn
        |FROM bg JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot
        |WHERE c12 >= 5
        |ORDER BY w1, w2""".stripMargin)
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp79_bpe_apply" -> lp79BpeApply,
    "lt76_kneser_ney" -> lt76KneserNey)

  val oracleSql: Map[String, String] = Map(
    "lp79_bpe_apply" ->
      s"""WITH ${SurfaceR10.bpeChainSql}
         |SELECT w AS word,
         |  list_aggr(list_filter(string_split(ws, chr(31)),
         |    x -> len(x) > 0), 'string_agg', ' ') AS tokens,
         |  CAST(len(list_filter(string_split(ws, chr(31)),
         |    x -> len(x) > 0)) AS BIGINT) AS n_tokens,
         |  n
         |FROM w4 ORDER BY word""".stripMargin,
    "lt76_kneser_ney" ->
      """WITH toks AS (
        |  SELECT doc_id, tok,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY p) AS i
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |               generate_subscripts(string_split(text, ' '), 1) AS p
        |        FROM documents)
        |  WHERE length(tok) > 0),
        |bg AS (
        |  SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |               CAST(count(*) AS BIGINT) AS n1p_fwd FROM bg GROUP BY 1),
        |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bwd FROM bg GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bg)
        |SELECT bg.w1, bg.w2, bg.c12,
        |  round((CASE WHEN c12 - 0.75 > 0 THEN c12 - 0.75 ELSE 0 END) / c1
        |    + (0.75 * n1p_fwd / c1) * (CAST(n1p_bwd AS DOUBLE) / n_types), 8)
        |    AS p_kn
        |FROM bg JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot
        |WHERE c12 >= 5
        |ORDER BY w1, w2""".stripMargin)
}
