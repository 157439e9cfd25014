package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.PrefixSum

/** Round-10 surface batch 15: evaluator + information-theory tail —
  * precision-recall AUC (m32's ranking-metric sibling for imbalanced
  * labels), bigram conditional entropy (the corpus-predictability
  * number a language-model pipeline tracks), the paired t-test (the
  * within-subject sibling of m74's Welch test), and the Hill tail-index
  * estimator (how heavy the revenue/token distribution's tail is).
  *
  * Float discipline per SurfaceR10l: exact integer aggregates feeding
  * ONE shared SQL text per closed-form.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.13 (statistics), §2.14 (ML evaluators).
  */
object SurfaceR10o extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M83: precision-recall AUC ----

  /** M83: PR-AUC — average precision over the (score desc, event_id)
    * total order: AP = (1/P)·Σ_{positives} TP@k / k. ROC-AUC (m32)
    * saturates when negatives dominate; average precision is the
    * metric that moves when a retrieval/filter model improves on the
    * rare class, so both belong in the evaluator family. The ranking
    * prefix counts come from ONE [[PrefixSum]] pass (two series in
    * lockstep: rank k and cumulative TP) — no single-partition window
    * over the score-sorted facts, the same at-scale shape as m32. */
  val m83PrAuc: Q = (s, d) => {
    val e = events(s, d).select(
      col("event_id"), (-col("value")).as("negv"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
      lit(1L).as("one"))
    PrefixSum.withRunningTotals(e, Seq("negv", "event_id"),
        Seq("one" -> "k", "y" -> "tp"), numPartitions = 16)
      .agg(sum("y").as("npos"),
        sum(when(col("y") === 1L,
          expr("CAST(tp AS DOUBLE) / k"))).as("ap_sum"))
      .select(col("npos"),
        r4(expr("ap_sum / npos")).as("pr_auc"))
  }

  // ---- LT25: bigram conditional entropy ----

  private val condTermSql =
    "((CAST(cxy AS DOUBLE) / nb) * ln(CAST(cxy AS DOUBLE) / cx))"
  private def margTermSql(c: String) =
    s"((CAST($c AS DOUBLE) / nb) * ln(CAST($c AS DOUBLE) / nb))"

  /** LT25: CONDITIONAL ENTROPY H(next|current) of the corpus bigram
    * distribution, with the first-token marginal H(X) and the joint
    * H(X,Y) — the predictability triple (H(X,Y) = H(X) + H(Y|X), the
    * chain rule, is asserted in the spec). Falling H(Y|X) across
    * pipeline stages means the corpus is getting more templated; it is
    * also the crude upper bound on next-token model quality. Exact
    * bigram counts; ln on identical doubles both sides. */
  val lt25CondEntropy: Q = (s, d) => {
    val docs = documents(s, d).withColumn("toks", split(col("text"), " "))
    val bi = docs.select(explode(expr(
      "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"))
      .as("p")).select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
    val firsts = bi.groupBy("w1").agg(sum("cxy").as("cx"))
    val tot = bi.agg(sum("cxy").as("nb"))
    val hx = firsts.crossJoin(broadcast(tot))
      .agg(sum(expr(s"-${margTermSql("cx")}")).as("hx_raw"))
    bi.join(broadcast(firsts), "w1")
      .crossJoin(broadcast(tot))
      .agg(first("nb").as("n_bigrams"),
        sum(expr(s"-$condTermSql")).as("hcond_raw"),
        sum(expr(s"-${margTermSql("cxy")}")).as("hjoint_raw"))
      .crossJoin(broadcast(hx))
      .select(col("n_bigrams"),
        r4(col("hx_raw")).as("hx"),
        r4(col("hcond_raw")).as("hcond"),
        r4(col("hjoint_raw")).as("hjoint"))
  }

  // ---- M86: paired t-test ----

  private val pairedTSql =
    "((CAST(s1 AS DOUBLE) / n) / sqrt((s2 / n - (CAST(s1 AS DOUBLE) / n) * (s1 / n)) / (n - 1)))"

  /** M86: PAIRED T-TEST — per-customer mean order value, early era
    * (<1998) vs late era (≥1998), tested on the WITHIN-customer
    * differences (m74's Welch test treats the groups as independent;
    * pairing removes the between-customer variance). Money snaps to
    * exact integer cents at the sum (the q41 discipline), so each
    * customer's difference is the identical double on both engines;
    * the t closed-form runs once on the two difference power sums. */
  val m86PairedTtest: Q = (s, d) => {
    val base = orders(s, d).groupBy("o_custkey").agg(
      count(when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"), 1))
        .as("n1"),
      count(when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"), 1))
        .as("n2"),
      floor(sum(when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"),
        col("o_totalprice")).otherwise(0.0)) * 100 + lit(0.5))
        .cast("long").as("c1"),
      floor(sum(when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"),
        col("o_totalprice")).otherwise(0.0)) * 100 + lit(0.5))
        .cast("long").as("c2"))
      .where(col("n1") > 0 && col("n2") > 0)
      .withColumn("diff", expr(
        "CAST(c1 AS DOUBLE) / (100.0 * n1) - CAST(c2 AS DOUBLE) / (100.0 * n2)"))
    base.agg(count(lit(1)).as("n"),
        sum("diff").as("s1"), sum(expr("diff * diff")).as("s2"))
      .select(col("n"),
        r4(expr("CAST(s1 AS DOUBLE) / n")).as("mean_diff"),
        r4(expr(pairedTSql)).as("t_stat"))
  }

  // ---- A35: Hill tail-index estimator ----

  private val hillSql = "(CAST(k AS DOUBLE) / lsum)"

  /** A35: HILL ESTIMATOR — tail index α̂ = k / Σ ln(xᵢ/x₍k₎) over the
    * top k=200 order totals. α ≈ 1–2 flags a Pareto-heavy tail where
    * mean-based capacity planning fails (revenue, token counts, doc
    * lengths all behave this way); lt19 fits Zipf by regression, this
    * is the MLE form on the upper order statistics. Top-k is a
    * TakeOrdered (never a global sort), the threshold x₍k₎ one scalar
    * broadcast; the 200 ln() terms run on identical doubles. */
  val a35HillTail: Q = (s, d) => {
    val top = orders(s, d)
      .select(col("o_totalprice").as("x"), col("o_orderkey"))
      .orderBy(col("x").desc, col("o_orderkey").asc)
      .limit(200)
    val mn = top.agg(min("x").as("xk"), count(lit(1)).as("k"))
    top.crossJoin(broadcast(mn))
      .agg(first("k").as("k"), first("xk").as("xk_raw"),
        sum(expr("ln(x / xk)")).as("lsum"))
      .select(col("k"), r4(col("xk_raw")).as("xk"),
        r4(expr(hillSql)).as("alpha"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m83_pr_auc" -> m83PrAuc,
    "lt25_cond_entropy" -> lt25CondEntropy,
    "m86_paired_ttest" -> m86PairedTtest,
    "a35_hill_tail" -> a35HillTail)

  val oracleSql: Map[String, String] = Map(
    "m83_pr_auc" ->
      """WITH r AS (
        |  SELECT event_id, value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |w AS (
        |  SELECT y,
        |    row_number() OVER (ORDER BY value DESC, event_id) AS k,
        |    sum(y) OVER (ORDER BY value DESC, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
        |  FROM r)
        |SELECT CAST(sum(y) AS BIGINT) AS npos,
        |  round(sum(CASE WHEN y = 1 THEN CAST(tp AS DOUBLE) / k END)
        |    / sum(y), 4) AS pr_auc
        |FROM w""".stripMargin,
    "lt25_cond_entropy" ->
      s"""WITH bi AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1,
        |         split_part(bigram, ' ', 2) AS w2,
        |         CAST(count(*) AS BIGINT) AS cxy
        |  FROM (
        |    SELECT unnest(list_transform(range(len(string_split(text, ' ')) - 1),
        |      i -> string_split(text, ' ')[CAST(i + 1 AS INT)] || ' ' ||
        |           string_split(text, ' ')[CAST(i + 2 AS INT)])) AS bigram
        |    FROM documents)
        |  GROUP BY 1, 2),
        |firsts AS (SELECT w1, CAST(sum(cxy) AS BIGINT) AS cx FROM bi GROUP BY w1),
        |tot AS (SELECT CAST(sum(cxy) AS BIGINT) AS nb FROM bi),
        |hx_t AS (SELECT sum(-${margTermSql("cx")}) AS hx_raw
        |         FROM firsts CROSS JOIN tot),
        |m AS (
        |  SELECT any_value(nb) AS n_bigrams,
        |    sum(-$condTermSql) AS hcond_raw,
        |    sum(-${margTermSql("cxy")}) AS hjoint_raw
        |  FROM bi JOIN firsts USING (w1) CROSS JOIN tot)
        |SELECT n_bigrams, round(hx_raw, 4) AS hx, round(hcond_raw, 4) AS hcond,
        |  round(hjoint_raw, 4) AS hjoint
        |FROM m CROSS JOIN hx_t""".stripMargin,
    "m86_paired_ttest" ->
      s"""WITH per AS (
        |  SELECT o_custkey,
        |    CAST(count(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 END) AS BIGINT) AS n1,
        |    CAST(count(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 END) AS BIGINT) AS n2,
        |    CAST(floor(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |      THEN o_totalprice ELSE 0.0 END) * 100 + 0.5) AS BIGINT) AS c1,
        |    CAST(floor(sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |      THEN o_totalprice ELSE 0.0 END) * 100 + 0.5) AS BIGINT) AS c2
        |  FROM orders GROUP BY o_custkey
        |  HAVING n1 > 0 AND n2 > 0),
        |diffs AS (
        |  SELECT CAST(c1 AS DOUBLE) / (100.0 * n1)
        |       - CAST(c2 AS DOUBLE) / (100.0 * n2) AS diff
        |  FROM per),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(diff) AS s1,
        |    sum(diff * diff) AS s2
        |  FROM diffs)
        |SELECT n, round(CAST(s1 AS DOUBLE) / n, 4) AS mean_diff,
        |  round($pairedTSql, 4) AS t_stat
        |FROM agg""".stripMargin,
    "a35_hill_tail" ->
      s"""WITH top AS (
        |  SELECT o_totalprice AS x FROM orders
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 200),
        |mn AS (SELECT min(x) AS xk, CAST(count(*) AS BIGINT) AS k FROM top),
        |agg AS (
        |  SELECT any_value(k) AS k, any_value(xk) AS xk_raw,
        |    sum(ln(x / xk)) AS lsum
        |  FROM top CROSS JOIN mn)
        |SELECT k, round(xk_raw, 4) AS xk, round($hillSql, 4) AS alpha
        |FROM agg""".stripMargin)
}
