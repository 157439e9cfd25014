package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 51: sequential testing + corpus scoring —
  * Wald's SPRT (the always-valid sequential A/B decision rule: walk
  * the cumulative log-likelihood ratio day by day and stop at the
  * first boundary crossing — peeking is the point, not a sin) and
  * per-source unigram perplexity (which source does the corpus LM
  * find most surprising — the aggregate view of the l15/lp38
  * Moore–Lewis family used for mixture decisions).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (A/B analytics), §2.12 (corpus scoring).
  */
object SurfaceR10ay extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M137: SPRT ----

  /** Per-day LLR increment for H1: p=0.22 vs H0: p=0.20 —
    * x·ln(p1/p0) + (n−x)·ln((1−p1)/(1−p0)) from exact integer daily
    * (purchases, trials). The two ln factors are literal-constant
    * expressions evaluated identically on both engines. */
  private val sprtInc =
    "(x * ln(0.22 / 0.20) + (n_t - x) * ln(0.78 / 0.80))"
  private val sprtHi = "ln((1.0 - 0.2) / 0.05)" // ln((1-β)/α), α=0.05 β=0.2
  private val sprtLo = "ln(0.2 / (1.0 - 0.05))" // ln(β/(1-α))

  /** M137: SPRT — the purchase-rate sequential test: per day,
    * trials = events, successes = purchases; the cumulative LLR
    * (bounded-series cumsum over calendar days) is compared against
    * Wald's boundaries A = ln((1−β)/α), B = ln(β/(1−α)). Output: the
    * boundary constants, the final LLR, the first crossing day and
    * the decision (accept_h1 / accept_h0 / continue) — i.e. how many
    * days of data the experiment actually needed, which is the whole
    * reason sequential tests exist. Daily cells are exact integers;
    * the walk is one [[graft.Windows.bounded]] cumsum; first-crossing
    * extraction is a conditional min over the bounded series. */
  val m137Sprt: Q = (s, d) => {
    val daily = events(s, d)
      .select(expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_t"), sum("y").as("x"))
    val w = graft.Windows.bounded(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    daily
      .withColumn("llr", sum(expr(sprtInc)).over(w))
      .agg(count(lit(1)).as("n_days"),
        min(when(expr(s"llr >= $sprtHi"), col("day"))).as("hi_day"),
        min(when(expr(s"llr <= $sprtLo"), col("day"))).as("lo_day"),
        sum(expr(sprtInc)).as("llr_final"))
      .select(col("n_days"),
        r4(expr(sprtHi)).as("bound_hi"),
        r4(expr(sprtLo)).as("bound_lo"),
        r4(col("llr_final")).as("llr_final"),
        coalesce(col("hi_day"), lit(-1L)).as("first_hi_day"),
        coalesce(col("lo_day"), lit(-1L)).as("first_lo_day"),
        expr(
          "CASE WHEN coalesce(hi_day, -1) >= 0 AND (coalesce(lo_day, -1) < 0 OR coalesce(hi_day, -1) <= coalesce(lo_day, -1)) THEN 'accept_h1' WHEN coalesce(lo_day, -1) >= 0 THEN 'accept_h0' ELSE 'continue' END")
          .as("decision"))
  }

  // ---- LT40: per-source perplexity ----

  private val nllTerm =
    "(cnt * (ln(CAST(tot + v AS DOUBLE)) - ln(CAST(c + 1 AS DOUBLE))))"

  /** LT40: SOURCE PERPLEXITY — add-1-smoothed corpus unigram LM
    * p(t) = (c_t+1)/(T+V), then per source the mean negative
    * log-likelihood of its tokens and PP = e^mean_nll. A source whose
    * PP is far above the corpus's own is out-of-distribution — the
    * aggregate that decides up/down-weighting before lp38 picks
    * individual documents. (source, token) counts are exact integers;
    * the vocab is a broadcast join; only the ~|V|·|sources| bounded
    * nll terms touch floats, reported as a MEAN (the m136 lesson —
    * never round a raw ln sum). */
  val lt40SourcePerplexity: Q = (s, d) => {
    val toks = documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val consts = vocab.agg(sum("c").as("tot"), count(lit(1)).as("v"))
    val st = toks.groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    st.join(broadcast(vocab), "tok")
      .crossJoin(broadcast(consts))
      .groupBy("source")
      .agg(sum("cnt").as("n_tokens"),
        sum(expr(nllTerm)).as("nll_raw"))
      .select(col("source"), col("n_tokens"),
        r4(expr("nll_raw / n_tokens")).as("mean_nll"),
        r4(expr("exp(nll_raw / n_tokens)")).as("perplexity"))
      .orderBy("source")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m137_sprt" -> m137Sprt,
    "lt40_source_perplexity" -> lt40SourcePerplexity)

  val oracleSql: Map[String, String] = Map(
    "m137_sprt" ->
      s"""WITH daily AS (
        |  SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |walk AS (
        |  SELECT day, n_t, x,
        |    sum($sprtInc) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
        |  FROM daily),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    min(CASE WHEN llr >= $sprtHi THEN day END) AS hi_day,
        |    min(CASE WHEN llr <= $sprtLo THEN day END) AS lo_day,
        |    sum($sprtInc) AS llr_final
        |  FROM walk)
        |SELECT n_days,
        |  round($sprtHi, 4) AS bound_hi,
        |  round($sprtLo, 4) AS bound_lo,
        |  round(llr_final, 4) AS llr_final,
        |  CAST(coalesce(hi_day, -1) AS BIGINT) AS first_hi_day,
        |  CAST(coalesce(lo_day, -1) AS BIGINT) AS first_lo_day,
        |  CASE WHEN coalesce(hi_day, -1) >= 0 AND (coalesce(lo_day, -1) < 0 OR coalesce(hi_day, -1) <= coalesce(lo_day, -1)) THEN 'accept_h1' WHEN coalesce(lo_day, -1) >= 0 THEN 'accept_h0' ELSE 'continue' END AS decision
        |FROM agg""".stripMargin,
    "lt40_source_perplexity" ->
      s"""WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
        |consts AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS v FROM vocab),
        |st AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    sum($nllTerm) AS nll_raw
        |  FROM st JOIN vocab USING (tok) CROSS JOIN consts
        |  GROUP BY 1)
        |SELECT source, n_tokens,
        |  round(nll_raw / n_tokens, 4) AS mean_nll,
        |  round(exp(nll_raw / n_tokens), 4) AS perplexity
        |FROM agg ORDER BY source""".stripMargin)
}
