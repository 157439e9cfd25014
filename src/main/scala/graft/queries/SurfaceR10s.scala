package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 19: pipeline economics + experiment metrics —
  * tokenizer fertility per language (the multilingual token-budget
  * number), the dedup-inflation report (what exact dedup actually buys
  * per source), the cluster-robust ratio-metric CI (the delta-method
  * analysis every per-user ratio metric needs), and expected
  * calibration error on m33's exact-integer score construction.
  *
  * Float discipline per SurfaceR10l throughout.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11–§2.13.
  */
object SurfaceR10s extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LP40: tokenizer fertility ----

  private val fertSql = "(CAST(sum_chars AS DOUBLE) / sum_tokens)"

  /** LP40: TOKENIZER FERTILITY — characters per whitespace token by
    * language. On real corpora this is THE multilingual budget number:
    * a language whose tokens carry fewer characters burns more
    * sequence positions per unit of text, so sampling weights and
    * context budgets must correct for it. One narrow aggregate; exact
    * character/token counts. */
  val lp40TokenizerFertility: Q = (s, d) =>
    documents(s, d)
      .select(col("lang"), length(col("text")).cast("long").as("nc"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nc").as("sum_chars"),
        sum("nt").as("sum_tokens"))
      .select(col("lang"), col("n_docs"), col("sum_chars"),
        col("sum_tokens"), r4(expr(fertSql)).as("chars_per_token"))
      .orderBy("lang")

  // ---- LT28: dedup inflation report ----

  private val inflSql =
    "(CASE WHEN sum_tokens > dup_tokens " +
      "THEN CAST(sum_tokens AS DOUBLE) / (sum_tokens - dup_tokens) END)"

  /** LT28: DEDUP INFLATION — per source: how many documents and tokens
    * are exact duplicates of an earlier document (keep-first by global
    * doc_id), and the inflation factor raw/unique. The ROI readout for
    * the l1 dedup stage: a source with inflation 2× is half mirror
    * content, and its crawl priority should say so. Content-hash agg
    * (the l1 shuffle key) joined back to attribute each duplicate to
    * its source — never comparing text, only 16-byte hashes. */
  val lt28DupInflation: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("source"),
      md5(col("text")).as("h"),
      size(split(col("text"), " ")).cast("long").as("nt"))
    val keeper = docs.groupBy("h").agg(min("doc_id").as("keep_id"))
    docs.join(keeper, "h")
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("is_dup"), 1)).as("dup_docs"),
        sum("nt").as("sum_tokens"),
        sum(when(col("is_dup"), col("nt")).otherwise(0L)).as("dup_tokens"))
      .select(col("source"), col("n_docs"), col("dup_docs"),
        col("sum_tokens"), col("dup_tokens"),
        r4(expr(inflSql)).as("inflation"))
      .orderBy("source")
  }

  // ---- M89: cluster-robust ratio-metric CI ----

  private val ratioSql = "(CAST(sx AS DOUBLE) / sy)"
  private val ratioSeSql =
    s"(sqrt((CAST(n AS DOUBLE) / (n - 1)) * " +
      s"(sxx - 2.0 * $ratioSql * sxy + $ratioSql * $ratioSql * syy)) / sy)"

  /** M89: RATIO-METRIC CI — revenue-per-event with the user as the
    * randomization unit: R = Σxᵢ/Σyᵢ over per-user (revenue, events)
    * pairs, SE by the delta-method linearization
    * √(n/(n−1)·Σ(xᵢ−Ryᵢ)²)/Σy. Naive per-event variance understates
    * the spread of any per-user ratio metric (events cluster within
    * users); this is the correct experiment readout for "did revenue
    * per event move". Revenue snaps to exact integer cents per event
    * (q41 discipline), so all five power sums are exact integers. */
  val m89RatioMetricCi: Q = (s, d) => {
    val per = events(s, d)
      .select(col("user_id"),
        when(col("event_type") === "purchase",
          floor(col("value") * 100 + lit(0.5)).cast("long"))
          .otherwise(0L).as("xc"),
        lit(1L).as("one"))
      .groupBy("user_id")
      .agg(sum("xc").as("x"), sum("one").as("y"))
    per.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
        sum(expr("x * y")).as("sxy"))
      .select(col("n").as("n_users"),
        r4(expr(s"$ratioSql / 100.0")).as("rev_per_event"),
        r4(expr(s"$ratioSeSql / 100.0")).as("se"),
        r4(expr(s"($ratioSql - 1.96 * $ratioSeSql) / 100.0")).as("ci_lo"),
        r4(expr(s"($ratioSql + 1.96 * $ratioSeSql) / 100.0")).as("ci_hi"))
  }

  // ---- M90: expected calibration error ----

  private val eceTermSql =
    "((CAST(n AS DOUBLE) / nn) * abs(CAST(npos AS DOUBLE) / n - CAST(ssum AS DOUBLE) / (256.0 * n)))"

  /** M90: EXPECTED CALIBRATION ERROR — the scalar that summarizes
    * m33's reliability diagram: Σ_b (n_b/N)·|acc_b − conf_b| over the
    * same ten fixed-width bins of the md5-uniform score (an exact
    * 2-hex-digit integer / 256, so every term is a ratio of exact
    * integers). The "one number" a model-quality dashboard tracks
    * between full calibration plots. */
  val m90Ece: Q = (s, d) => {
    val e = events(s, d).select(
      expr("""((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
             | (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1))
             |""".stripMargin.replaceAll("\n", "")).as("s256"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val bins = e.withColumn("bin", least(expr("(s256 * 10) div 256"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("s256").as("ssum"), sum("y").as("npos"))
    val tot = bins.agg(sum("n").as("nn"))
    bins.crossJoin(broadcast(tot))
      .agg(first("nn").as("n_events"),
        count(lit(1)).as("n_bins"),
        sum(expr(eceTermSql)).as("ece_raw"))
      .select(col("n_events"), col("n_bins"), r4(col("ece_raw")).as("ece"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp40_tokenizer_fertility" -> lp40TokenizerFertility,
    "lt28_dup_inflation" -> lt28DupInflation,
    "m89_ratio_metric_ci" -> m89RatioMetricCi,
    "m90_ece" -> m90Ece)

  val oracleSql: Map[String, String] = Map(
    "lp40_tokenizer_fertility" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
        |  round((CAST(sum(length(text)) AS DOUBLE) /
        |         sum(len(string_split(text, ' ')))), 4) AS chars_per_token
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "lt28_dup_inflation" ->
      s"""WITH docs AS (
        |  SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |keeper AS (SELECT h, CAST(min(doc_id) AS BIGINT) AS keep_id
        |           FROM docs GROUP BY h),
        |tagged AS (
        |  SELECT source, nt, doc_id <> keep_id AS is_dup
        |  FROM docs JOIN keeper USING (h)),
        |agg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(CASE WHEN is_dup THEN 1 END) AS BIGINT) AS dup_docs,
        |    CAST(sum(nt) AS BIGINT) AS sum_tokens,
        |    CAST(sum(CASE WHEN is_dup THEN nt ELSE 0 END) AS BIGINT) AS dup_tokens
        |  FROM tagged GROUP BY source)
        |SELECT source, n_docs, dup_docs, sum_tokens, dup_tokens,
        |  round($inflSql, 4) AS inflation
        |FROM agg ORDER BY source""".stripMargin,
    "m89_ratio_metric_ci" ->
      s"""WITH per AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM per)
        |SELECT n AS n_users,
        |  round($ratioSql / 100.0, 4) AS rev_per_event,
        |  round($ratioSeSql / 100.0, 4) AS se,
        |  round(($ratioSql - 1.96 * $ratioSeSql) / 100.0, 4) AS ci_lo,
        |  round(($ratioSql + 1.96 * $ratioSeSql) / 100.0, 4) AS ci_hi
        |FROM agg""".stripMargin,
    "m90_ece" ->
      s"""WITH e AS (
        |  SELECT ((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1)) AS s256,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |bins AS (
        |  SELECT least((s256 * 10) // 256, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(s256) AS BIGINT) AS ssum,
        |    CAST(sum(y) AS BIGINT) AS npos
        |  FROM e GROUP BY bin),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM bins)
        |SELECT any_value(nn) AS n_events, CAST(count(*) AS BIGINT) AS n_bins,
        |  round(sum($eceTermSql), 4) AS ece
        |FROM bins CROSS JOIN tot""".stripMargin)
}
