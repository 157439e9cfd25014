package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 14: corpus-curation diagnostics + sampling —
  * per-document shingle-duplication ratio (the near-dup triage signal
  * that tells you WHICH side of a minhash candidate is the copy),
  * token burstiness (Fano factor — content words burst, function words
  * don't), deterministic per-group reservoir sampling, and
  * largest-remainder quota allocation for corpus mixing.
  *
  * Everything here is exact-integer until one shared final formula —
  * the SurfaceR10l float discipline.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.10–§2.12 (LLM pipeline).
  */
object SurfaceR10n extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT23: shingle duplication ratio ----

  private val dupRatioSql = "(CAST(n_dup AS DOUBLE) / n_shingles)"

  /** LT23: SHINGLE DUP RATIO — for every document, the fraction of its
    * DISTINCT word-3-gram shingles that occur in at least one other
    * document. MinHash (l2b) says "these two docs are similar"; this
    * says "83% of THIS doc is boilerplate shared with the corpus" — the
    * per-doc triage signal used to pick the canonical copy and to spot
    * template farms. Plan: distinct shingles per doc (narrow explode),
    * shingle→doc-count agg (shuffle on shingle — the same key the l2b
    * band join uses), join back, per-doc agg. All counts exact. */
  val lt23ShingleDupRatio: Q = (s, d) => {
    val sh = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))"))
        .as("sh"))
    val cnt = sh.groupBy("sh").agg(count(lit(1)).as("nd"))
    sh.join(cnt, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("nd") > 1, 1)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        r4(expr(dupRatioSql)).as("dup_ratio"))
      .orderBy("doc_id")
  }

  // ---- LT24: token burstiness ----

  private val fanoSql =
    "(CAST(s2 AS DOUBLE) / s1 - CAST(s1 AS DOUBLE) / dd)"

  /** LT24: TOKEN BURSTINESS — the Fano factor (variance-to-mean ratio
    * of per-document counts, zeros included) for every token with
    * corpus frequency ≥ 100. Function words spread evenly (factor ≈ 1,
    * Poisson); content/boilerplate words clump (factor ≫ 1) — the
    * signal separating topical vocabulary from glue, used to pick
    * keyword candidates and spot spam templates. Var/mean reduces to
    * s2/s1 − s1/D on exact power sums, so the only float work is one
    * shared division pair. Two hash aggs, map-side combinable. */
  val lt24Burstiness: Q = (s, d) => {
    val dd = documents(s, d).agg(count(lit(1)).as("dd"))
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("tok").agg(sum("c").as("s1"), sum(expr("c * c")).as("s2"))
      .where(col("s1") >= 100)
      .crossJoin(broadcast(dd))
      .select(col("tok"), col("s1"), r4(expr(fanoSql)).as("fano"))
      .orderBy("tok")
  }

  // ---- LP36: deterministic reservoir per group ----

  /** LP36: RESERVOIR-K PER GROUP — exactly 20 documents per language,
    * drawn by md5 order (a pure function of doc_id, so the draw
    * survives repartitioning and reruns — the lp5/lp10 idiom, here in
    * fixed-count-per-stratum form vs lp2's fixed-fraction). The window
    * is PARTITIONED by language; at fleet scale the same draw runs as
    * a per-group top-k heap (graft.operators.Similarity's TopKByScore
    * shape) — rank-by-hash is order-equivalent, so swapping the
    * executor changes nothing downstream. */
  val lp36ReservoirPerGroup: Q = (s, d) => {
    val w = Window.partitionBy("lang")
      .orderBy(col("rk").asc, col("doc_id").asc)
    documents(s, d)
      .select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("rk"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 20)
      .select("lang", "rn", "doc_id")
      .orderBy("lang", "rn")
  }

  // ---- LP37: largest-remainder quota allocation ----

  /** LP37: QUOTA ALLOCATION — split a fixed sampling budget (T=100
    * docs) across languages proportionally by largest-remainder
    * (Hamilton's method): base = ⌊T·n/N⌋, then the T−Σbase leftover
    * seats go to the largest remainders. The integer-exact form of the
    * mixing-weight computation feeding l14/lp29 — quotas sum to T by
    * construction, no float drift. The ranking window runs over the
    * per-language aggregate (bounded by #languages — Windows.bounded),
    * so nothing data-scaling funnels through one task. */
  val lp37QuotaAllocation: Q = (s, d) => {
    val langs = documents(s, d).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
    val n = langs.agg(sum("n_docs").as("nn"))
    val withBase = langs.crossJoin(broadcast(n))
      .withColumn("base", expr("(100 * n_docs) div nn"))
      .withColumn("rem", expr("(100 * n_docs) % nn"))
    val leftover = withBase.agg((lit(100) - sum("base")).as("leftover"))
    withBase.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(
        Windows.bounded(col("rem").desc, col("lang").asc)))
      .withColumn("extra", when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col("lang"), col("n_docs"), col("base"),
        col("extra"), (col("base") + col("extra")).as("quota"))
      .orderBy("lang")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt23_shingle_dup_ratio" -> lt23ShingleDupRatio,
    "lt24_burstiness" -> lt24Burstiness,
    "lp36_reservoir_per_group" -> lp36ReservoirPerGroup,
    "lp37_quota_allocation" -> lp37QuotaAllocation)

  val oracleSql: Map[String, String] = Map(
    "lt23_shingle_dup_ratio" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh0 AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(len(tk) - 2),
        |    i -> tk[CAST(i + 1 AS INT)] || ' ' || tk[CAST(i + 2 AS INT)]
        |         || ' ' || tk[CAST(i + 3 AS INT)]))) AS sh
        |  FROM toks),
        |cnt AS (SELECT sh, CAST(count(*) AS BIGINT) AS nd FROM sh0 GROUP BY sh),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(count(CASE WHEN nd > 1 THEN 1 END) AS BIGINT) AS n_dup
        |  FROM sh0 JOIN cnt USING (sh) GROUP BY doc_id)
        |SELECT doc_id, n_shingles, n_dup, round($dupRatioSql, 4) AS dup_ratio
        |FROM per ORDER BY doc_id""".stripMargin,
    "lt24_burstiness" ->
      s"""WITH dd_t AS (SELECT CAST(count(*) AS BIGINT) AS dd FROM documents),
        |per AS (
        |  SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY tok, doc_id),
        |st AS (
        |  SELECT tok, CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM per GROUP BY tok HAVING sum(c) >= 100)
        |SELECT tok, s1, round($fanoSql, 4) AS fano
        |FROM st CROSS JOIN dd_t ORDER BY tok""".stripMargin,
    "lp36_reservoir_per_group" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(doc_id || ''), doc_id) AS INT) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    "lp37_quota_allocation" ->
      """WITH langs AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY lang),
        |n_t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn FROM langs),
        |base_t AS (
        |  SELECT lang, n_docs,
        |    CAST((100 * n_docs) // nn AS BIGINT) AS base,
        |    CAST((100 * n_docs) % nn AS BIGINT) AS rem
        |  FROM langs CROSS JOIN n_t),
        |left_t AS (SELECT CAST(100 - sum(base) AS BIGINT) AS leftover FROM base_t),
        |ranked AS (
        |  SELECT lang, n_docs, base, rem, leftover,
        |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
        |  FROM base_t CROSS JOIN left_t)
        |SELECT lang, n_docs, base,
        |  CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM ranked ORDER BY lang""".stripMargin)
}
