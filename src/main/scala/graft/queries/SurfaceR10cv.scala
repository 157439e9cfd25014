package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 100: capacity forecasting for the two most
  * shuffle-hungry joins a pipeline runs — the LSH banding self-join
  * and an arbitrary equi-join — from bucket/key statistics alone.
  *
  * Contrast with near-siblings: lp64 calibrates the banding's
  * PROBABILITY curve (match chance vs similarity); lt60 forecasts its
  * COST — Σ C(n,2) over band buckets IS the exact candidate-pair
  * count the verification stage will pay, computable from bucket
  * sizes without materializing a single pair, plus the max-bucket
  * share that decides whether the join needs salting. x13 profiles
  * ONE table's per-key skew; x25 forecasts a JOIN — Σ c_A(k)·c_B(k)
  * is the exact output cardinality of A ⋈ B, and the naive
  * independence estimate |A|·|B|/ndv sits alongside so the readout
  * quantifies how far skew drags reality from the textbook estimate
  * (the number an optimizer's row-count guess gets wrong).
  *
  * Float discipline: counts, products, and C(n,2) sums are exact
  * BIGINTs; the two ratios are single divisions.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (planning/ops); siblings lp64, l2b (PipelineOps),
  * x13 (SurfaceR8).
  */
object SurfaceR10cv extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LT60: LSH COST FORECAST — rebuild l2b's band keys (8 md5 min-
    * hashes over 3-shingles, 2 bands × 4 rows) and report, per band:
    * buckets, docs, the EXACT candidate-pair count ΣC(n,2) the
    * verification join would emit, the biggest bucket, and its share
    * of the pairs — the salt-or-not decision input, priced before any
    * pair is materialized.
    *
    * Scale shape: the signature build is the l2b pipeline (explode →
    * min-agg per hash); the forecast is one hash agg over bucket keys
    * — strictly cheaper than the join it prices.
    */
  val lt60LshCostForecast: Q = (s, d) => {
    val words = documents(s, d)
      .select(col("doc_id"),
        split(regexp_replace(lower(col("text")), "^\\W+|\\W+$", ""), "\\W+").as("w"))
    val shingles = words
      .where(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("w")) - 2)).as("i"), col("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("tok"))
      .distinct()
    val hashed = shingles.select(col("doc_id"), explode(array(
      (0 until 8).map(i => struct(lit(i).as("h"),
        md5(concat_ws(":", lit(i.toString), col("tok")).cast("binary")).as("hv"))): _*)).as("e"))
    val sigs = hashed.groupBy(col("doc_id"), col("e.h").as("h"))
      .agg(min("e.hv").as("sig"))
    // band keys EXACTLY as l2b builds them, so this forecast prices
    // l2b's verification join, not a lookalike
    val buckets = sigs
      .groupBy(col("doc_id"), floor(col("h") / 4).as("band"))
      .agg(concat_ws("|",
        max(when(col("h") % 4 === 0, col("sig"))),
        max(when(col("h") % 4 === 1, col("sig"))),
        max(when(col("h") % 4 === 2, col("sig"))),
        max(when(col("h") % 4 === 3, col("sig")))).as("bkey"))
      .groupBy("band", "bkey").agg(count(lit(1)).as("n"))
    buckets.groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
        sum("n").as("n_docs"),
        sum(expr("n * (n - 1) DIV 2")).as("cand_pairs"),
        max("n").as("max_bucket"),
        max(expr("n * (n - 1) DIV 2")).as("max_pairs"))
      .select(col("band"), col("n_buckets"), col("n_docs"),
        col("cand_pairs"), col("max_bucket"),
        r4(expr("CASE WHEN cand_pairs = 0 THEN 0.0 " +
          "ELSE CAST(max_pairs AS DOUBLE) / cand_pairs END"))
          .as("top_bucket_share"))
      .orderBy("band")
  }

  /** X25: JOIN SIZE PROFILE — the events.user_id self-join, priced
    * without running it: exact output rows Σc(u)², the independence
    * estimate n²/ndv, and their ratio (the skew multiplier an
    * optimizer's guess misses). One row.
    */
  val x25JoinSizeProfile: Q = (s, d) => {
    val perKey = events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("c"))
    perKey.agg(count(lit(1)).as("ndv"), sum("c").as("n"),
        sum(expr("c * c")).as("exact_rows"))
      .select(col("n"), col("ndv"), col("exact_rows"),
        r4(expr("CAST(n AS DOUBLE) * n / ndv")).as("est_rows"),
        r4(expr("CAST(exact_rows AS DOUBLE) * ndv / (CAST(n AS DOUBLE) * n)"))
          .as("skew_multiplier"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt60_lsh_cost_forecast" -> lt60LshCostForecast,
    "x25_join_size_profile" -> x25JoinSizeProfile)

  val oracleSql: Map[String, String] = Map(
    "lt60_lsh_cost_forecast" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(
        |    regexp_replace(lower(text), '^\W+|\W+$', '', 'g'), '\W+') AS w
        |  FROM documents),
        |toks AS (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(list_slice(w, i, i + 2), ' ') AS tok
        |  FROM (SELECT doc_id, w,
        |          unnest(range(1, len(w) - 1)) AS i FROM words)),
        |h AS (
        |  SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || tok)) AS sig
        |  FROM toks CROSS JOIN (SELECT unnest(range(8)) AS i)
        |  GROUP BY doc_id, i),
        |b AS (
        |  SELECT doc_id, CAST(floor(i / 4) AS BIGINT) AS band,
        |    max(CASE WHEN i % 4 = 0 THEN sig END) || '|' ||
        |    max(CASE WHEN i % 4 = 1 THEN sig END) || '|' ||
        |    max(CASE WHEN i % 4 = 2 THEN sig END) || '|' ||
        |    max(CASE WHEN i % 4 = 3 THEN sig END) AS bkey
        |  FROM h GROUP BY doc_id, band),
        |buckets AS (
        |  SELECT band, bkey, CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(n) AS BIGINT) AS n_docs,
        |  CAST(sum(n * (n - 1) // 2) AS BIGINT) AS cand_pairs,
        |  CAST(max(n) AS BIGINT) AS max_bucket,
        |  round(CASE WHEN sum(n * (n - 1) // 2) = 0 THEN 0.0
        |    ELSE CAST(max(n * (n - 1) // 2) AS DOUBLE)
        |      / sum(n * (n - 1) // 2) END, 4) AS top_bucket_share
        |FROM buckets GROUP BY band ORDER BY band""".stripMargin,
    "x25_join_size_profile" ->
      """WITH per_key AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS ndv,
        |    CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(c * c) AS BIGINT) AS exact_rows
        |  FROM per_key)
        |SELECT n, ndv, exact_rows,
        |  round(CAST(n AS DOUBLE) * n / ndv, 4) AS est_rows,
        |  round(CAST(exact_rows AS DOUBLE) * ndv / (CAST(n AS DOUBLE) * n), 4)
        |    AS skew_multiplier
        |FROM m""".stripMargin)
}
