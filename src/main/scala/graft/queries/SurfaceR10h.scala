package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 8: the COUNT-DISTINCT-OVER-WINDOW rewrite
  * (Spark disallows DISTINCT in window aggregates — the first-occurrence
  * decomposition is the scalable equivalent) plus three corpus-analysis
  * operators a training-data pipeline reports on every snapshot: bigram
  * LM scoring, per-document token entropy, and the Zipf tail fit.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.5 (windows), §2.10 (text analysis).
  */
object SurfaceR10h extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** W13: RUNNING DISTINCT COUNT per key — "how many distinct parts has
    * this supplier ever shipped, as of each ship date". Spark rejects
    * `count(DISTINCT x) OVER (...)` outright, and the naive rewrite
    * (collect_set over a running frame) is O(frame²) memory. The
    * scalable decomposition: a (key, value) first-occurrence aggregate,
    * rolled up to new-values-per-date, then a plain running SUM window —
    * every step a hash agg or a keyed window, nothing grows with frame
    * length. The oracle is DuckDB's native window DISTINCT, so the
    * rewrite's equivalence is hash-checked row by row. */
  val w13DistinctWindow: Q = (s, d) => {
    val li = lineitem(s, d)
    val firstSeen = li.groupBy("l_suppkey", "l_partkey")
      .agg(min(col("l_shipdate")).as("d0"))
    val newPerDate = firstSeen.groupBy(col("l_suppkey"), col("d0").as("ds"))
      .agg(count(lit(1)).as("n_new"))
    val grain = li.select(col("l_suppkey"), col("l_shipdate").as("ds")).distinct()
    val w = Window.partitionBy("l_suppkey").orderBy("ds")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grain.join(newPerDate, Seq("l_suppkey", "ds"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .select(col("l_suppkey"), col("ds"),
        sum(col("n_new")).over(w).as("distinct_parts"))
      .orderBy("l_suppkey", "ds")
  }

  /** L16: BIGRAM LM SCORING — add-one-smoothed bigram log-likelihood per
    * document, the next step up from l15's unigram perplexity proxy
    * (catches shuffled/templated text that unigram stats score as
    * fluent). ln P(w2|w1) = ln((c12+1)/(c1+V)); per-doc average over its
    * bigrams. Bigram extraction is a narrow array transform (no
    * self-join on positions); the model side is two hash aggs whose
    * size tracks vocabulary², collected nowhere — the scoring join is a
    * plain equi-join on (w1, w2) that scales with corpus tokens. */
  val l16BigramLm: Q = (s, d) => {
    val bi = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val v = documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("vsz"))
    bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        r4(avg(log((col("c12") + 1.0) / (col("c1") + col("vsz")))))
          .as("avg_lp"))
      .orderBy("doc_id")
  }

  /** LT18: TOKEN ENTROPY per document — Shannon entropy of the token
    * distribution plus type-token ratio, the two standard repetition/
    * diversity screens (a low-entropy doc is boilerplate or spam; TTR
    * near 0 is a copy loop). Uses the exact identity
    * H = ln(m) − (Σ c·ln c)/m so the whole thing is one (doc, tok)
    * hash agg and one per-doc rollup — no per-doc normalization pass. */
  val lt18TokenEntropy: Q = (s, d) => {
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("m"), count(lit(1)).as("types"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clc"))
      .select(col("doc_id"), col("m"), col("types"),
        r4(log(col("m").cast("double")) - col("clc") / col("m")).as("entropy"),
        r4(col("types").cast("double") / col("m")).as("ttr"))
      .orderBy("doc_id")
  }

  /** LT19: ZIPF TAIL FIT — regress ln(freq) on ln(rank) over the top
    * 1,000 corpus tokens; natural text sits near slope −1, and a corpus
    * whose slope drifts (template spam flattens it, dedup artifacts
    * steepen it) fails the snapshot gate. Vocabulary aggregation scales
    * with corpus; the rank window runs on the LIMIT-bounded top-1,000
    * only (TakeOrdered is distributed; the bounded window uses the
    * sanctioned non-foldable key so the single-partition tripwire stays
    * armed for real facts). */
  val lt19ZipfFit: Q = (s, d) => {
    val top = documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(1000)
    top
      .withColumn("rk", row_number().over(
        graft.Windows.bounded(col("n").desc, col("tok").asc)).cast("double"))
      .agg(count(lit(1)).as("n_terms"),
        r4(expr("regr_slope(ln(CAST(n AS DOUBLE)), ln(rk))")).as("slope"),
        r4(expr("regr_intercept(ln(CAST(n AS DOUBLE)), ln(rk))")).as("icept"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "w13_distinct_window" -> w13DistinctWindow,
    "l16_bigram_lm" -> l16BigramLm,
    "lt18_token_entropy" -> lt18TokenEntropy,
    "lt19_zipf_fit" -> lt19ZipfFit)

  val oracleSql: Map[String, String] = Map(
    "w13_distinct_window" ->
      """SELECT DISTINCT l_suppkey, l_shipdate AS ds,
        |  count(DISTINCT l_partkey) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS distinct_parts
        |FROM lineitem ORDER BY l_suppkey, ds""".stripMargin,
    "l16_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |bi AS (
        |  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
        |  FROM toks a JOIN toks b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS vsz FROM toks)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(ln((c12 + 1.0) / (c1 + vsz))), 4) AS avg_lp
        |FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "lt18_token_entropy" ->
      """WITH tc AS (
        |  SELECT doc_id, tok, count(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS m,
        |         count(*) AS types,
        |         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clc
        |  FROM tc GROUP BY 1)
        |SELECT doc_id, m, types,
        |  round(ln(CAST(m AS DOUBLE)) - clc / m, 4) AS entropy,
        |  round(CAST(types AS DOUBLE) / m, 4) AS ttr
        |FROM agg ORDER BY doc_id""".stripMargin,
    "lt19_zipf_fit" ->
      """WITH vocab AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok ORDER BY n DESC, tok LIMIT 1000),
        |ranked AS (
        |  SELECT n, CAST(row_number() OVER (ORDER BY n DESC, tok) AS DOUBLE) AS rk
        |  FROM vocab)
        |SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  round(regr_slope(ln(CAST(n AS DOUBLE)), ln(rk)), 4) AS slope,
        |  round(regr_intercept(ln(CAST(n AS DOUBLE)), ln(rk)), 4) AS icept
        |FROM ranked""".stripMargin)
}
