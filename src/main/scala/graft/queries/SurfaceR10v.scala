package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 22: retrieval depth + bounded fuzzy join —
  * pseudo-relevance-feedback query expansion (the two-stage retrieval
  * loop on top of ls4's BM25) and the threshold form of Levenshtein
  * (early-exit banded edit distance inside the codegen kernel — the
  * production trick for fuzzy joins, since distance-≤-k costs O(k·n)
  * not O(n²)).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.10 (fuzzy matching), §2.12 (retrieval).
  */
object SurfaceR10v extends QueryBatch {
  import Orc.{r4, rN}
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LF4: bounded-edit fuzzy join ----

  /** LF4: BOUNDED EDIT JOIN — lf2's blocked fuzzy join, but the
    * verifier is `levenshtein(a, b, 2)`: the THRESHOLD form computes
    * only a 2k+1-wide DP band and exits the moment the bound is
    * provably exceeded (returns −1), so the per-pair cost is O(k·len)
    * instead of O(len²). At fuzzy-dedup scale the verifier dominates —
    * this is the difference between "levenshtein then filter" and a
    * kernel that never does the wasted work. Oracle = the unbounded
    * distance filtered to the same band, so the early-exit semantics
    * are hash-checked. */
  val lf4BoundedEditJoin: Q = (s, d) => {
    val names = part(s, d).select(col("p_name")).distinct()
      .select(col("p_name"), element_at(split(col("p_name"), " "), -1).as("blk"))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        expr("levenshtein(a.p_name, b.p_name, 2)").cast("long").as("dist"))
      .where(col("dist") >= 1)
      .orderBy("name_a", "name_b")
  }

  // ---- LS5: pseudo-relevance-feedback query expansion ----

  /** BM25 partial scorer over (doc_id, tf, df) posting rows (ls4's
    * exact formula text — k1=1.2, b=0.75, Lucene positive idf). */
  private def bm25(postings: DataFrame, dl: DataFrame,
      stats: DataFrame): DataFrame =
    postings
      .join(dl, "doc_id").crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5d) / (col("df") + 0.5d) + 1.0d) *
          (col("tf") * 2.2d) /
          (col("tf") + ((col("dl") / col("avgdl")) * 0.75d + 0.25d) * 1.2d))
          .as("term_score"))
      .groupBy("doc_id").agg(rN(sum("term_score"), 8).as("score"))

  /** LS5: QUERY EXPANSION (RM3-lite) — retrieve with the seed query
    * (ls4's two rarest terms), take the top-5 docs as pseudo-relevant,
    * harvest the 3 highest tf-idf-weight non-seed terms from them
    * (stop-pruned like ls3), and re-retrieve with the expanded 5-term
    * query. The standard second hop that lifts recall when the seed
    * query undersells the topic. Both rounds touch ONLY the postings
    * of their query terms (broadcast term list ⋈ postings — the ls3
    * inverted-index discipline); the expansion-term pool is bounded by
    * the 5 pseudo-relevant docs. Every ranking cuts on the r8-rounded
    * score with a doc_id tiebreak (§5.3). */
  val ls5QueryExpansion: Q = (s, d) => {
    val docs = documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(size(split(col("text"), " "))).as("avgdl"))
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val seed = dfreq.orderBy(col("df").asc, col("tok").asc).limit(2)
      .select("tok", "df")
    val r1 = bm25(tf.join(broadcast(seed), "tok"), dl, stats)
    val rel = r1.orderBy(col("score").desc, col("doc_id").asc).limit(5)
      .select("doc_id")
    val expansion = tf.join(rel, "doc_id")
      .join(dfreq, "tok").crossJoin(broadcast(stats))
      .where(col("df") * 10 <= col("n_docs") * 9)
      .join(broadcast(seed.select(col("tok").as("seed_tok"))),
        col("tok") === col("seed_tok"), "left_anti")
      .groupBy("tok")
      .agg(rN(sum(col("tf") *
        (log((col("n_docs") + 1) / (col("df") + 1.0d)) + 1.0d)), 8).as("wt"))
      .orderBy(col("wt").desc, col("tok").asc).limit(3)
      .select("tok")
    val qterms = seed.select("tok").union(expansion).join(dfreq, "tok")
    val r2 = bm25(tf.join(broadcast(qterms), "tok"), dl, stats)
    r2.orderBy(col("score").desc, col("doc_id").asc).limit(5)
      .withColumn("rk", row_number().over(
        Windows.bounded(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("score"), col("rk"))
      .orderBy("rk")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lf4_bounded_edit_join" -> lf4BoundedEditJoin,
    "ls5_query_expansion" -> ls5QueryExpansion)

  val oracleSql: Map[String, String] = Map(
    "lf4_bounded_edit_join" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name FROM part),
        |blocked AS (
        |  SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM names)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM blocked a JOIN blocked b
        |  ON b.blk = a.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
        |ORDER BY name_a, name_b""".stripMargin,
    "ls5_query_expansion" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT tok, count(*) AS df
        |          FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
        |stats AS (SELECT count(*) AS n_docs,
        |            avg(len(string_split(text, ' '))) AS avgdl FROM documents),
        |dl AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
        |seed AS (SELECT tok, df FROM dfreq ORDER BY df ASC, tok ASC LIMIT 2),
        |r1 AS (
        |  SELECT tf.doc_id, round(sum(
        |    ln((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))
        |       + CAST(1 AS DOUBLE)) *
        |    (tf * CAST(2.2 AS DOUBLE)) /
        |    (tf + (CAST(dl AS DOUBLE) / avgdl * CAST(0.75 AS DOUBLE)
        |           + CAST(0.25 AS DOUBLE)) * CAST(1.2 AS DOUBLE))), 8) AS score
        |  FROM tf JOIN seed USING (tok) JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN stats GROUP BY tf.doc_id),
        |rel AS (SELECT doc_id FROM r1 ORDER BY score DESC, doc_id LIMIT 5),
        |expansion AS (
        |  SELECT tok FROM (
        |    SELECT tf.tok, round(sum(tf * (ln((n_docs + 1) / (df + CAST(1 AS DOUBLE)))
        |      + CAST(1 AS DOUBLE))), 8) AS wt
        |    FROM tf JOIN rel USING (doc_id)
        |    JOIN dfreq ON dfreq.tok = tf.tok
        |    CROSS JOIN stats
        |    WHERE df * 10 <= n_docs * 9
        |      AND tf.tok NOT IN (SELECT tok FROM seed)
        |    GROUP BY tf.tok)
        |  ORDER BY wt DESC, tok LIMIT 3),
        |q2 AS (SELECT tok FROM seed UNION ALL SELECT tok FROM expansion),
        |r2 AS (
        |  SELECT tf.doc_id, round(sum(
        |    ln((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))
        |       + CAST(1 AS DOUBLE)) *
        |    (tf * CAST(2.2 AS DOUBLE)) /
        |    (tf + (CAST(dl AS DOUBLE) / avgdl * CAST(0.75 AS DOUBLE)
        |           + CAST(0.25 AS DOUBLE)) * CAST(1.2 AS DOUBLE))), 8) AS score
        |  FROM tf JOIN q2 USING (tok)
        |  JOIN dfreq ON dfreq.tok = tf.tok
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN stats GROUP BY tf.doc_id),
        |ranked AS (SELECT doc_id, score,
        |             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
        |           FROM r2)
        |SELECT doc_id, score, rk FROM ranked WHERE rk <= 5 ORDER BY rk""".stripMargin)
}
