package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 27: curation decisions — the quarantine
  * router (every audit signal fused into ONE per-document verdict with
  * a reason code — the op that actually gates what enters the corpus)
  * and the train/test split-leakage audit (shingle overlap BETWEEN the
  * pipeline's own splits, the evaluation-integrity twin of l13's
  * benchmark contamination).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11–§2.12.
  */
object SurfaceR10aa extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LP45: quarantine routing ----

  /** LP45: QUARANTINE ROUTER — one verdict per document from the audit
    * signals, with a FIXED precedence (dup > too-short > unknown-lang >
    * repetitive), so every rejection carries its primary reason code:
    * exact duplicates drop (keep-first), sub-20-token docs drop,
    * stopword-argmax 'und' docs route to review, docs whose distinct-
    * token ratio collapses below 0.3 route to review, the rest keep.
    * This is the decision op the audit family (l1, lg, l12, lq) feeds
    * in a real pipeline — one content-hash join plus narrow per-row
    * rules, no new shuffle beyond l1's. */
  val lp45QuarantineRouter: Q = (s, d) => {
    val docs = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("text"), col("toks"),
        md5(col("text")).as("h"),
        size(col("toks")).cast("long").as("nt"),
        size(array_distinct(col("toks"))).cast("long").as("nu"),
        graft.operators.TextOps.langIdPredict(col("toks")).as("pl"))
    val keeper = docs.groupBy("h").agg(min("doc_id").as("keep_id"))
    docs.join(keeper, "h")
      .select(col("doc_id"),
        when(col("doc_id") =!= col("keep_id"), "reject:exact_dup")
          .when(col("nt") < 20, "reject:too_short")
          .when(col("pl") === "und", "review:unknown_lang")
          .when(col("nu") * 10 < col("nt") * 3, "review:repetitive")
          .otherwise("keep").as("verdict"))
      .orderBy("doc_id")
  }

  // ---- LP46: split-leakage audit ----

  private val leakSql = "(CAST(n_shared AS DOUBLE) / n_test)"

  /** LP46: SPLIT LEAKAGE — distinct word-3-gram shingles shared
    * between the lp10 md5 train split (buckets 0–79) and test split
    * (buckets 90–99): the held-out set is only held out if its
    * n-grams aren't sitting in train verbatim. One row: shingle
    * volumes per side, the overlap, and the leak rate over the test
    * side. Same shingle-keyed equi-join shape as lt27 — the count is
    * exact, not sketched, because the oracle (and an honest eval
    * audit) needs the true number. */
  val lp46SplitLeakage: Q = (s, d) => {
    val bucket =
      "((instr('0123456789abcdef', substr(md5(doc_id || ''), 1, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substr(md5(doc_id || ''), 2, 1)) - 1)) % 100"
    val sh = documents(s, d)
      .withColumn("tk", split(col("text"), " "))
      .where(size(col("tk")) >= 3)
      .withColumn("bucket", expr(bucket))
      .where(col("bucket") < 80 || col("bucket") >= 90)
      .select((col("bucket") < 80).as("in_train"), explode(expr(
        "transform(sequence(0, size(tk) - 3), " +
          "i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2]))")).as("sh"))
      .distinct()
    val sides = sh.groupBy("sh").agg(
      max(when(col("in_train"), 1).otherwise(0)).as("tr"),
      max(when(!col("in_train"), 1).otherwise(0)).as("te"))
    sides.agg(
        sum("tr").as("n_train"), sum("te").as("n_test"),
        sum(when(col("tr") === 1 && col("te") === 1, 1L).otherwise(0L))
          .as("n_shared"))
      .select(col("n_train"), col("n_test"), col("n_shared"),
        r4(expr(leakSql)).as("leak_rate"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp45_quarantine_router" -> lp45QuarantineRouter,
    "lp46_split_leakage" -> lp46SplitLeakage)

  val oracleSql: Map[String, String] = Map(
    "lp45_quarantine_router" ->
      """WITH t AS (
        |  SELECT doc_id, text, md5(text) AS h, string_split(text, ' ') AS toks
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, h,
        |    CAST(len(toks) AS BIGINT) AS nt,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS nu,
        |    len(list_intersect(toks, ['the','a','of','and','to'])) AS h_en,
        |    len(list_intersect(toks, ['der','die','das','und','zu'])) AS h_de,
        |    len(list_intersect(toks, ['el','la','de','y','que'])) AS h_es,
        |    len(list_intersect(toks, ['le','la','de','et','que'])) AS h_fr
        |  FROM t),
        |pred AS (
        |  SELECT doc_id, h, nt, nu,
        |    CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
        |         WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
        |         WHEN h_de = greatest(h_en, h_de, h_es, h_fr) THEN 'de'
        |         WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
        |         ELSE 'fr' END AS pl
        |  FROM feat),
        |keeper AS (SELECT h, CAST(min(doc_id) AS BIGINT) AS keep_id
        |           FROM pred GROUP BY h)
        |SELECT doc_id,
        |  CASE WHEN doc_id <> keep_id THEN 'reject:exact_dup'
        |       WHEN nt < 20 THEN 'reject:too_short'
        |       WHEN pl = 'und' THEN 'review:unknown_lang'
        |       WHEN nu * 10 < nt * 3 THEN 'review:repetitive'
        |       ELSE 'keep' END AS verdict
        |FROM pred JOIN keeper USING (h)
        |ORDER BY doc_id""".stripMargin,
    "lp46_split_leakage" ->
      s"""WITH sh0 AS (
        |  SELECT DISTINCT
        |    (((instr('0123456789abcdef', substr(md5(doc_id || ''), 1, 1)) - 1) * 16 +
        |      (instr('0123456789abcdef', substr(md5(doc_id || ''), 2, 1)) - 1)) % 100)
        |      < 80 AS in_train,
        |    unnest(list_transform(range(len(tk) - 2),
        |      i -> tk[CAST(i + 1 AS INT)] || ' ' || tk[CAST(i + 2 AS INT)]
        |           || ' ' || tk[CAST(i + 3 AS INT)])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |        WHERE len(string_split(text, ' ')) >= 3)
        |  WHERE (((instr('0123456789abcdef', substr(md5(doc_id || ''), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef', substr(md5(doc_id || ''), 2, 1)) - 1)) % 100)
        |          < 80
        |     OR (((instr('0123456789abcdef', substr(md5(doc_id || ''), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef', substr(md5(doc_id || ''), 2, 1)) - 1)) % 100)
        |          >= 90),
        |sides AS (
        |  SELECT sh,
        |    CAST(max(CASE WHEN in_train THEN 1 ELSE 0 END) AS BIGINT) AS tr,
        |    CAST(max(CASE WHEN NOT in_train THEN 1 ELSE 0 END) AS BIGINT) AS te
        |  FROM sh0 GROUP BY sh)
        |SELECT CAST(sum(tr) AS BIGINT) AS n_train,
        |  CAST(sum(te) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN tr = 1 AND te = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared,
        |  round($leakSql, 4) AS leak_rate
        |FROM sides""".stripMargin)
}
