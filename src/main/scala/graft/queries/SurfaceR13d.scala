package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 surface batch 4: cross-document repeated-span detection —
  * the token-level form of Lee et al. 2021's "Deduplicating Training
  * Data Makes Language Models Better" (suffix-array substring dedup),
  * re-expressed as window k-grams + a gaps-and-islands merge — plus
  * two Spark 4 SQL-surface features (SQL scripting, SQL UDFs).
  *
  * Contrast with near-siblings: l1/l2/lf6 decide WHOLE-DOCUMENT
  * duplication; l12 scores repetition WITHIN one document; lt85/lt86
  * find WHICH SPANS of a document are duplicated ELSEWHERE in the
  * corpus and make the drop decision from duplicated-token coverage —
  * the output shape that lets a pipeline excise spans instead of
  * discarding documents.
  *
  * Scale shape: token k-grams via per-document windows (partitioned
  * by doc_id — never a global window), one hash shuffle on the gram
  * for document frequency, one join back, one per-document island
  * merge. Everything is linear in corpus size; the suffix-array
  * original is superlinear to build and single-node.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (LLM pipeline) + §2 F-rows.
  */
object SurfaceR13d extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val K = 5 // gram width in tokens

  /** (doc_id, pos, gram) for every K-token window, plus per-doc token
    * counts — shared by lt85/lt86. */
  private def grams(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("bigint").as("pos"), col("tok"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val leads = (1 until K).map(i => lead(col("tok"), i).over(w))
    toks
      .withColumn("g", concat_ws(" ", (col("tok") +: leads): _*))
      .withColumn("tail_tok", leads.last) // materialize: no window in WHERE
      .where(col("tail_tok").isNotNull) // windows that fit entirely
      .select("doc_id", "pos", "g")
  }

  /** Flagged gram start positions: grams whose exact text occurs in
    * ≥2 DISTINCT documents. */
  private def flaggedPositions(s: SparkSession, d: String): DataFrame = {
    // grams feeds BOTH the duplicate-gram aggregate and the join back
    // against itself — one eager materialization instead of running
    // the explode + per-doc lead window twice (guide §5)
    val g = grams(s, d).localCheckpoint(true)
    val dup = g.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= 2)
      .select("g")
    g.join(dup, Seq("g")).select("doc_id", "pos")
  }

  // ---- LT85: maximal duplicated spans per document ----

  /** LT85: merge flagged gram starts into MAXIMAL spans — a start at
    * `pos` covers tokens [pos, pos+K−1]; consecutive starts whose
    * intervals touch merge (gaps-and-islands: an island breaks when
    * pos jumps by more than K−1... i.e. the previous window's
    * coverage no longer reaches). Output one row per maximal span
    * with its token extent — the excisable-spans report. */
  val lt85CrossdocSpans: Q = (s, d) => {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flaggedPositions(s, d)
      .withColumn("brk",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(w), lit(Long.MinValue / 2))
          + (K - 1), lit(1L)).otherwise(lit(0L)))
      .withColumn("grp", sum(col("brk")).over(wRun))
      .groupBy("doc_id", "grp")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (K - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select("doc_id", "span_start", "span_end", "n_grams")
      .orderBy("doc_id", "span_start")
  }

  // ---- LT86: document drop decision from duplicated-token coverage ----

  /** LT86: Lee et al.'s policy readout — per document, the fraction of
    * tokens covered by cross-document duplicated spans; documents over
    * 50% coverage are marked drop. Coverage sums MERGED island extents
    * (never double-counts overlapping grams). Documents with no
    * flagged span appear with zero coverage — the keep set is the
    * whole corpus, tagged. */
  val lt86DupDocFilter: Q = (s, d) => {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = flaggedPositions(s, d)
      .withColumn("brk",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(w), lit(Long.MinValue / 2))
          + (K - 1), lit(1L)).otherwise(lit(0L)))
      .withColumn("grp", sum(col("brk")).over(wRun))
      .groupBy("doc_id", "grp")
      .agg((max(col("pos")) - min(col("pos")) + K).as("covered"))
      .groupBy("doc_id")
      .agg(sum(col("covered")).as("dup_tokens"))
    documents(s, d)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)) * 2 >= col("n_tokens")).as("drop_doc"))
      .orderBy("doc_id")
  }

  // ---- X33: SQL scripting (Spark 4 BEGIN…END control flow) ----

  /** X33: Spark 4's SQL scripting — DECLARE'd variables, a WHILE loop,
    * and IF control flow computing a banded aggregate imperatively;
    * the script's final SELECT is the result. The oracle computes the
    * same bands declaratively, proving the scripting engine's
    * variable/loop semantics against set algebra. */
  val x33SqlScripting: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("x33_orders")
    try {
      s.sql(
        """BEGIN
          |  -- v_ prefixes: an unqualified name resolves to the COLUMN
          |  -- first, so a variable named `band` would make the WHERE
          |  -- below compare the column to itself (always true)
          |  DECLARE v_band INT DEFAULT 0;
          |  DECLARE v_acc BIGINT DEFAULT 0;
          |  DECLARE v_result MAP<INT, BIGINT> DEFAULT CAST(map() AS MAP<INT, BIGINT>);
          |  CREATE OR REPLACE TEMPORARY VIEW x33_bands_src AS
          |    SELECT CAST(o_orderkey % 4 AS INT) AS band,
          |           CAST(floor(o_totalprice * 100 + 5e-1) AS BIGINT) AS qprice
          |    FROM x33_orders;
          |  WHILE v_band < 4 DO
          |    SET v_acc = (SELECT COALESCE(sum(qprice), 0) FROM x33_bands_src
          |                 WHERE x33_bands_src.band = v_band);
          |    SET v_result = map_concat(v_result, map(v_band, v_acc));
          |    SET v_band = v_band + 1;
          |  END WHILE;
          |  SELECT explode(v_result) AS (band, qsum);
          |END""".stripMargin)
        .orderBy("band")
    } finally {
      // the script's own view must not leak into the next drive of this
      // key (OR REPLACE above guards the same race; both are needed —
      // the second drive may interleave with a concurrent session user)
      s.catalog.dropTempView("x33_bands_src")
      s.catalog.dropTempView("x33_orders")
    }
  }

  // ---- F31: SQL UDFs (CREATE FUNCTION … RETURN expr) ----

  /** F31: Spark 4 SQL-defined functions — a scalar SQL UDF declared in
    * SQL (not Scala), then used inside a grouped aggregate. The body
    * stays a Catalyst expression (SQL UDFs inline into the plan —
    * codegen-friendly, unlike JVM closures), which is exactly why they
    * are the preferred extension point below a custom Expression. */
  val f31SqlUdf: Q = (s, d) => {
    customer(s, d).createOrReplaceTempView("f31_customer")
    try {
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION f31_band(x DOUBLE)
              |RETURNS BIGINT
              |RETURN CAST(floor(x / 1000.0) AS BIGINT)""".stripMargin)
      s.sql(
        """SELECT f31_band(c_acctbal) AS band,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(floor(c_acctbal * 100 + 5e-1) AS BIGINT)) AS BIGINT) AS qsum
          |FROM f31_customer
          |GROUP BY f31_band(c_acctbal)
          |ORDER BY band""".stripMargin)
    } finally {
      s.sql("DROP TEMPORARY FUNCTION IF EXISTS f31_band")
      s.catalog.dropTempView("f31_customer")
    }
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt85_crossdoc_spans" -> lt85CrossdocSpans,
    "lt86_dup_doc_filter" -> lt86DupDocFilter,
    "x33_sql_scripting" -> x33SqlScripting,
    "f31_sql_udf" -> f31SqlUdf)

  private val gramsCte =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |    unnest(range(0, len(string_split(text, ' ')))) AS pos
      |  FROM documents WHERE length(text) > 0),
      |grams AS (
      |  SELECT doc_id, pos,
      |    concat_ws(' ', tok,
      |      lead(tok, 1) OVER w, lead(tok, 2) OVER w,
      |      lead(tok, 3) OVER w, lead(tok, 4) OVER w) AS g,
      |    lead(tok, 4) OVER w AS tail4
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |fit AS (SELECT doc_id, pos, g FROM grams WHERE tail4 IS NOT NULL),
      |dup AS (SELECT g FROM fit GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
      |fpos AS (SELECT doc_id, pos FROM fit JOIN dup USING (g)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > COALESCE(lag(pos) OVER
      |        (PARTITION BY doc_id ORDER BY pos), -1000000) + 4
      |      THEN 1 ELSE 0 END AS brk
      |  FROM fpos),
      |grp AS (
      |  SELECT doc_id, pos,
      |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM isl)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "lt85_crossdoc_spans" ->
      s"""WITH $gramsCte
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_grams
         |FROM grp GROUP BY doc_id, grp
         |ORDER BY doc_id, span_start""".stripMargin,
    "lt86_dup_doc_filter" ->
      s"""WITH $gramsCte,
         |cov AS (
         |  SELECT doc_id, CAST(max(pos) - min(pos) + 5 AS BIGINT) AS covered
         |  FROM grp GROUP BY doc_id, grp),
         |per_doc AS (
         |  SELECT doc_id, CAST(sum(covered) AS BIGINT) AS dup_tokens
         |  FROM cov GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |  COALESCE(p.dup_tokens, 0) AS dup_tokens,
         |  (COALESCE(p.dup_tokens, 0) * 2 >= len(string_split(d.text, ' '))) AS drop_doc
         |FROM documents d LEFT JOIN per_doc p USING (doc_id)
         |WHERE length(d.text) > 0
         |ORDER BY d.doc_id""".stripMargin,
    "x33_sql_scripting" ->
      """SELECT CAST(o_orderkey % 4 AS INTEGER) AS band,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 5e-1) AS BIGINT)) AS BIGINT) AS qsum
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin,
    "f31_sql_udf" ->
      """SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(c_acctbal * 100 + 5e-1) AS BIGINT)) AS BIGINT) AS qsum
        |FROM customer
        |GROUP BY 1 ORDER BY band""".stripMargin)
}
