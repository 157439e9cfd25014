package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 wave 13: incremental batch-vs-corpus dedup (the daily-ingest
  * shape) and SQL-defined UDFs (the extension mechanism that INLINES
  * into the plan instead of breaking codegen).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.9 (LLM ops), §2.12 (extensibility).
  */
object SurfaceR6p extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LP18: incremental dedup ----

  /** LP18: dedup an incoming batch (doc_id ≡ 0 mod 3) against the
    * existing corpus (the rest) WITHOUT rescanning corpus text: the
    * corpus side reduces to its content-hash set (in production: the
    * persisted hash index, bucketed by hash so the anti-join is
    * co-located and the daily cost is O(batch), not O(corpus)). Within-
    * batch ties collapse to min doc_id first, then the survivor set
    * anti-joins the index. Output is the admitted rows.
    */
  val lp18IncrementalDedup: Q = (s, d) => {
    val docs = documents(s, d)
      .withColumn("h", md5(col("text").cast("binary")))
    val corpusIndex = docs.where(col("doc_id") % 3 =!= 0).select("h").distinct()
    val incoming = docs.where(col("doc_id") % 3 === 0)
    val withinBatch = incoming
      .groupBy("h").agg(min("doc_id").as("doc_id"))
    withinBatch
      .join(corpusIndex, Seq("h"), "left_anti")
      .join(documents(s, d).select("doc_id", "lang", "n_chars"), "doc_id")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  // ---- X12: SQL-defined UDF ----

  /** X12: CREATE FUNCTION ... RETURN — the SQL scalar UDF. Unlike a JVM
    * UDF (x1), the body is a Catalyst expression that INLINES into the
    * calling plan: it stays inside whole-stage codegen, pushdown still
    * sees through it, and it ships to any cluster as catalog metadata
    * rather than a jar. The oracle applies the expanded expression, so
    * the inlining semantics are hash-checked.
    */
  val x12SqlUdf: Q = (s, d) => {
    lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_margin(p DOUBLE, disc DOUBLE)
        |RETURNS DOUBLE RETURN p * (1.0 - disc)""".stripMargin)
    s.sql(
      """SELECT l_returnflag,
        |  sum(graft_margin(l_extendedprice, l_discount)) AS margin_sum,
        |  count(*) AS n
        |FROM graft_lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .select(col("l_returnflag"), r4(col("margin_sum")).as("margin_sum"),
        col("n"))
  }

  val queries: Map[String, Q] = Map(
    "lp18_incremental_dedup" -> lp18IncrementalDedup,
    "x12_sql_udf" -> x12SqlUdf)

  val oracleSql: Map[String, String] = Map(
    "lp18_incremental_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, n_chars, md5(text) AS h FROM documents),
        |corpus AS (SELECT DISTINCT h FROM docs WHERE doc_id % 3 <> 0),
        |batch AS (
        |  SELECT h, min(doc_id) AS doc_id FROM docs
        |  WHERE doc_id % 3 = 0 GROUP BY h)
        |SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
        |FROM batch b JOIN docs d ON b.doc_id = d.doc_id
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
        |ORDER BY d.doc_id""".stripMargin,
    "x12_sql_udf" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS margin_sum,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
